package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-operator microbenchmarks (reference practice: `cpp/benchmarks/`
  * string/join/groupby fixtures): each case times two formulations of
  * the same computation to justify the implementation choice —
  * native expression vs Scala UDF, single-pass MinHash vs composed
  * transform/array_min, fixed-point exact sum vs plain double sum.
  *
  * Usage: runMain graft.MicroBench [sfDir] — prints one JSON line/case.
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // Local-iteration hook (the Bench/ScaleProbe convention):
    // SPARK_GRAFT_MICRO_ONLY=case1,case2 runs just those cases.
    val onlyCases = sys.env.get("SPARK_GRAFT_MICRO_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def bench(name: String, a: => DataFrame, b: => DataFrame,
        aLabel: String, bLabel: String): Unit = {
      if (!onlyCases.forall(_.contains(name))) return
      time(a); time(b) // warmup
      val ta = (1 to 3).map(_ => time(a)).min
      val tb = (1 to 3).map(_ => time(b)).min
      println(f"""{"case":"$name","$aLabel":$ta%.3f,"$bLabel":$tb%.3f,"speedup":${tb / ta}%.2f}""")
    }

    val docs = Tables.documents(spark, sfDir)
    val li = Tables.lineitem(spark, sfDir)
    val swapUdf = udf((s: String) =>
      s.map(c => if (c.isUpper) c.toLower else if (c.isLower) c.toUpper else c))

    bench("swapcase_expr_vs_udf",
      docs.select(GraftFunctions.swapcase(col("text")).as("x")),
      docs.select(swapUdf(col("text")).as("x")),
      "native_expr_s", "scala_udf_s")

    val shingled = graft.queries.LlmOps.withShingles(docs)
    val composedMinhash = {
      val hashes = (0 until 16).map(i =>
        s"array_min(transform(tk, t -> xxhash64(t, ${i}L)))")
      expr(s"array(${hashes.mkString(",")})")
    }
    bench("minhash_native_vs_composed",
      shingled.select(col("doc_id"), graft.functions.MinHash64.minhash64(col("tk"), 16).as("mh")),
      shingled.select(col("doc_id"), composedMinhash.as("mh")),
      "native_expr_s", "composed_exprs_s")

    bench("fixedpoint_sum_vs_plain",
      li.groupBy(col("l_returnflag")).agg(Agg.dsum(col("l_quantity")).as("s")),
      li.groupBy(col("l_returnflag")).agg(sum(col("l_quantity")).as("s")),
      "fixed_point_s", "plain_sum_s")

    // dot product: native codegen expression vs composed HOF lambdas
    // (interpreted per element) — the hot kernel of pair cosine scoring
    val emb = Tables.embeddings(spark, sfDir)
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS e")
    val pairs = emb.selectExpr("vec_id AS ia", "e AS ea")
      .join(emb.selectExpr("vec_id AS ib", "e AS eb"),
        expr("ia < ib AND ib - ia <= 300"))
    bench("dot_native_vs_hof",
      pairs.select(graft.functions.DotF64.dotf64(col("ea"), col("eb")).as("d")),
      pairs.select(expr(
        "aggregate(zip_with(ea, eb, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (a, v) -> a + v)").as("d")),
      "native_dot_s", "hof_dot_s")

    // PRODUCT: exact partial-agg Aggregator vs exp(sum(ln)) (which is
    // both inexact and undefined on zeros/negatives — positive col here)
    bench("product_agg_vs_expsumln",
      li.groupBy(col("l_orderkey"))
        .agg(graft.agg.Product((col("l_discount") + 1).cast("double")).as("p")),
      li.groupBy(col("l_orderkey"))
        .agg(exp(sum(log(col("l_discount") + 1))).as("p")),
      "product_agg_s", "exp_sum_ln_s")

    // EWMA buffer: ArrayBuffer append vs the `Seq :+` append the old
    // buffer signature permitted. The Seq static type lets the runtime
    // buffer be a List (e.g. out of a Kryo round-trip), where every
    // append is O(n) — quadratic per group. One 50k-row group in a
    // single partition makes the risk visible end to end.
    val series = spark.range(50000)
      .selectExpr("CAST(1 AS BIGINT) AS k", "id AS o", "CAST(id AS DOUBLE) AS v")
      .coalesce(1)
    val bufAgg = udaf(new graft.agg.EwmaAgg(0.2))
    val seqAgg = udaf(new SeqAppendEwma(0.2))
    bench("ewma_arraybuffer_vs_seq_append",
      series.groupBy(col("k")).agg(bufAgg(col("o"), col("v")).as("e")),
      series.groupBy(col("k")).agg(seqAgg(col("o"), col("v")).as("e")),
      "arraybuffer_s", "seq_append_s")

    // Global row numbering: range-partitioned GlobalOrder vs the naive
    // single-partition window. Same numbers, different shape — at sf0.1
    // the window funnels 600k lineitem rows into one task.
    val liKeys = li.select(col("l_extendedprice"), col("l_orderkey"),
      col("l_linenumber"))
    val order = Seq(col("l_extendedprice"), col("l_orderkey"),
      col("l_linenumber"))
    bench("global_rownum_ranged_vs_window",
      graft.operators.GlobalOrder.rowNumber(liKeys, order, "rn"),
      liKeys.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(order: _*))),
      "ranged_offsets_s", "single_partition_window_s")

    // PageRank cost split: the 0-iteration run prices the per-rep fixed
    // cost (orders⋈lineitem edge build + eager localCheckpoint + rank
    // init) the 5-iteration run adds its Pregel steps to — (full −
    // build)/5 is the marginal per-iteration cost, the number that
    // decides whether envelope work should target the build or the loop.
    {
      val orders = Tables.orders(spark, sfDir)
      bench("pagerank_build_vs_5iter",
        graft.queries.GraphOps.pagerank(orders, li, iters = 0),
        graft.queries.GraphOps.pagerank(orders, li, iters = 5),
        "build_only_s", "build_plus_5iter_s")
    }

    // PageRank edge-source split (r20, adjudicating the bench row's
    // r19–r20 1.3→2.0–2.5 s elevation): the BENCH row iterates over
    // `s.read.parquet(persisted edges)` — every one of the 6 jobs per
    // run (rank init + 5 iterations) re-scans the parquet — while the
    // MicroBench case above iterates over an eagerly checkpointed edge
    // frame the block manager serves from memory. If the parquet arm
    // alone is elevated while the checkpoint arm matches the historic
    // per-iteration cost, the regression lives in the repeated
    // cold-file scan path (IO/page-cache behavior), not in the Pregel
    // loop.
    {
      val edges = graft.queries.GraphOps.pagerankEdges(
        Tables.orders(spark, sfDir), li)
      val p = System.getProperty("java.io.tmpdir") + "/graft_micro_predges"
      edges.write.mode("overwrite").parquet(p)
      val ckpt = spark.read.parquet(p).localCheckpoint()
      bench("pagerank_iterate_parquet_vs_checkpoint",
        graft.queries.GraphOps.pagerankIterate(spark.read.parquet(p), 5),
        graft.queries.GraphOps.pagerankIterate(ckpt, 5),
        "parquet_edges_s", "checkpointed_edges_s")
    }

    // Bucketed (zero-Exchange) vs plain shuffled sort-merge join: the
    // write-once/join-many trade quantified. Both sides hinted merge so
    // the ONLY difference is the pre-shuffled storage layout.
    {
      val liJ = li.select(col("l_orderkey"), col("l_quantity"))
      val ordJ = Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_orderpriority"))
      val tag = "micro_" + java.lang.Integer.toHexString(sfDir.hashCode)
      spark.sql(s"DROP TABLE IF EXISTS li_$tag")
      spark.sql(s"DROP TABLE IF EXISTS ord_$tag")
      val wh = spark.conf.get("spark.sql.warehouse.dir")
      for (t <- Seq(s"li_$tag", s"ord_$tag")) {
        val p = new org.apache.hadoop.fs.Path(s"$wh/$t")
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.delete(p, true)
      }
      sources.Bucketed.writeBucketed(liJ, s"li_$tag", "l_orderkey", 8)
      sources.Bucketed.writeBucketed(ordJ, s"ord_$tag", "o_orderkey", 8)
      def agg(j: DataFrame): DataFrame =
        j.groupBy(col("o_orderpriority")).agg(sum(col("l_quantity")).as("q"))
      bench("join_bucketed_vs_shuffled_smj",
        agg(spark.table(s"li_$tag").join(
          spark.table(s"ord_$tag").hint("merge"),
          col("l_orderkey") === col("o_orderkey"))),
        agg(liJ.join(ordJ.hint("merge"),
          col("l_orderkey") === col("o_orderkey"))),
        "bucketed_s", "shuffled_s")
    }

    // PQ ADC vs brute force on the same query: the compression trade
    // quantified — encode once write-side, then every query scores 8
    // codes per row (codeword-table lookups) instead of 64 floats.
    // (Approximate vs exact by design; the correctness contract lives
    // in the oracled sim_ivfpq_topk row, this times the scoring path.)
    {
      val emb = Tables.embeddings(spark, sfDir)
        .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS e")
      val cb = operators.Similarity.pqCodebooks(emb, 8, 16, 8)
      val q0 = emb.filter(col("vec_id") === 0)
        .select(col("e")).head().getSeq[Double](0).toIndexedSeq
      val table = operators.Similarity.adcTable(q0, cb, 8)
      val encoded = operators.Similarity.encodePq(emb, cb, 8).cache()
      encoded.count() // materialized codes = the production read side
      bench("ann_pq_adc_vs_brute",
        operators.Similarity.pqTopK(encoded, table, 0L, 10),
        operators.Similarity.bruteForceTopK(
          Tables.embeddings(spark, sfDir), 0L, 10),
        "pq_adc_s", "brute_cosine_s")
      encoded.unpersist()
    }

    // Z-order vs linear layout: both written once; the bench times a
    // selective scan filtered on the column the linear layout did NOT
    // sort by. Linear-by-partkey files all span the full suppkey range
    // (no row-group pruning); z-clustered files cover suppkey tiles, so
    // parquet min/max stats skip most row groups.
    {
      // 32× replication so files are IO-sized (~600k rows each): at bare
      // sf0.1 every file is one tiny row group and the 32-task scheduling
      // floor hides the pruning win this case exists to measure
      val liZ = li.select(col("l_orderkey"), col("l_partkey"),
        col("l_suppkey"), col("l_quantity"))
        .crossJoin(spark.range(32).select(col("id").as("__rep")))
        .drop("__rep")
      val base = System.getProperty("java.io.tmpdir") +
        "/graft_zorder_" + java.lang.Integer.toHexString(sfDir.hashCode)
      liZ.repartitionByRange(32, col("l_partkey"))
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite").parquet(s"$base/linear")
      operators.ZOrder.clusterByZ(liZ, Seq("l_partkey", "l_suppkey"), 32)
        .write.mode("overwrite").parquet(s"$base/zorder")
      val st = liZ.agg(min("l_suppkey"), max("l_suppkey")).head()
      val (sMin, sMax) = (st.getLong(0), st.getLong(1))
      // a ~3% slice in the middle of the suppkey domain
      val lo = sMin + (sMax - sMin) * 40 / 100
      val hi = sMin + (sMax - sMin) * 43 / 100
      def scan(dir: String): DataFrame =
        spark.read.parquet(dir)
          .filter(col("l_suppkey").between(lo, hi))
          .groupBy(col("l_partkey"))
          .agg(sum(col("l_quantity")).as("q"))
      bench("scan_zorder_vs_linear_nonsort_col",
        scan(s"$base/zorder"), scan(s"$base/linear"),
        "zorder_s", "linear_s")
      // wall time at this data size sits on the task-scheduling floor;
      // the layout's real effect is how many rows parquet row-group
      // min/max stats let the scan SKIP — read it off the scan metrics
      def rowsRead(dir: String): Long = {
        import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
        import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
        val df = scan(dir)
        df.collect() // execute THIS QueryExecution so its metrics populate
        def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
          case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
          case q: QueryStageExec => scans(q.plan)
          case s: FileSourceScanExec => Seq(s)
          case other => other.children.flatMap(scans)
        }
        scans(df.queryExecution.executedPlan)
          .map(_.metrics("numOutputRows").value).sum
      }
      val (zr, lr) = (rowsRead(s"$base/zorder"), rowsRead(s"$base/linear"))
      println(s"""{"case":"scan_zorder_rows_read","zorder_rows":$zr,"linear_rows":$lr,"pruned_factor":${lr.toDouble / zr max 1}}""")
    }

    spark.stop()
  }

  /** The pre-fix EwmaAgg buffer shape, kept ONLY as the micro-bench
    * counterfactual: a Seq-typed buffer appended with `:+`, which is
    * O(n) per row when the runtime Seq is a List — quadratic per group.
    */
  private class SeqAppendEwma(alpha: Double)
      extends org.apache.spark.sql.expressions.Aggregator[
        (Long, Double), Seq[(Long, Double)], Double] {
    import org.apache.spark.sql.{Encoder, Encoders}
    override def zero: Seq[(Long, Double)] = List.empty
    override def reduce(b: Seq[(Long, Double)], in: (Long, Double)): Seq[(Long, Double)] =
      b :+ in
    override def merge(a: Seq[(Long, Double)], b: Seq[(Long, Double)]): Seq[(Long, Double)] =
      a ++ b
    override def finish(buf: Seq[(Long, Double)]): Double = {
      var num = 0.0
      var den = 0.0
      val om = 1.0 - alpha
      buf.sortBy(_._1).foreach { case (_, x) =>
        num = x + om * num
        den = 1.0 + om * den
      }
      if (den == 0.0) Double.NaN else num / den
    }
    override def bufferEncoder: Encoder[Seq[(Long, Double)]] =
      Encoders.kryo[Seq[(Long, Double)]]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
