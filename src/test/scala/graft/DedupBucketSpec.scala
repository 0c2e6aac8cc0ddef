package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupBucketSpec extends AnyFunSuite {
  import TestSpark._

  test("connected-component keepers: chain and triangle resolve to min id") {
    val pairs = spark
      .createDataFrame(Seq(
        (10L, 20L), (20L, 30L), // chain 10-20-30
        (5L, 7L), (7L, 9L), (5L, 9L), // triangle
        (100L, 101L))) // simple pair
      .toDF("id_a", "id_b")
    val keepers = Dedup.resolveKeepers(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(keepers(10L) == 10L && keepers(20L) == 10L && keepers(30L) == 10L)
    assert(keepers(5L) == 5L && keepers(7L) == 5L && keepers(9L) == 5L)
    assert(keepers(100L) == 100L && keepers(101L) == 100L)
  }

  test("dedupCorpus keeps one doc per LSH cluster plus singletons") {
    val docs = Tables.documents(spark, sf)
    val pairs = SparkEntry.queries("dedup_minhash_lsh")(spark, sf)
      .select(col("id_a"), col("id_b"))
    val deduped = Dedup.dedupCorpus(docs, pairs)
    val n = docs.count()
    val d = deduped.count()
    assert(d < n, "near-dups should be removed")
    // every removed doc is in some candidate pair
    val removed = docs.select(col("doc_id"))
      .exceptAll(deduped.select(col("doc_id")))
    val inPairs = pairs.select(col("id_a").as("doc_id"))
      .union(pairs.select(col("id_b").as("doc_id"))).distinct()
    assert(removed.exceptAll(inPairs).isEmpty)
  }

  test("resolveKeepers residue is bounded regardless of iteration count") {
    // a 200-node chain needs many propagation rounds; persisted-RDD
    // residue must stay a small constant, not grow per iteration
    // (round-1 leak: every iteration's cache + the localCheckpoint
    // blocks of dead iterations stayed pinned)
    val chain = spark
      .createDataFrame((0L until 199L).map(i => (i, i + 1)))
      .toDF("id_a", "id_b")
    val before = spark.sparkContext.getPersistentRDDs.size
    val keepers = Dedup.resolveKeepers(chain)
    keepers.count()
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after - before <= 2,
      s"persistent RDDs grew $before -> $after across 10 iterations")
  }

  test("resolveKeepers converges on a diameter-199 chain (pointer doubling)") {
    // one-hop propagation would need 199 rounds; pointer doubling must
    // finish inside the default 10 (2^10 ≥ 199) AND resolve every node
    // to the true component min — partial convergence was the silent
    // wrong answer the convergence guard now forbids
    val chain = spark
      .createDataFrame((0L until 199L).map(i => (i, i + 1)))
      .toDF("id_a", "id_b")
    val keepers = Dedup.resolveKeepers(chain).collect()
    assert(keepers.length == 200)
    assert(keepers.forall(_.getLong(1) == 0L),
      "every node of the chain must resolve to keeper 0")
  }

  test("resolveKeepers fails loudly when the iteration budget is too small") {
    val chain = spark
      .createDataFrame((0L until 199L).map(i => (i, i + 1)))
      .toDF("id_a", "id_b")
    val before = spark.sparkContext.getPersistentRDDs.size
    val ex = intercept[IllegalStateException] {
      Dedup.resolveKeepers(chain, maxIter = 2).collect()
    }
    assert(ex.getMessage.contains("did not converge"))
    assert(spark.sparkContext.getPersistentRDDs.size <= before,
      "failure path must release the blocks it pinned")
  }

  test("LSH hot-bucket cap bounds per-bucket pair counts") {
    // corpus with a degenerate template: 40 near-identical docs that all
    // land in one bucket, plus a genuine near-dup pair of a distinct text
    val template = (1 to 30).map(i => s"tok$i").mkString(" ")
    val distinct1 = (1 to 30).map(i => s"other$i").mkString(" ")
    val distinct2 = (2 to 30).map(i => s"other$i").mkString(" ") + " other31"
    val rows = (1L to 40L).map(i => (i, template)) ++
      Seq((100L, distinct1), (101L, distinct2))
    val docs = spark.createDataFrame(rows).toDF("doc_id", "text")

    val uncapped = queries.LlmOps.lshCandidatePairs(docs, maxBucket = Int.MaxValue)
    // 40 template docs → 40*39/2 = 780 quadratic pairs without the cap
    assert(uncapped.count() >= 780)

    val capped = queries.LlmOps.lshCandidatePairs(docs, maxBucket = 10)
    val cappedPairs = capped.collect().map(r => (r.getLong(0), r.getLong(1)))
    // the hot template bucket is dropped entirely...
    assert(!cappedPairs.exists { case (a, b) => a <= 40L && b <= 40L })
    // ...while the genuine near-dup pair in a small bucket survives
    assert(cappedPairs.contains((100L, 101L)))
  }

  test("ngram-jaccard verify stage: hot-bucket cap bounds per-bucket pairs") {
    // same degenerate-template corpus as the LSH test: without the cap the
    // 40-doc template bucket yields 40*39/2 = 780 quadratic pairs
    val template = (1 to 30).map(i => s"tok$i").mkString(" ")
    val distinct1 = (1 to 30).map(i => s"other$i").mkString(" ")
    val distinct2 = (2 to 30).map(i => s"other$i").mkString(" ") + " other31"
    val rows = (1L to 40L).map(i => (i, template)) ++
      Seq((100L, distinct1), (101L, distinct2))
    val docs = spark.createDataFrame(rows).toDF("doc_id", "text")

    val uncapped = queries.LlmOps.ngramJaccardPairs(docs, maxBucket = Int.MaxValue)
    assert(uncapped.count() >= 780)

    val capped = queries.LlmOps.ngramJaccardPairs(docs, maxBucket = 10)
    val cappedPairs = capped.collect().map(r => (r.getLong(0), r.getLong(1)))
    // the hot template bucket is dropped entirely...
    assert(!cappedPairs.exists { case (a, b) => a <= 40L && b <= 40L })
    // ...while the genuine near-dup pair in a small bucket survives
    assert(cappedPairs.contains((100L, 101L)))
  }

  test("bucketed tables join without a shuffle exchange") {
    // uses the default local warehouse (spark-warehouse/, gitignored);
    // also clear orphan locations from any previously aborted run
    import org.apache.commons.io.FileUtils
    Seq("li_b", "o_b").foreach { t =>
      FileUtils.deleteQuietly(new java.io.File(s"spark-warehouse/$t"))
    }
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_quantity"))
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_totalprice"))
      .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_b")
    // force the non-broadcast path so bucketing is what saves the shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_b")
        .join(spark.table("o_b"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should be shuffle-free:\n$plan")
      assert(plan.contains("Bucketed: true"), s"scan not bucketed:\n$plan")
      assert(joined.count() == Tables.lineitem(spark, sf).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("incremental LSH dedup equals the self-join restricted to the split") {
    // the persisted-index delta query must find exactly the self-join's
    // cross-split pairs: pairs (a < b) with one side in the delta
    // (doc_id % 10 = 0) and the other in the corpus, re-oriented to
    // (id_d, id_c). Caps don't bind at this scale, so equality is exact.
    val inc = SparkEntry.queries("dedup_incremental_lsh")(spark, sf)
      .select(col("id_d"), col("id_c"), col("jaccard3"))
    val self = queries.LlmOps
      .ngramJaccardPairs(Tables.documents(spark, sf), maxBucket = Int.MaxValue)
      .filter((col("id_a") % 10 === 0) =!= (col("id_b") % 10 === 0))
      .select(
        when(col("id_a") % 10 === 0, col("id_a")).otherwise(col("id_b")).as("id_d"),
        when(col("id_a") % 10 === 0, col("id_b")).otherwise(col("id_a")).as("id_c"),
        col("jaccard3"))
    assert(inc.exceptAll(self).isEmpty && self.exceptAll(inc).isEmpty,
      "incremental pairs must equal the self-join's cross-split pairs")
    // every flagged doc is genuinely in the delta partition of the split
    assert(inc.filter(col("id_d") % 10 =!= 0 || col("id_c") % 10 === 0).isEmpty)
  }
}
