package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the formatted physical plan of the given queries
  * (default: the Bench headline set) and flags scale smells — missing
  * parquet filter pushdown, missed broadcasts, cartesian products.
  *
  * Usage: runMain graft.Explain [sfDir] [query ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names =
      if (args.length > 1 && args(1) == "ALL") SparkEntry.queries.keys.toSeq.sorted
      else if (args.length > 1) args.drop(1).toSeq
      else Bench.headline
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      // AQE hides codegen annotations until execution; plans are audited
      // pre-execution, so disable it here (Bench/Verify keep it on)
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      println(s"\n========== $name ==========")
      println(plan)
      // Known intended exceptions: reshape_transpose is an eager native
      // op (dimension-bounded); pack_sequences is a sorted-partition
      // mapPartitions scan (O(1) state, no codegen by construction);
      // sim_mmr_rerank's plan is the bounded greedy's LocalRelation (the
      // distributed top-50 retrieval ran eagerly at build time).
      // stream_* gate queries RUN an AvailableNow replay inside the
      // query function and return the memory sink — the returned plan
      // is the sink scan (no codegen by construction); the streaming
      // plans themselves are audited in StreamingSpec.
      // text_bpe_trainer_steps is the driver-side trainer replay — its
      // result is a LocalRelation by construction (sim_mmr_rerank's
      // pattern); the distributed word aggregate it consumes is the
      // oracled text_bpe_pair_stats plan.
      val intended =
        Set("reshape_transpose", "pack_sequences", "sim_mmr_rerank",
          "text_bpe_trainer_steps") ++
          (if (name.startsWith("stream_")) Set(name) else Set.empty)
      // Window smells (detectors shared with SmellFuzzSpec — see
      // PlanSmells for the rules: unpartitioned window; bounded-key
      // window seen through alias chains, exempt only when an Aggregate
      // DOMINATES the window's input).
      val analyzed = df.queryExecution.analyzed
      val smells = Seq(
        "CartesianProduct" -> plan.contains("CartesianProduct"),
        "single-partition-Window" -> PlanSmells.globalWindow(analyzed),
        "bounded-key-Window" -> PlanSmells.boundedKeyWindow(analyzed),
        // FormattedMode marks whole-stage spans as "[codegen id : N]"
        "no-WholeStageCodegen" ->
          (!plan.contains("codegen id") && !intended.contains(name))
      ).collect { case (s, true) => s }
      if (smells.nonEmpty) println(s"!! smells: ${smells.mkString(", ")}")
    }
    spark.stop()
  }
}
