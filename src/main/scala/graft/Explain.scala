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
      val intended =
        Set("reshape_transpose", "pack_sequences", "sim_mmr_rerank") ++
          (if (name.startsWith("stream_")) Set(name) else Set.empty)
      // Single-partition window: an unpartitioned Window moves the whole
      // frame through one task — the r11 de-globalization rule is that
      // every Window carries a PARTITION BY (global ranks go through
      // operators.GlobalOrder instead). Detected structurally on the
      // analyzed plan: a WindowExpression whose spec has no partition keys.
      val globalWindow = df.queryExecution.analyzed.collectFirst {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.partitionSpec.isEmpty => w
      }.nonEmpty
      // Bounded-cardinality-key window over an SF-scaled frame: a Window
      // whose partition keys are ALL drawn from the known dataset-bounded
      // dictionary columns (3 returnflags, 5 segments/priorities, 20
      // sources, 10 labels, 5 langs, 2 linestatuses) funnels the whole
      // input through that many tasks — the r12/r13 rule is that such
      // scans go through operators.GlobalOrder.groupedRowNumber /
      // groupedCumSum instead. A Window ABOVE an Aggregate is exempt:
      // the aggregate has already collapsed the SF-scaled input to a
      // bounded frame, so the window's input no longer scales.
      val boundedKeys = Set("l_returnflag", "l_linestatus", "c_mktsegment",
        "o_orderpriority", "label", "source", "lang", "grp")
      def hasAggregate(
          p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean =
        p.collectFirst {
          case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
        }.nonEmpty
      val boundedKeyWindow = df.queryExecution.analyzed.collectFirst {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.partitionSpec.nonEmpty &&
              w.partitionSpec.forall {
                case a: org.apache.spark.sql.catalyst.expressions.Attribute =>
                  boundedKeys.contains(a.name)
                case _ => false
              } && !hasAggregate(w.child) => w
      }.nonEmpty
      val smells = Seq(
        "CartesianProduct" -> plan.contains("CartesianProduct"),
        "single-partition-Window" -> globalWindow,
        "bounded-key-Window" -> boundedKeyWindow,
        // FormattedMode marks whole-stage spans as "[codegen id : N]"
        "no-WholeStageCodegen" ->
          (!plan.contains("codegen id") && !intended.contains(name))
      ).collect { case (s, true) => s }
      if (smells.nonEmpty) println(s"!! smells: ${smells.mkString(", ")}")
    }
    spark.stop()
  }
}
