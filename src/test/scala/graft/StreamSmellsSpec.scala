package graft

import java.nio.file.Files

import graft.streaming.Streams
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming-state smell audit (r14): every canonical streaming
  * constructor in [[graft.streaming.Streams]] must be state-bounded
  * under [[PlanSmells.streamSmells]] — watermarked stateful ops,
  * derived-key sketches, time-range-bounded stream-stream joins — and
  * planted unbounded-state plans (raw-key aggregate without watermark,
  * watermark-less dropDuplicates, equi-only stream-stream join) must
  * each be caught, including through fresh aliases. Plan-level only:
  * nothing here starts a streaming query.
  */
class StreamSmellsSpec extends AnyFunSuite {
  import TestSpark._

  // file-source streaming frame over a real staged dir (plans resolve
  // identically whether or not data is ever processed)
  private lazy val replay: String = {
    val d = Files.createTempDirectory("graft-smell-stream").toString
    Tables.events(spark, sf)
      .select(Streams.eventSchema.fieldNames.map(col).toSeq: _*)
      .coalesce(1).write.mode("overwrite").parquet(d)
    d
  }
  private def events = Streams.readEventStream(spark, replay)

  private def smells(df: DataFrame): Seq[String] =
    PlanSmells.streamSmells(df.queryExecution.analyzed)

  test("every canonical streaming op is state-bounded under the audit") {
    val docsDir = {
      val d = Files.createTempDirectory("graft-smell-docs").toString
      Tables.documents(spark, sf)
        .select(col("doc_id"), col("text"))
        .withColumn("ts", expr("timestamp'2026-01-01 00:00:00'"))
        .coalesce(1).write.mode("overwrite").parquet(d)
      d
    }
    val docStream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType(
        Streams.docSchema.fields :+ org.apache.spark.sql.types.StructField(
          "ts", org.apache.spark.sql.types.TimestampType)))
      .parquet(docsDir)
    val ops: Seq[(String, DataFrame)] = Seq(
      "running_agg" -> Streams.runningAggByType(events),
      "tumbling" -> Streams.tumblingCounts(events),
      "sliding" -> Streams.slidingCounts(events),
      "session" -> Streams.sessionCounts(events),
      "cms" -> Streams.cmsCounters(events),
      "kmv_window" -> Streams.kmvWindowDistinct(events),
      "tdigest_window" -> Streams.tdigestWindowQuantiles(events),
      "dedup_exact" -> Streams.dedupStream(events),
      "near_dedup" -> Streams.nearDedupStream(docStream, "ts"),
      "near_dedup_portable" ->
        Streams.nearDedupStream(docStream, "ts", portable = true),
      "click_view_join" -> Streams.clickViewJoin(events, "click", "view"),
      "asof_enrich" -> Streams.asOfEnrich(events, "click", "purchase"),
      "drift_monitor" ->
        Streams.driftMonitor(events, Seq(("click", 500000L), ("view", 500000L))),
      "enrich_dim" ->
        Streams.enrichWithDim(events, Tables.customer(spark, sf))
    )
    ops.foreach { case (name, df) =>
      assert(smells(df).isEmpty,
        s"$name flagged: ${smells(df).mkString(",")}")
    }
  }

  test("raw-key streaming aggregate without watermark is caught") {
    val planted = events.groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    assert(smells(planted) == Seq("unbounded-stream-agg"))
  }

  test("the raw-key rule is alias-transparent") {
    val laundered = events
      .select(col("user_id").as("uid"), col("value"))
      .select(col("uid").as("k"), col("value"))
      .groupBy(col("k")).agg(count(lit(1)).as("n"))
    assert(smells(laundered) == Seq("unbounded-stream-agg"))
  }

  test("derived-key sketch aggregates stay exempt without a watermark") {
    // the CMS shape: grouping keys are computed bucket expressions, so
    // the domain is fixed by construction even with no watermark
    val sketch = events
      .select(pmod(col("user_id") * 48271L, lit(1024L)).as("b"))
      .groupBy(col("b")).agg(count(lit(1)).as("n"))
    assert(smells(sketch).isEmpty)
  }

  test("watermarked raw-key aggregate stays exempt") {
    val ok = events.withWatermark("ts", "10 minutes")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    assert(smells(ok).isEmpty)
  }

  test("watermark-less streaming dropDuplicates is caught") {
    val planted = events.dropDuplicates("event_id")
    assert(smells(planted) == Seq("unbounded-stream-dedup"))
    assert(smells(Streams.dedupStream(events)).isEmpty)
  }

  test("equi-only stream-stream join is caught; time-bounded stays exempt") {
    val a = events.filter(col("event_type") === "click")
      .select(col("user_id").as("a_user"), col("ts").as("a_ts"))
      .withWatermark("a_ts", "1 hour")
    val b = events.filter(col("event_type") === "view")
      .select(col("user_id").as("b_user"), col("ts").as("b_ts"))
      .withWatermark("b_ts", "1 hour")
    val planted = a.join(b, col("a_user") === col("b_user"))
    assert(smells(planted) == Seq("unbounded-stream-join"))
    assert(smells(Streams.clickViewJoin(events, "click", "view")).isEmpty)
  }
}
