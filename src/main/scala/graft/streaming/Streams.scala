package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming surface — SURVEY §2.10 (reference: custreamz
  * `python/custreamz/custreamz/tests/test_dataframes.py` semantics over
  * cudf-backed streamz; Kafka consumer `custreamz/kafka.py:64`).
  *
  * The reference is processing-time-only; this engine upgrades to real
  * event-time semantics: `withWatermark` + tumbling/sliding/session
  * windows, plus `flatMapGroupsWithState` for the streamz row-count
  * window (`window(n=4)`, test_dataframes.py:554).
  *
  * Kafka: `spark.readStream.format("kafka")` is the drop-in source for
  * `Consumer.read_gdf` (built-in; not exercised here — no broker in the
  * test container). File-source replay of the events table drives tests.
  */
object Streams {

  /** Event schema of /root/testdata events (ts normalized to µs). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming source: replay a directory of parquet event files.
    * (The events table is written to a staging dir by the caller/test —
    * file source needs its own directory.)
    */
  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  /** Continuously-updated grouped aggregate (test_dataframes.py:279):
    * running count/sum per event_type with a watermark.
    */
  def runningAggByType(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))

  /** Tumbling event-time window (test_dataframes.py:554 value-range
    * window, upgraded to event time): 5-minute windows per event_type.
    */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), avg(col("value")).as("avg_value"))
      .select(
        col("window.start").as("win_start"),
        col("event_type"),
        col("n"),
        col("avg_value"))

  /** Sliding window: 10-minute window sliding every 5. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("n"))

  /** Session window (capability upgrade; gap = 5 minutes per user). */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "5 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("sess_start"), col("user_id"), col("n_events"))

  /** streamz row-count window `window(n=4)` (test_dataframes.py:554):
    * per-user mean over the last 4 rows, maintained with explicit state.
    */
  def lastNMean(spark: SparkSession, events: DataFrame, n: Int): DataFrame = {
    import spark.implicits._
    case class Ev(user_id: Long, value: Double)
    val typed = events.select(col("user_id"), col("value")).as[(Long, Double)]
    typed
      .groupByKey(_._1)
      .flatMapGroupsWithState[Seq[Double], (Long, Double, Int)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (uid, rows, state: GroupState[Seq[Double]]) =>
          val prev = state.getOption.getOrElse(Vector.empty)
          val all = (prev ++ rows.map(_._2).toSeq).takeRight(n)
          state.update(all)
          Iterator((uid, all.sum / all.size, all.size))
      }
      .toDF("user_id", "last_n_mean", "n_in_window")
  }

  /** Streaming exact dedup with bounded state: drop duplicate event ids,
    * keeping state only within the watermark horizon — the streaming twin
    * of the batch dedup pipeline (state store size is bounded by the
    * watermark window, not the stream length).
    */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming NEAR-dup with bounded state: the streaming twin of the
    * MinHash dedup pipeline. Each document's 16-permutation minhash
    * signature is computed map-side (stateless projection through the
    * native MinHash64 expression), canonicalized to one string key, and
    * near-duplicates — texts whose full signatures collide — are dropped
    * within the watermark horizon. Signature equality is the strictest
    * LSH band (16 of 16 rows agreeing ⇒ est. jaccard 1.0), the right
    * streaming trade: per-band state multiplies the store ×bands, while
    * full-signature state stays one row per surviving doc inside the
    * watermark window.
    */
  def nearDedupStream(docs: DataFrame, tsCol: String): DataFrame = {
    val toks = split(col("text"), " ")
    val shingles = when(size(toks) < 3, array().cast("array<string>"))
      .otherwise(array_distinct(
        transform(sequence(lit(1), size(toks) - 2),
          i => concat_ws("_", element_at(toks, i), element_at(toks, i + 1),
            element_at(toks, i + 2)))))
    docs
      .withColumn("tk", shingles)
      .withColumn("sig",
        graft.ArrCanon.joined(graft.functions.MinHash64.minhash64(col("tk"), 16)))
      .drop("tk")
      .withWatermark(tsCol, "10 minutes")
      .dropDuplicatesWithinWatermark("sig")
  }

  /** Stream-stream inner join with watermark-bounded state (capability
    * improvement over the reference — custreamz has no streaming join):
    * correlates each user's 'click'-like events with their 'view'-like
    * events inside a bounded event-time gap (6 hours). BOTH sides carry watermarks
    * and the join condition carries a time-range predicate, so each
    * side's state store holds only the watermark horizon — the mandatory
    * shape for an unbounded stream-stream join (without the range bound,
    * state grows forever).
    */
  def clickViewJoin(events: DataFrame, typeA: String, typeB: String): DataFrame = {
    val a = events
      .filter(col("event_type") === typeA)
      .select(col("user_id").as("a_user"), col("ts").as("a_ts"),
        col("event_id").as("a_event"))
      .withWatermark("a_ts", "12 hours")
    val b = events
      .filter(col("event_type") === typeB)
      .select(col("user_id").as("b_user"), col("ts").as("b_ts"),
        col("event_id").as("b_event"))
      .withWatermark("b_ts", "12 hours")
    a.join(b,
      col("a_user") === col("b_user") &&
        col("b_ts") >= col("a_ts") &&
        col("b_ts") <= col("a_ts") + expr("INTERVAL 6 HOURS"))
  }

  /** Run a streaming query to completion against a static replay dir and
    * return the in-memory sink table (used by tests and demos;
    * checkpointing exercised via the checkpointLocation option).
    */
  def runToCompletion(
      spark: SparkSession,
      df: DataFrame,
      name: String,
      mode: String = "update",
      checkpoint: Option[String] = None): DataFrame = {
    var w = df.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
    checkpoint.foreach(c => w = w.option("checkpointLocation", c))
    val q: StreamingQuery = w.start()
    q.awaitTermination()
    spark.table(name)
  }
}
