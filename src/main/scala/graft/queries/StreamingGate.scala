package graft.queries

import java.nio.file.Files

import graft.{Q, Tables}
import graft.streaming.Streams
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DateType

/** Structured-Streaming operators promoted into the driver's DuckDB
  * oracle gate (reference: custreamz's differential contract — a
  * streaming computation is correct when its sink equals the batch
  * computation over the replayed input,
  * `python/custreamz/custreamz/tests/test_dataframes.py:279,545,743`).
  *
  * Each query here RUNS the real streaming pipeline inside the query
  * function: stage the sf table to a replay directory, execute the
  * `Trigger.AvailableNow()` streaming query to completion against an
  * in-memory sink, and return that sink as a batch DataFrame. The
  * DuckDB oracle then recomputes the same answer in pure SQL over the
  * ORIGINAL parquet tables — so a hash-green row certifies the whole
  * streaming path (source → stateful operator → sink), not a batch
  * re-expression of it.
  *
  * Determinism contracts (why these four can be oracled at all):
  *   - `stream_cms` / `stream_kmv_window`: complete-mode aggregations
  *     whose state merge is order-independent (cell-wise counter adds;
  *     distinct k-min sets), so ANY replay batching yields the batch
  *     answer bit-for-bit.
  *   - `stream_scd2`: a per-key state machine whose differential
  *     contract requires per-key arrival order — staged as one sorted
  *     file replayed in a single AvailableNow micro-batch, the same
  *     precondition StreamingSpec pins (a Kafka deployment gets this
  *     from per-key partition ordering).
  *   - `stream_postings`: update-mode emissions across MULTIPLE forced
  *     micro-batches (maxFilesPerTrigger); the final emission per token
  *     (highest df — df is strictly monotone across touches) equals the
  *     batch index for any batching, because both the true df and the
  *     min-20 posting set are order-independent.
  *
  * Scale shape: state per op is bounded (4×1024 CMS cells; k=256
  * hashes per window; one interval row per dimension key; 21 longs per
  * vocabulary entry), so the same pipelines run unbounded on a real
  * broker source. The in-memory sink + temp-dir staging here is the
  * gate harness, not the operator.
  */
object StreamingGate {

  /** Unique memory-sink names: a session may run the same gate query
    * more than once (Verify, then Explain); memory sinks are registered
    * as session temp views, so names must never collide.
    */
  private val sinkSeq = new java.util.concurrent.atomic.AtomicInteger(0)
  private def sink(base: String): String =
    s"${base}_${sinkSeq.incrementAndGet()}"

  private def tempDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** Stage the events table (normalized µs timestamps) as a replay dir. */
  private def stageEvents(s: SparkSession, dir: String, parts: Int): String = {
    val d = tempDir("graft-gate-events")
    Tables.events(s, dir)
      .select(Streams.eventSchema.fieldNames.map(col).toSeq: _*)
      .repartition(parts)
      .write.mode("overwrite").parquet(d)
    d
  }

  /** Stage the events table as ONE (ts, event_id)-sorted file — the
    * ordered-replay precondition of the per-key state machines
    * (transitions, funnel): a single AvailableNow micro-batch preserves
    * per-user arrival order, so the stream equals the batch total order
    * (a Kafka deployment gets this from per-key partition ordering).
    */
  private def stageEventsSorted(s: SparkSession, dir: String): String = {
    val d = tempDir("graft-gate-events-sorted")
    Tables.events(s, dir)
      .select(Streams.eventSchema.fieldNames.map(col).toSeq: _*)
      .orderBy(col("ts"), col("event_id"))
      .coalesce(1).write.mode("overwrite").parquet(d)
    d
  }

  // ------------------------------------------------------------- stream_cms

  /** Streaming count-min sketch counters over replayed events; the
    * sink's 4×1024 cells are bit-identical to the same sketch computed
    * in batch (pure long arithmetic, order-independent adds).
    */
  private def streamCms(s: SparkSession, dir: String): DataFrame = {
    val stream = Streams.readEventStream(s, stageEvents(s, dir, 4))
    Streams.runToCompletion(
      s, Streams.cmsCounters(stream), sink("gate_cms"), mode = "complete")
  }

  private val streamCmsSql =
    """SELECT r, b, count(*) AS cnt FROM (
      |  SELECT t.r AS r,
      |    ((user_id * (1000003 + 2 * t.r) + 12289 * t.r) % 1000000007) % 1024
      |      AS b
      |  FROM events CROSS JOIN (VALUES (0), (1), (2), (3)) AS t(r))
      |GROUP BY r, b""".stripMargin

  // ------------------------------------------------------ stream_kmv_window

  /** Streaming per-day-window KMV distinct-user estimates; the k-min
    * distinct hash set is order-independent, so the complete-mode sink
    * equals the SQL recomputation (exact count below k, (k−1)·P div
    * kth-smallest at or above).
    */
  private def streamKmvWindow(s: SparkSession, dir: String): DataFrame = {
    val stream = Streams.readEventStream(s, stageEvents(s, dir, 4))
    Streams.runToCompletion(
      s, Streams.kmvWindowDistinct(stream), sink("gate_kmv"),
      mode = "complete")
      // DATE on both sides: the driver's canonical hash needs identical
      // scalar encodings, and day-window starts are exactly dates
      .select(col("win_start").cast(DateType).as("win_day"),
        col("n_events"), col("est_distinct"))
  }

  private val streamKmvWindowSql =
    """WITH hv AS (
      |  SELECT CAST(date_trunc('day', ts) AS DATE) AS win_day,
      |    (user_id * 48271) % 2147483647 AS h
      |  FROM events),
      |n AS (SELECT win_day, count(*) AS n_events FROM hv GROUP BY win_day),
      |dist AS (SELECT DISTINCT win_day, h FROM hv),
      |ranked AS (
      |  SELECT win_day, h,
      |    row_number() OVER (PARTITION BY win_day ORDER BY h) AS rk,
      |    count(*) OVER (PARTITION BY win_day) AS nd
      |  FROM dist)
      |SELECT n.win_day, n.n_events,
      |  CASE WHEN r.nd < 256 THEN r.nd
      |       ELSE (255 * CAST(2147483647 AS BIGINT)) // r.h
      |  END AS est_distinct
      |FROM ranked r JOIN n ON r.win_day = n.win_day
      |WHERE r.rk = CASE WHEN r.nd < 256 THEN r.nd ELSE 256 END""".stripMargin

  // ------------------------------------------------------------ stream_scd2

  /** Streaming SCD Type-2 maintenance over the orders change log; the
    * append-mode sink holds every CLOSED validity interval — exactly
    * the batch `scd2_history` rows with is_current = 0 (the open
    * interval per key lives only in state; append mode cannot retract
    * it). Replayed as one sorted file so per-key arrival order matches
    * the batch (day, seq) total order.
    */
  private def streamScd2(s: SparkSession, dir: String): DataFrame = {
    val d = tempDir("graft-gate-scd2")
    Tables.orders(s, dir)
      .select(col("o_custkey").as("key"),
        datediff(col("o_orderdate").cast(DateType),
          lit("1970-01-01").cast(DateType)).as("day"),
        col("o_orderkey").as("seq"),
        col("o_orderpriority").as("attr"))
      .orderBy(col("key"), col("day"), col("seq"))
      .coalesce(1).write.mode("overwrite").parquet(d)
    Streams.runToCompletion(
      s, Streams.scd2Steps(s, Streams.readChangeStream(s, d)),
      sink("gate_scd2"), mode = "append")
  }

  private val streamScd2Sql =
    """WITH log AS (
      |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
      |    o_orderpriority AS attr,
      |    row_number() OVER (PARTITION BY o_custkey, CAST(o_orderdate AS DATE)
      |      ORDER BY o_orderkey DESC) AS rn
      |  FROM orders),
      |changes AS (
      |  SELECT o_custkey, d, attr,
      |    lag(attr) OVER (PARTITION BY o_custkey ORDER BY d) AS prev
      |  FROM log WHERE rn = 1),
      |runs AS (
      |  SELECT o_custkey, attr, d AS valid_from
      |  FROM changes WHERE prev IS NULL OR attr <> prev),
      |hist AS (
      |  SELECT o_custkey AS key, attr, valid_from,
      |    lead(valid_from) OVER w AS valid_to,
      |    CAST(row_number() OVER w AS INTEGER) AS version
      |  FROM runs
      |  WINDOW w AS (PARTITION BY o_custkey ORDER BY valid_from))
      |SELECT key, attr,
      |  CAST(valid_from - DATE '1970-01-01' AS INTEGER) AS valid_from_day,
      |  CAST(valid_to - DATE '1970-01-01' AS INTEGER) AS valid_to_day,
      |  version
      |FROM hist WHERE valid_to IS NOT NULL""".stripMargin

  // -------------------------------------------------------- stream_postings

  /** Streaming inverted-index maintenance over replayed documents,
    * forced through MULTIPLE micro-batches (maxFilesPerTrigger = 2 over
    * 6 files) so cross-batch state merging is what the gate certifies.
    * The final emission per token (highest df — strictly monotone) is
    * the index row; pruned to df ≥ 5 like the batch face. Oracled with
    * the SAME SQL as the batch `index_postings` twin: the stream must
    * converge to the batch index exactly.
    */
  private def streamPostings(s: SparkSession, dir: String): DataFrame = {
    val d = tempDir("graft-gate-post")
    Tables.documents(s, dir).select(col("doc_id"), col("text"))
      .repartition(6).write.mode("overwrite").parquet(d)
    val stream = s.readStream.schema(Streams.docSchema)
      .option("maxFilesPerTrigger", "2").parquet(d)
    val emissions = Streams.runToCompletion(
      s, Streams.postingsMaintain(s, stream), sink("gate_post"),
      mode = "update")
    emissions
      .withColumn("rn", row_number().over(
        // per-token frames are the few micro-batch emissions of that
        // token — vocabulary-keyed, never SF-funneled
        Window.partitionBy(col("tok")).orderBy(col("df").desc)))
      .filter(col("rn") === 1 && col("df") >= 5)
      .select(col("tok"), col("df"), col("capped"), col("postings"))
  }

  // ------------------------------------------------------ stream_transitions

  /** Streaming Markov transition emitter replayed ordered, then the
    * sink's (src → dst) steps aggregated into the batch
    * `path_transitions` report — same (n, p_ppm) rows, oracled with
    * the batch twin's SQL. The p_ppm window runs over the AGGREGATED
    * ≤|event_type|² frame (aggregate-collapsed, not the fact stream).
    */
  private def streamTransitions(s: SparkSession, dir: String): DataFrame = {
    val steps = Streams.runToCompletion(
      s,
      Streams.transitionSteps(s,
        Streams.readEventStream(s, stageEventsSorted(s, dir))),
      sink("gate_trans"), mode = "append")
    steps
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("n"))
      .withColumn("from_total",
        sum(col("n")).over(Window.partitionBy(col("src"))))
      .select(col("src"), col("dst"), col("n"),
        expr("(n * 1000000) div from_total").as("p_ppm"))
  }

  // ----------------------------------------------------------- stream_funnel

  /** Streaming funnel state machine replayed ordered; the sink's
    * (user, stage) completions aggregate into the batch
    * `funnel_conversion` report (per-stage users + ppm conversion vs
    * stage 1). The 1-row view-count rides a broadcast nested-loop, not
    * a cartesian.
    */
  private def streamFunnel(s: SparkSession, dir: String): DataFrame = {
    val stages = Streams.runToCompletion(
      s,
      Streams.funnelStages(s,
        Streams.readEventStream(s, stageEventsSorted(s, dir))),
      sink("gate_funnel"), mode = "append")
    val counts = stages.groupBy(col("stage")).agg(count(lit(1)).as("n_users"))
    val nv = counts.filter(col("stage") === "1_view")
      .select(col("n_users").as("nv"))
    counts.crossJoin(broadcast(nv))
      .select(col("stage"), col("n_users"),
        when(col("stage") === "1_view", lit(1000000L))
          .otherwise(expr("(n_users * 1000000) div nv")).as("conv_ppm"))
  }

  def queries: Map[String, Q] = Map(
    "stream_cms" -> Q(streamCms _, streamCmsSql),
    "stream_kmv_window" -> Q(streamKmvWindow _, streamKmvWindowSql),
    "stream_scd2" -> Q(streamScd2 _, streamScd2Sql),
    "stream_postings" -> Q(streamPostings _, Retrieval.indexPostingsSql),
    "stream_transitions" -> Q(streamTransitions _, Extras.pathTransitionsSql),
    "stream_funnel" -> Q(streamFunnel _, Extras.funnelConversionSql)
  )
}
