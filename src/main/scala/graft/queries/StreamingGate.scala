package graft.queries

import java.nio.file.Files

import graft.{DimCache, Q, Tables}
import graft.streaming.Streams
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, LongType, TimestampType}

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

  /** Every gate temp dir is registered here and recursively deleted at
    * JVM exit — a Verify+Explain pass over the 24 gate queries would
    * otherwise leak dozens of staged-table copies into java.io.tmpdir
    * (each invocation stages events + checkpoint + sink dirs).
    */
  private val tempDirs =
    java.util.Collections.synchronizedList(
      new java.util.ArrayList[java.nio.file.Path]())
  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      tempDirs.forEach { root =>
        try {
          import scala.jdk.CollectionConverters._
          val s = Files.walk(root)
          try s.sorted(java.util.Comparator.reverseOrder())
            .iterator().asScala.foreach(p => Files.deleteIfExists(p))
          finally s.close()
        } catch { case _: Exception => () } // best-effort cleanup
      }))
  }

  private def tempDir(prefix: String): String = {
    val p = Files.createTempDirectory(prefix)
    tempDirs.add(p)
    p.toString
  }

  /** Stage the events table (normalized µs timestamps) as a replay dir.
    * Cached per (dir, parts): the staged copy is a deterministic
    * function of the immutable dataset dir, so one copy per JVM serves
    * every gate query and every Verify/Explain re-invocation.
    */
  private def stageEvents(s: SparkSession, dir: String, parts: Int): String =
    DimCache.cached(s"gate-stage-events:$dir:$parts") {
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
    * Cached per dir like [[stageEvents]].
    */
  private def stageEventsSorted(s: SparkSession, dir: String): String =
    DimCache.cached(s"gate-stage-events-sorted:$dir") {
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
    val d = DimCache.cached(s"gate-stage-scd2:$dir") {
      val t = tempDir("graft-gate-scd2")
      Tables.orders(s, dir)
        .select(col("o_custkey").as("key"),
          datediff(col("o_orderdate").cast(DateType),
            lit("1970-01-01").cast(DateType)).as("day"),
          col("o_orderkey").as("seq"),
          col("o_orderpriority").as("attr"))
        .orderBy(col("key"), col("day"), col("seq"))
        .coalesce(1).write.mode("overwrite").parquet(t)
      t
    }
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
    val d = DimCache.cached(s"gate-stage-post:$dir") {
      val t = tempDir("graft-gate-post")
      Tables.documents(s, dir).select(col("doc_id"), col("text"))
        .repartition(6).write.mode("overwrite").parquet(t)
      t
    }
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

  // ------------------------------------------------------ stream_start_state

  /** Aggregation with a start state (test_dataframes.py:743): the first
    * half of January is aggregated as a BATCH job into the initial
    * state; only the second half is replayed through the stream — the
    * finals must equal the batch aggregate over the WHOLE table, which
    * is exactly what the oracle recomputes. Certifies the
    * `flatMapGroupsWithState(initialState)` backfill→stream handoff
    * end-to-end, not just the stateful operator.
    */
  private def streamStartState(s: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("2024-01-16 00:00:00").cast(TimestampType)
    val ev = Tables.events(s, dir)
    val hist = ev
      .filter(col("ts") < cutoff)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n0"),
        sum(floor(col("value") * 100).cast(LongType)).as("cents0"))
    val d = DimCache.cached(s"gate-stage-start-state:$dir") {
      val t = tempDir("graft-gate-start-state")
      ev.filter(col("ts") >= cutoff)
        .select(Streams.eventSchema.fieldNames.map(col).toSeq: _*)
        .repartition(4)
        .write
        .mode("overwrite")
        .parquet(t)
      t
    }
    val sinkDf = Streams.runToCompletion(
      s,
      Streams.runningAggFromInitialState(s, Streams.readEventStream(s, d),
        hist),
      sink("gate_start_state"))
    // State-snapshot read side: initial state OVERRIDDEN by sink
    // updates. Update mode only emits TOUCHED keys — a key with no
    // post-cutoff rows lives solely in the seeded state — so finals =
    // init ∪ emissions, max per key (both fields strictly monotone).
    sinkDf
      .unionByName(
        hist.select(col("event_type"), col("n0").as("n_events"),
          col("cents0").as("cents")))
      .groupBy(col("event_type"))
      .agg(max(col("n_events")).as("n_events"), max(col("cents")).as("cents"))
  }

  private val streamStartStateSql =
    """SELECT event_type,
      |  CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
      |FROM events GROUP BY event_type""".stripMargin

  // ------------------------------------------------------ stream_running_agg

  /** The canonical continuously-updated grouped aggregate (the reference
    * streaming suite's first differential test,
    * test_dataframes.py:279): running count + exact fixed-point value
    * sum per event_type in complete mode. Order-independent by
    * construction ([[graft.Agg.dsum]] sums integer cents), so ANY
    * replay batching equals the batch aggregate bit-for-bit.
    */
  private def streamRunningAgg(s: SparkSession, dir: String): DataFrame = {
    val stream = Streams.readEventStream(s, stageEvents(s, dir, 4))
    Streams.runToCompletion(
      s, Streams.runningAggByType(stream), sink("gate_run"), mode = "complete")
  }

  private val streamRunningAggSql =
    s"""SELECT event_type, count(*) AS n,
      |  ${graft.Agg.dsumSql("value")} AS total_value
      |FROM events GROUP BY event_type""".stripMargin

  // --------------------------------------------------------- stream_tumbling

  /** Tumbling 5-minute event-time windows per event_type (count + exact
    * mean). Window starts are epoch-aligned on both engines, so the
    * oracle recomputes them as integer µs floor-division; the mean is
    * [[graft.Agg.davg]] (exact sum / exact count — replay-order
    * independent).
    */
  private def streamTumbling(s: SparkSession, dir: String): DataFrame = {
    val stream = Streams.readEventStream(s, stageEvents(s, dir, 4))
    Streams.runToCompletion(
      s, Streams.tumblingCounts(stream), sink("gate_tumble"),
      mode = "complete")
      // µs-integer window starts: identical scalar encoding on both
      // engines (the stream_kmv DATE-cast rule, sub-day granularity)
      .select(expr("unix_micros(win_start)").as("win_us"),
        col("event_type"), col("n"), col("avg_value"))
  }

  private val streamTumblingSql =
    s"""SELECT (epoch_us(ts) // 300000000) * 300000000 AS win_us,
      |  event_type, count(*) AS n,
      |  ${graft.Agg.davgSql("value")} AS avg_value
      |FROM events GROUP BY 1, 2""".stripMargin

  // ------------------------------------------------------------ stream_ohlc
  /** Streaming daily OHLC bars per (user, day) — the streaming face of
    * the batch `resample_ohlc` query, sharing its oracle verbatim.
    * Staged UNSORTED in 4 files and replayed 2 files per micro-batch:
    * min_by/max_by merge commutatively, so the cross-batch state merge
    * must converge to the batch bars exactly — this row is the gate's
    * arrival-order-INDEPENDENCE certificate (the per-key state machines
    * certify the opposite, ordered-replay, contract).
    */
  private def streamOhlc(s: SparkSession, dir: String): DataFrame = {
    val stream = s.readStream.schema(Streams.eventSchema)
      .option("maxFilesPerTrigger", "2").parquet(stageEvents(s, dir, 4))
    Streams.runToCompletion(
      s, Streams.ohlcWindows(stream), sink("gate_ohlc"), mode = "complete")
      .select(expr("unix_micros(win_start) div 86400000000").as("day"),
        col("user_id"), col("open_cents"), col("high_cents"),
        col("low_cents"), col("close_cents"), col("n"))
  }

  // ---------------------------------------------------------- stream_sliding
  /** Sliding windows (10-minute length, 5-minute slide): each event
    * lands in exactly two epoch-aligned windows, which is precisely the
    * oracle's cross join with offsets {0, 1} slide units.
    */
  private def streamSliding(s: SparkSession, dir: String): DataFrame = {
    val stream = Streams.readEventStream(s, stageEvents(s, dir, 4))
    Streams.runToCompletion(
      s, Streams.slidingCounts(stream), sink("gate_slide"),
      mode = "complete")
      .select(expr("unix_micros(win_start)").as("win_us"), col("n"))
  }

  private val streamSlidingSql =
    """SELECT win_us, count(*) AS n FROM (
      |  SELECT (epoch_us(ts) // 300000000 - t.k) * 300000000 AS win_us
      |  FROM events CROSS JOIN (VALUES (0), (1)) AS t(k))
      |GROUP BY win_us""".stripMargin

  // ---------------------------------------------------------- stream_session
  /** Per-user session windows (5-minute gap). Spark merges two events
    * into one session iff the later starts strictly before the earlier
    * session's end (half-open [ts, ts+gap) intervals), i.e. a gap
    * ≥ 5 min breaks — exactly the oracle's gaps-and-islands break
    * condition. Complete mode: the final merged sessions.
    */
  private def streamSession(s: SparkSession, dir: String): DataFrame = {
    val stream = Streams.readEventStream(s, stageEvents(s, dir, 4))
    Streams.runToCompletion(
      s, Streams.sessionCounts(stream), sink("gate_sess"),
      mode = "complete")
      .select(expr("unix_micros(sess_start)").as("sess_us"),
        col("user_id"), col("n_events"))
  }

  private val streamSessionSql =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
      |brk AS (
      |  SELECT user_id, us,
      |    CASE WHEN us - lag(us) OVER w >= 300000000
      |           OR lag(us) OVER w IS NULL THEN 1 ELSE 0 END AS b
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
      |grp AS (
      |  SELECT user_id, us,
      |    CAST(sum(b) OVER (PARTITION BY user_id ORDER BY us
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
      |  FROM brk)
      |SELECT min(us) AS sess_us, user_id, count(*) AS n_events
      |FROM grp GROUP BY user_id, sid""".stripMargin

  // ------------------------------------------------------ stream_dedup_exact
  /** Streaming exact dedup: the staged replay doubles every third event
    * (same rows, byte-identical), and the watermark-bounded
    * dropDuplicates must collapse them back to exactly the original
    * table — the sink is content-compared row-for-row against the
    * untouched events table (value doubles pass through unaltered, so
    * the hash is bit-exact).
    */
  private def streamDedupExact(s: SparkSession, dir: String): DataFrame = {
    val d = DimCache.cached(s"gate-stage-dupes:$dir") {
      val t = tempDir("graft-gate-dupes")
      val ev = Tables.events(s, dir)
        .select(Streams.eventSchema.fieldNames.map(col).toSeq: _*)
      ev.union(ev.filter(col("event_id") % 3 === 0))
        .repartition(4).write.mode("overwrite").parquet(t)
      t
    }
    Streams.runToCompletion(
      s, Streams.dedupStream(Streams.readEventStream(s, d)),
      sink("gate_dedup"), mode = "append")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"))
  }

  private val streamDedupExactSql =
    "SELECT event_id, user_id, event_type, value FROM events"

  // ------------------------------------------------------------- stream_join
  /** Watermarked stream-stream inner join (click × view within a 6-hour
    * event-time gap) — state on BOTH sides bounded by watermark +
    * range predicate. Inner-join emissions are a pure set: any replay
    * batching yields the batch join rows exactly.
    */
  private def streamJoin(s: SparkSession, dir: String): DataFrame = {
    val stream = Streams.readEventStream(s, stageEvents(s, dir, 4))
    Streams.runToCompletion(
      s, Streams.clickViewJoin(stream, "click", "view"),
      sink("gate_ssjoin"), mode = "append")
      .select(col("a_event"), col("a_user"),
        expr("unix_micros(a_ts)").as("a_us"),
        col("b_event"), expr("unix_micros(b_ts)").as("b_us"))
  }

  private val streamJoinSql =
    """SELECT a.event_id AS a_event, a.user_id AS a_user,
      |  epoch_us(a.ts) AS a_us,
      |  b.event_id AS b_event, epoch_us(b.ts) AS b_us
      |FROM events a JOIN events b
      |  ON b.user_id = a.user_id
      | AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 6 HOUR
      |WHERE a.event_type = 'click' AND b.event_type = 'view'""".stripMargin

  // ------------------------------------------------------ stream_asof_enrich
  /** Streaming as-of enrichment (two chained stateful operators: a
    * time-range stream-stream join feeding a per-probe max), certified
    * against a pure-SQL as-of: for every click, the latest purchase
    * value within the 6-hour lookback, ties on ref time resolving to
    * the greatest value (the batch operator's tiebreak).
    *
    * Append-mode flush: the final watermark is max-event-time − 12 h,
    * which would strand probes in the stream's last 12 hours inside
    * state forever. The replay therefore appends two FAR-FUTURE
    * sentinel events on a user id outside the domain (a purchase at
    * max+30 d and a click at max+31 d — 24 h apart, so the 6-hour
    * lookback joins them to nothing, and the sentinel probe's empty
    * inner join emits no row): they advance BOTH branches' watermarks
    * past every real probe, the streaming analogue of closing a topic
    * with an end-of-stream marker.
    */
  private def streamAsofEnrich(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(Streams.eventSchema.fieldNames.map(col).toSeq: _*)
    val sentinels = ev
      .agg(max(col("ts")).as("mx"))
      .select(explode(array(
        struct(lit(-1L).as("event_id"),
          (col("mx") + expr("INTERVAL 30 DAYS")).as("ts"),
          lit(-1L).as("user_id"), lit("purchase").as("event_type"),
          lit(0.0).as("value"), lit(null).cast("string").as("props")),
        struct(lit(-2L).as("event_id"),
          (col("mx") + expr("INTERVAL 31 DAYS")).as("ts"),
          lit(-1L).as("user_id"), lit("click").as("event_type"),
          lit(0.0).as("value"), lit(null).cast("string").as("props"))))
        .as("e"))
      .select(col("e.*"))
    val d = DimCache.cached(s"gate-stage-asof:$dir") {
      val t = tempDir("graft-gate-asof")
      ev.union(sentinels).repartition(4).write.mode("overwrite").parquet(t)
      t
    }
    val stream = Streams.readEventStream(s, d)
    Streams.runToCompletion(
      s, Streams.asOfEnrich(stream, "click", "purchase"),
      sink("gate_asof"), mode = "append")
      .select(col("p_event"), col("p_user"),
        expr("unix_micros(p_ts)").as("p_us"),
        col("asof_value"), expr("unix_micros(asof_ts)").as("asof_us"))
  }

  private val streamAsofEnrichSql =
    """WITH j AS (
      |  SELECT p.event_id AS pe, p.user_id AS pu, epoch_us(p.ts) AS pus,
      |    r.value AS rv, epoch_us(r.ts) AS rus
      |  FROM events p JOIN events r
      |    ON r.user_id = p.user_id
      |   AND r.ts <= p.ts AND r.ts >= p.ts - INTERVAL 6 HOUR
      |  WHERE p.event_type = 'click' AND r.event_type = 'purchase'),
      |m AS (SELECT pe, max(rus) AS asof_us FROM j GROUP BY pe)
      |SELECT j.pe AS p_event, j.pu AS p_user, j.pus AS p_us,
      |  max(j.rv) AS asof_value, m.asof_us
      |FROM j JOIN m ON j.pe = m.pe AND j.rus = m.asof_us
      |GROUP BY j.pe, j.pu, j.pus, m.asof_us""".stripMargin

  // ------------------------------------------------------- stream_enrich_dim
  /** Stream-static enrichment: the event stream joined to the customer
    * dimension per micro-batch — stateless (no store at any stream
    * length), the standard shape for attaching reference data to a
    * high-volume stream. Content-compared against the batch join.
    */
  private def streamEnrichDim(s: SparkSession, dir: String): DataFrame = {
    val stream = Streams.readEventStream(s, stageEvents(s, dir, 4))
    Streams.runToCompletion(
      s, Streams.enrichWithDim(stream, Tables.customer(s, dir)),
      sink("gate_enrich"), mode = "append")
  }

  private val streamEnrichDimSql =
    """SELECT e.event_id, e.user_id, e.event_type, e.value, c.c_mktsegment
      |FROM events e JOIN customer c ON e.user_id = c.c_custkey""".stripMargin

  // ----------------------------------------------------------- stream_zscore
  /** Streaming rolling z-score monitor (7-value ring per user, BigInt
    * sqrt-free flag) replayed ordered, its flag stream aggregated to
    * the batch `ts_anomaly_zscore` report — same SQL oracle as the
    * batch twin.
    */
  private def streamZscore(s: SparkSession, dir: String): DataFrame = {
    val flags = Streams.runToCompletion(
      s,
      Streams.zscoreFlags(s,
        Streams.readEventStream(s, stageEventsSorted(s, dir))),
      sink("gate_zscore"), mode = "append")
    flags
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_eval"), sum(col("flag")).as("n_anomalies"))
      .select(col("event_type"), col("n_eval"), col("n_anomalies"),
        expr("(n_anomalies * 1000000) div n_eval").as("anomaly_ppm"))
  }

  // ------------------------------------------------------ stream_attribution
  /** Streaming last-touch attribution (one channel string of state per
    * user, credit emitted the moment a purchase arrives) replayed
    * ordered, aggregated to the batch `attribution_last_touch` report —
    * same SQL oracle as the batch twin.
    */
  private def streamAttribution(s: SparkSession, dir: String): DataFrame = {
    val credits = Streams.runToCompletion(
      s,
      Streams.attributionSteps(s,
        Streams.readEventStream(s, stageEventsSorted(s, dir))),
      sink("gate_attr"), mode = "append")
    credits
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_purchases"),
        countDistinct(col("user_id")).as("n_users"))
  }

  // ----------------------------------------------- stream_attribution_window
  /** The WINDOWED attribution machine (event-time state eviction,
    * `Streams.attributionStepsWindowed`): a touch carries credit for
    * ONE day only. Ordered single-batch replay — timeouts never fire
    * mid-batch, but the in-group aging check applies the identical
    * window rule, so the sink equals the SQL's bounded-lookback
    * last-touch credit exactly. At this data density the 1-day window
    * genuinely diverges from the unbounded `stream_attribution` row
    * ('(none)' 51 → 552 at sf0.01), so both rows green is direct
    * evidence the two semantics are implemented distinctly and
    * correctly; the eviction (state-drop) side is pinned by
    * StreamEvictionSpec's crafted multi-batch gap.
    */
  private def streamAttributionWindow(s: SparkSession, dir: String): DataFrame = {
    val credits = Streams.runToCompletion(
      s,
      Streams.attributionStepsWindowed(s,
        Streams.readEventStream(s, stageEventsSorted(s, dir))
          .withWatermark("ts", "0 seconds"),
        windowDays = 1),
      sink("gate_attrwin"), mode = "append")
    credits
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_purchases"),
        countDistinct(col("user_id")).as("n_users"))
  }

  private val streamAttributionWindowSql =
    """WITH touched AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS pus,
      |    last_value(CASE WHEN event_type IN ('view', 'click', 'signup')
      |      THEN event_type END IGNORE NULLS) OVER w AS touch,
      |    last_value(CASE WHEN event_type IN ('view', 'click', 'signup')
      |      THEN epoch_us(ts) END IGNORE NULLS) OVER w AS tus
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
      |SELECT
      |  coalesce(CASE WHEN pus - tus <= 86400000000 THEN touch END,
      |    '(none)') AS channel,
      |  count(*) AS n_purchases,
      |  count(DISTINCT user_id) AS n_users
      |FROM touched WHERE event_type = 'purchase'
      |GROUP BY 1""".stripMargin

  // ------------------------------------------------------------ stream_drift
  /** Streaming drift monitor: per 6-hour tumbling window, micro-unit
    * event_type proportions + total-variation distance against a
    * STATIC first-half-month baseline (the online data-quality gate a
    * recurring ingest runs while loading). Pure integer arithmetic —
    * the oracle recomputes baseline, proportions, and TVD in SQL.
    */
  private def streamDrift(s: SparkSession, dir: String): DataFrame = {
    val base = Streams.driftBaseline(
      Tables.events(s, dir)
        .filter(col("ts") < lit("2024-01-16").cast("timestamp")))
    val stream = Streams.readEventStream(s, stageEvents(s, dir, 4))
    Streams.runToCompletion(
      s, Streams.driftMonitor(stream, base), sink("gate_drift"),
      mode = "update")
      .select(expr("unix_micros(win_start)").as("win_us"), col("bucket"),
        col("p_base_micro"), col("p_cur_micro"), col("drift_micro"),
        col("tvd_micro"))
  }

  private val streamDriftSql =
    """WITH base AS (
      |  SELECT event_type AS bucket,
      |    count(*) * 1000000 // (SELECT count(*) FROM events
      |      WHERE ts < TIMESTAMP '2024-01-16') AS p_base
      |  FROM events WHERE ts < TIMESTAMP '2024-01-16' GROUP BY 1),
      |wins AS (
      |  SELECT (epoch_us(ts) // 21600000000) * 21600000000 AS win_us,
      |    event_type, count(*) AS c
      |  FROM events GROUP BY 1, 2),
      |wn AS (SELECT win_us, CAST(sum(c) AS BIGINT) AS n
      |       FROM wins GROUP BY 1),
      |cur AS (
      |  SELECT w.win_us, b.bucket, b.p_base,
      |    coalesce(x.c, 0) * 1000000 // w.n AS p_cur
      |  FROM wn w CROSS JOIN base b
      |  LEFT JOIN wins x ON x.win_us = w.win_us AND x.event_type = b.bucket
      |  UNION ALL
      |  SELECT w.win_us, 'OTHER', CAST(0 AS BIGINT),
      |    coalesce((SELECT CAST(sum(x.c) AS BIGINT) FROM wins x
      |      WHERE x.win_us = w.win_us
      |        AND x.event_type NOT IN (SELECT bucket FROM base)), 0)
      |      * 1000000 // w.n
      |  FROM wn w),
      |tvd AS (SELECT win_us,
      |          CAST(sum(abs(p_base - p_cur)) AS BIGINT) // 2 AS tvd_micro
      |        FROM cur GROUP BY 1)
      |SELECT c.win_us, c.bucket,
      |  CAST(c.p_base AS BIGINT) AS p_base_micro,
      |  CAST(c.p_cur AS BIGINT) AS p_cur_micro,
      |  CAST(abs(c.p_base - c.p_cur) AS BIGINT) AS drift_micro,
      |  t.tvd_micro
      |FROM cur c JOIN tvd t ON c.win_us = t.win_us""".stripMargin

  // ------------------------------------------------------ stream_near_dedup
  /** Streaming MinHash near-dedup through the watermark-bounded state
    * store, oracled end-to-end: the replay doubles the corpus (same
    * texts under shifted doc_ids, ≤100 s apart — inside the 10-minute
    * horizon), the stream drops signature collisions, and the sink's
    * surviving signature set must equal the distinct portable-minhash
    * signatures of the doubled corpus recomputed in pure SQL (short and
    * null docs keyed by their own doc_id — not near-dedup candidates,
    * the batch rule). Output is (sig, n_rows) with n_rows = 1 required
    * everywhere: a missed dedup would surface as n_rows = 2, a dropped
    * non-duplicate as a missing sig row. Signature-set comparison makes
    * the gate independent of WHICH collider survives (arrival order).
    * The NUL byte in the short-doc key is re-encoded ':' for the
    * oracle (DuckDB varchars cannot carry NUL).
    */
  // ---------------------------------------------- stream_semantic_dedup
  /** Streaming SemDeDup (`Streams.semanticDedupStream`): the embeddings
    * table replayed as a stream (deterministic synthetic event time —
    * base + vec_id seconds, so the first-seen order IS vec_id order),
    * assigned map-side to the SAME DimCache'd k = 8 centroid set the
    * batch `dedup_semantic_keep` uses, deduped first-seen-wins per cell
    * at the same τ = 0.35. Fully oracled: the verdict for vector v is
    * "dropped iff an earlier (lower vec_id) same-cell vector has cosine
    * ≥ τ" — a plain EXISTS in SQL, no recursion, because state compares
    * against ALL seen vectors within the horizon (the same contract as
    * the signature store in `stream_near_dedup`), not only kept ones.
    */
  private def streamSemanticDedup(s: SparkSession, dir: String): DataFrame = {
    val d = DimCache.cached(s"gate-stage-embts:$dir") {
      val t = tempDir("graft-gate-embts")
      Tables.embeddings(s, dir)
        .select(col("vec_id"),
          expr("timestamp'2024-01-01 00:00:00' + INTERVAL 1 SECOND * vec_id")
            .as("ts"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("embedding"))
        .orderBy(col("vec_id"))
        .coalesce(1).write.mode("overwrite").parquet(t)
      t
    }
    // same cache key as the batch operator — one centroid build per JVM
    // serves both twins
    val cRows = DimCache.cached(s"ivf-centroids:$dir:8") {
      graft.operators.Similarity.centroidArrays(
        graft.operators.Similarity.centroids(
          Tables.embeddings(s, dir).select(col("vec_id"),
            expr("transform(embedding, x -> CAST(x AS DOUBLE))")
              .as("embedding")),
          nCells = 8))
    }
    val stream = s.readStream.schema(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("vec_id", LongType),
        org.apache.spark.sql.types.StructField("ts", TimestampType),
        org.apache.spark.sql.types.StructField("embedding",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType))))).parquet(d)
    // requireSingleDataBatch: the SQL twin below is HORIZON-FREE (every
    // earlier same-cell partner counts), which equals the stream's
    // watermark-evicted semantics only while the whole replay fits in
    // one microbatch at watermark 0 — the coalesce(1) + AvailableNow
    // staging guarantees that today; this asserts it stays true.
    Streams.runToCompletion(s,
      Streams.semanticDedupStream(s, stream, cRows, tau = 0.35),
      sink("gate_semdedup"), mode = "append", requireSingleDataBatch = true)
  }

  /** DuckDB twin: the `dedup_semantic_keep` centroid/assignment CTEs
    * verbatim (same Lehmer pick, unit-normalization, ascending folds),
    * with the pair stage restricted to EARLIER partners (b.vec_id <
    * a.vec_id = arrival order under the synthetic event time) — the
    * first-seen-wins verdict, no dominance ranking.
    */
  private val streamSemanticDedupSql =
    """WITH ev AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      |  FROM embeddings),
      |picked AS (
      |  SELECT vec_id, e FROM ev
      |  ORDER BY (vec_id * 48271) % 2147483647, vec_id LIMIT 8),
      |cents AS (
      |  SELECT (row_number() OVER (ORDER BY vec_id)) - 1 AS cell_id,
      |    e AS centroid
      |  FROM picked),
      |unitc AS (
      |  SELECT cell_id, centroid,
      |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list_transform(centroid, x -> x * x)), (acc, v) -> acc + v)) AS n
      |  FROM cents),
      |unit AS (
      |  SELECT cell_id,
      |    list_transform(centroid,
      |      x -> CASE WHEN n = 0 THEN CAST(0.0 AS DOUBLE) ELSE x / n END) AS cu
      |  FROM unitc),
      |cl AS (SELECT list(cu ORDER BY cell_id) AS cus FROM unit),
      |assigned AS (
      |  SELECT vec_id, e, list_position(sims, list_max(sims)) - 1 AS cell_id
      |  FROM (
      |    SELECT vec_id, e,
      |      list_transform(cus, cu ->
      |        list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |          list_transform(range(1, len(e) + 1), i -> e[i] * cu[i])),
      |          (acc, v) -> acc + v)) AS sims
      |    FROM ev CROSS JOIN cl)),
      |m AS (
      |  SELECT vec_id, cell_id, e,
      |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list_transform(e, x -> x * x)), (acc, v) -> acc + v) AS n2
      |  FROM assigned),
      |near AS (
      |  SELECT a.vec_id AS id_a, count(*) AS n_near
      |  FROM m a JOIN m b ON a.cell_id = b.cell_id AND b.vec_id < a.vec_id
      |  WHERE list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list_transform(range(1, len(a.e) + 1), i -> a.e[i] * b.e[i])),
      |      (acc, v) -> acc + v) / (sqrt(a.n2) * sqrt(b.n2)) >= 0.35
      |  GROUP BY a.vec_id)
      |SELECT m.vec_id, CAST(m.cell_id AS INTEGER) AS cell_id,
      |  coalesce(near.n_near, 0) = 0 AS kept,
      |  CAST(coalesce(near.n_near, 0) AS BIGINT) AS n_near
      |FROM m LEFT JOIN near ON m.vec_id = near.id_a""".stripMargin

  /** Ingest-time decontamination (the streaming face of
    * `decontaminate_ngrams`): documents replayed with synthetic ingest
    * time (doc_id seconds), the FROZEN benchmark 4-gram set (the batch
    * twin's doc_id % 100 = 0 subset) as the static side of a map-side
    * stream-static LEFT SEMI join, and a per-(10-minute window, doc)
    * shared-gram count. Complete mode: per-cell count adds merge
    * order-independently (the stream_cms contract), so any replay
    * batching equals the batch answer; a production deployment swaps
    * complete for watermark + append to evict settled windows.
    */
  private def streamDecontaminate(s: SparkSession, dir: String): DataFrame = {
    val d = DimCache.cached(s"gate-stage-docts:$dir") {
      val t = tempDir("graft-gate-docts")
      Tables.documents(s, dir)
        .select(col("doc_id"), col("text"),
          expr("timestamp'2024-01-01 00:00:00' + INTERVAL 1 SECOND * doc_id")
            .as("ts"))
        .repartition(4).write.mode("overwrite").parquet(t)
      t
    }
    val bench = Tables.documents(s, dir)
      .filter(pmod(col("doc_id"), lit(100)) === 0)
      .select(split(coalesce(col("text"), lit("")), " ").as("tk"))
      .filter(size(col("tk")) >= 4)
      .select(explode(expr(
        """transform(sequence(0, size(tk) - 4),
          |  i -> concat_ws(' ', slice(tk, i + 1, 4)))""".stripMargin)).as("g8"))
      .distinct()
    val stream = s.readStream.schema(
      org.apache.spark.sql.types.StructType(Streams.docSchema.fields :+
        org.apache.spark.sql.types.StructField("ts", TimestampType)))
      .parquet(d)
    Streams.runToCompletion(
      s, Streams.decontaminateStream(stream, bench), sink("gate_decon"),
      mode = "complete")
      .select(expr("unix_micros(win_start)").as("win_us"), col("doc_id"),
        col("n_shared_grams"))
  }

  /** DuckDB twin: the `decontaminate_ngrams` gram/bench/count CTEs
    * verbatim, plus the synthetic ingest-time window bucket computed
    * directly from doc_id (ts = 2024-01-01 + doc_id seconds, 10-minute
    * epoch-aligned tumble — exactly Spark's `window()` start).
    */
  private val streamDecontaminateSql =
    """WITH g AS (
      |  SELECT DISTINCT doc_id, g8 FROM (
      |    SELECT doc_id,
      |      unnest(list_transform(range(0, len(tk) - 3),
      |        i -> array_to_string(list_slice(tk, i + 1, i + 4), ' '))) AS g8
      |    FROM (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS tk
      |          FROM documents) t0
      |    WHERE len(tk) >= 4) t1),
      |bench AS (SELECT DISTINCT g8 FROM g WHERE doc_id % 100 = 0),
      |contam AS (
      |  SELECT doc_id, count(*) AS n_shared_grams
      |  FROM g WHERE doc_id % 100 <> 0 AND g8 IN (SELECT g8 FROM bench)
      |  GROUP BY doc_id)
      |SELECT CAST(((epoch_us(TIMESTAMP '2024-01-01 00:00:00')
      |    + doc_id * 1000000) // 600000000) * 600000000 AS BIGINT) AS win_us,
      |  doc_id, CAST(n_shared_grams AS BIGINT) AS n_shared_grams
      |FROM contam""".stripMargin

  private def streamNearDedup(s: SparkSession, dir: String): DataFrame = {
    val d = DimCache.cached(s"gate-stage-neardup:$dir") {
      val t = tempDir("graft-gate-neardup")
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val doubled = docs
        .union(docs.select((col("doc_id") + lit(1000000L)).as("doc_id"),
          col("text")))
        .withColumn("ts", expr(
          "timestamp'2026-01-01 00:00:00' + INTERVAL 1 SECOND * (doc_id % 300)"))
      doubled.repartition(4).write.mode("overwrite").parquet(t)
      t
    }
    val stream = s.readStream.schema(
      org.apache.spark.sql.types.StructType(Streams.docSchema.fields :+
        org.apache.spark.sql.types.StructField("ts",
          org.apache.spark.sql.types.TimestampType))).parquet(d)
    Streams.runToCompletion(
      s, Streams.nearDedupStream(stream, "ts", portable = true),
      sink("gate_neardup"), mode = "append")
      .groupBy(replace(col("sig"), lit("\u0000"), lit(":")).as("sig"))
      .agg(count(lit(1)).as("n_rows"))
  }

  private val streamNearDedupSql =
    s"""WITH all_docs AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL SELECT doc_id + 1000000, text FROM documents),
      |grams AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(
      |      range(1, greatest(len(string_split(text, ' ')) - 2, 0) + 1),
      |      i -> concat(string_split(text, ' ')[i], '_',
      |                  string_split(text, ' ')[i + 1], '_',
      |                  string_split(text, ' ')[i + 2]))) AS tk
      |  FROM all_docs),
      |prehashed AS (
      |  SELECT doc_id,
      |    list_transform(tk, g ->
      |      list_reduce(
      |        list_prepend(CAST(0 AS BIGINT),
      |          list_transform(range(1, length(g) + 1),
      |                         i -> CAST(ascii(substring(g, i, 1)) AS BIGINT))),
      |        (h, c) -> (h * 31 + c) % 1000000007)) AS pp,
      |    list_transform(tk, g ->
      |      list_reduce(
      |        list_prepend(CAST(1 AS BIGINT), range(1, length(g) + 1)),
      |        (w, i) -> (w * 31) % 1000000007)) AS ww
      |  FROM grams),
      |sigs AS (
      |  SELECT CASE WHEN coalesce(len(pp), 0) = 0
      |    THEN 'doc:' || CAST(doc_id AS VARCHAR)
      |    ELSE ${graft.ArrCanon.joinedSql(
        """list_transform(range(0, 16), p ->
          |    list_min(list_transform(range(1, len(pp) + 1),
          |      i -> (CAST(p AS BIGINT) * ww[i] + pp[i]) % 1000000007)))"""
          .stripMargin)} END AS sig
      |  FROM prehashed)
      |SELECT sig, CAST(1 AS BIGINT) AS n_rows
      |FROM (SELECT DISTINCT sig FROM sigs)""".stripMargin

  // ---------------------------------------------------- stream_last_n_mean
  /** The streamz row-count window (`window(n=4)`,
    * test_dataframes.py:554): per-user mean over the last 4 rows by
    * explicit flatMapGroupsWithState ring state, replayed ordered so
    * the sink's one final emission per user equals the batch last-4
    * mean — the oracle reproduces the op's LEFT-FOLD sum over the
    * identically-ordered value list (list_reduce), so the double is
    * bit-exact, not an envelope.
    */
  private def streamLastNMean(s: SparkSession, dir: String): DataFrame = {
    Streams.runToCompletion(
      s,
      Streams.lastNMean(s,
        Streams.readEventStream(s, stageEventsSorted(s, dir)), 4),
      sink("gate_lastn"), mode = "update")
  }

  private val streamLastNMeanSql =
    """WITH ranked AS (
      |  SELECT user_id, value, ts, event_id,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events)
      |SELECT user_id,
      |  list_reduce(list(value ORDER BY ts, event_id), (a, b) -> a + b)
      |    / count(*) AS last_n_mean,
      |  CAST(count(*) AS INTEGER) AS n_in_window
      |FROM ranked WHERE rn <= 4 GROUP BY user_id""".stripMargin

  // ------------------------------------------------- stream_tdigest_window
  /** Per-window p50/p99 via the mergeable t-digest — rows-only BY
    * DESIGN: centroid formation is merge-order-dependent, so
    * stream-vs-batch equality is an accuracy envelope (pinned by
    * StreamingSpec's rank-error bound), not a hash. In-family
    * hash-green twins: `stream_kmv_window` (same windowed-sketch
    * shape) and `agg_tdigest_vs_exact` (the digest's accuracy oracle).
    */
  private def streamTdigestWindow(s: SparkSession, dir: String): DataFrame = {
    val stream = Streams.readEventStream(s, stageEvents(s, dir, 4))
    Streams.runToCompletion(
      s, Streams.tdigestWindowQuantiles(stream), sink("gate_td"),
      mode = "complete")
      .select(expr("unix_micros(win_start)").as("win_us"),
        col("n_events"), col("p50_est"), col("p99_est"))
  }

  // ------------------------------------------------ stream_checkpoint_resume
  /** Checkpointed kill-resume through the production sink shape
    * (readStream → transform → writeStream.parquet): the first query
    * runs the 6-file replay one file per micro-batch and is STOPPED as
    * soon as a batch has committed (input still pending); a second
    * query resumes from the same checkpoint with AvailableNow and
    * drains. The returned result reads the file sink through its
    * `_spark_metadata` transaction log, so the hash certifies
    * exactly-once end-to-end across the kill: a replayed in-flight
    * batch would surface as duplicate rows, a lost offset as missing
    * rows. (State-store recovery under kill is pinned separately by
    * StreamingSpec's near-dedup kill test; this gate row certifies the
    * offset-log/sink-commit contract every 100 TB ingest leans on.)
    */
  private def streamCheckpointResume(s: SparkSession, dir: String): DataFrame = {
    val in = tempDir("graft-gate-cpr-in")
    val out = tempDir("graft-gate-cpr-out")
    val cp = tempDir("graft-gate-cpr-cp")
    Tables.events(s, dir)
      .select(Streams.eventSchema.fieldNames.map(col).toSeq: _*)
      .repartition(6).write.mode("overwrite").parquet(in)
    def writer() = s.readStream.schema(Streams.eventSchema)
      .option("maxFilesPerTrigger", "1").parquet(in)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), upper(col("event_type")).as("event_type_uc"))
      .writeStream.outputMode("append").format("parquet")
      .option("path", out).option("checkpointLocation", cp)
    Streams.applyStateProvider(s) // same flag routing as runToCompletion
    val q1 = writer().start()
    val deadline = System.currentTimeMillis() + 60000
    while (q1.recentProgress.count(_.numInputRows > 0) < 1 &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
    q1.stop(); q1.awaitTermination()
    val q2 = writer()
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q2.awaitTermination()
    s.read.parquet(out)
  }

  private val streamCheckpointResumeSql =
    """SELECT event_id, user_id, event_type, value,
      |  upper(event_type) AS event_type_uc
      |FROM events""".stripMargin

  // -------------------------------------------------------- stream_pq_encode
  /** Streaming product-quantization encode — the stateless ANN ingest
    * shape: arriving embeddings gain their 8 nearest-codeword indices
    * as a pure projection over literal codebooks (no state, no shuffle,
    * no watermark needed), so a 100 TB/day vector stream compresses to
    * codes at scan speed. Codebooks are the strided-pick exemplars of
    * `sim_ivfpq_topk` (deterministic, SQL-replicable); the oracle
    * recomputes every per-subspace argmin with the identical
    * ascending-index IEEE fold and first-min tiebreak.
    */
  private def streamPqEncode(s: SparkSession, dir: String): DataFrame = {
    val M = 8; val K = 16; val dsub = 8
    val emb = Tables.embeddings(s, dir).select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("e"))
    val cb = graft.DimCache.cached(s"pq-codebooks:$dir:$M:$K") {
      graft.operators.Similarity.pqCodebooks(emb, M, K, dsub)
    }
    val d = DimCache.cached(s"gate-stage-pq:$dir") {
      val t = tempDir("graft-gate-pq")
      emb.repartition(4).write.mode("overwrite").parquet(t)
      t
    }
    val stream = s.readStream.schema(emb.schema).parquet(d)
    Streams.runToCompletion(
      s, graft.operators.Similarity.encodePq(stream, cb, dsub).drop("e"),
      sink("gate_pq"), mode = "append")
  }

  /** Streaming ingest for the IVF,SQ8 composed index (the
    * `stream_pq_encode` precedent at the r19 index's shape): each
    * arriving vector gains its coarse cell (broadcast argmax over the
    * frozen centroid set) AND its SQ8 byte codes (frozen bounds) as
    * ONE stateless projection — exactly the row the cell-partitioned
    * index write appends, so new vectors route to their cell partition
    * without touching any other cell's files. Codes ship as the
    * ArrCanon-joined string (the emb_quantize array convention);
    * oracle recomputes assignment + quantizer from the raw table.
    */
  private def streamIvfSq8Encode(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir).select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("e"))
    val cRows = DimCache.cached(s"ivf-centroids:$dir:8") {
      graft.operators.Similarity.centroidArrays(
        graft.operators.Similarity.centroids(
          emb.select(col("vec_id"), col("e").as("embedding")), nCells = 8))
    }
    val (mn, mx) = DimCache.cached(s"sq8-bounds:$dir") {
      graft.operators.Similarity.sq8Bounds(emb)
    }
    val d = DimCache.cached(s"gate-stage-pq:$dir") {
      val t = tempDir("graft-gate-pq")
      emb.repartition(4).write.mode("overwrite").parquet(t)
      t
    }
    val stream = s.readStream.schema(emb.schema).parquet(d)
    Streams.runToCompletion(
      s, graft.operators.Similarity
        .encodeIvfSq8(stream.select(col("vec_id"), col("e").as("embedding")),
          cRows, mn, mx)
        .select(col("vec_id"), col("cell_id"),
          graft.ArrCanon.joined(expr("transform(codes, c -> CAST(c AS INT))"))
            .as("codes_str")),
      sink("gate_ivfsq8enc"), mode = "append")
  }

  /** Streaming binary-quantization encode (the `stream_pq_encode` /
    * `stream_ivfsq8_encode` family member for the r19 1-bit index):
    * each arriving vector gains its two packed 32-bit sign-bit halves
    * against the FROZEN midpoint thresholds — one stateless projection
    * (no state, no shuffle, no watermark), exactly the row the binary
    * index write appends, so a vector stream compresses to 16
    * bytes/row at ingest speed. The oracle recomputes bounds →
    * thresholds → pack from the raw table with identical arithmetic.
    */
  private def streamBinaryEncode(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir).select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("e"))
    val (mn, mx) = DimCache.cached(s"sq8-bounds:$dir") {
      graft.operators.Similarity.sq8Bounds(emb)
    }
    val thr = graft.operators.Similarity.binaryThresholds(mn, mx)
    val d = DimCache.cached(s"gate-stage-pq:$dir") {
      val t = tempDir("graft-gate-pq")
      emb.repartition(4).write.mode("overwrite").parquet(t)
      t
    }
    val stream = s.readStream.schema(emb.schema).parquet(d)
    Streams.runToCompletion(
      s, graft.operators.Similarity.encodeBinary(stream, thr),
      sink("gate_bqenc"), mode = "append")
  }

  /** DuckDB twin: the binary bounds/threshold/pack CTEs (shared with
    * `sim_binary_topk`) emitted verbatim.
    */
  private val streamBinaryEncodeSql =
    LlmOps.bqCodesCte + "\nSELECT vec_id, lo, hi FROM codes"

  /** DuckDB twin: the `sim_ivfsq8_topk` assignment CTEs + the SQ8
    * quantizer emitted as the joined INT list.
    */
  private val streamIvfSq8EncodeSql =
    s"""WITH ev AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      |  FROM embeddings),
      |picked AS (
      |  SELECT vec_id, e FROM ev
      |  ORDER BY (vec_id * 48271) % 2147483647, vec_id LIMIT 8),
      |cents AS (
      |  SELECT (row_number() OVER (ORDER BY vec_id)) - 1 AS cell_id,
      |    e AS centroid
      |  FROM picked),
      |unitc AS (
      |  SELECT cell_id, centroid,
      |    sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list_transform(centroid, x -> x * x)), (acc, v) -> acc + v)) AS n
      |  FROM cents),
      |unit AS (
      |  SELECT cell_id,
      |    list_transform(centroid,
      |      x -> CASE WHEN n = 0 THEN CAST(0.0 AS DOUBLE) ELSE x / n END) AS cu
      |  FROM unitc),
      |cl AS (SELECT list(cu ORDER BY cell_id) AS cus FROM unit),
      |assigned AS (
      |  SELECT vec_id, e, list_position(sims, list_max(sims)) - 1 AS cell_id
      |  FROM (
      |    SELECT vec_id, e,
      |      list_transform(cus, cu ->
      |        list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |          list_transform(range(1, len(e) + 1), i -> e[i] * cu[i])),
      |          (acc, v) -> acc + v)) AS sims
      |    FROM ev CROSS JOIN cl)),
      |d AS (SELECT CAST(min(len(e)) AS BIGINT) AS nd FROM ev),
      |bounds AS (
      |  SELECT ix.i AS dim, min(e[ix.i]) AS mn, max(e[ix.i]) AS mx
      |  FROM ev, (SELECT unnest(range(1, (SELECT nd + 1 FROM d))) AS i) ix
      |  GROUP BY ix.i),
      |mnl AS (SELECT list(mn ORDER BY dim) AS mnl,
      |               list(mx - mn ORDER BY dim) AS scl FROM bounds),
      |codes AS (
      |  SELECT vec_id, cell_id,
      |    list_transform(range(1, len(e) + 1), i ->
      |      CASE WHEN scl[i] = 0 THEN -128
      |      ELSE CAST(floor((e[i] - mnl[i]) / scl[i] * 255 + 0.5) - 128
      |        AS INTEGER) END) AS c
      |  FROM assigned, mnl)
      |SELECT vec_id, CAST(cell_id AS INTEGER) AS cell_id,
      |  ${graft.ArrCanon.joinedSql("c")} AS codes_str
      |FROM codes""".stripMargin

  private val streamPqEncodeSql =
    """WITH ev AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      |  FROM embeddings),
      |picked AS (
      |  SELECT vec_id, e FROM ev
      |  ORDER BY (vec_id * 48271) % 2147483647, vec_id LIMIT 16),
      |cw AS (
      |  SELECT (row_number() OVER (ORDER BY vec_id)) - 1 AS k, e FROM picked),
      |ms AS (SELECT unnest(range(0, 8)) AS m),
      |dists AS (
      |  SELECT v.vec_id, ms.m, c.k,
      |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      |      list_transform(range(1, 9), j ->
      |        (v.e[ms.m * 8 + j] - c.e[ms.m * 8 + j])
      |          * (v.e[ms.m * 8 + j] - c.e[ms.m * 8 + j]))),
      |      (acc, x) -> acc + x) AS d
      |  FROM ev v CROSS JOIN cw c CROSS JOIN ms),
      |codes AS (
      |  SELECT vec_id, m, k FROM dists
      |  QUALIFY row_number() OVER (PARTITION BY vec_id, m ORDER BY d, k) = 1)
      |SELECT vec_id,
      |  CAST(max(CASE WHEN m = 0 THEN k END) AS INTEGER) AS c0,
      |  CAST(max(CASE WHEN m = 1 THEN k END) AS INTEGER) AS c1,
      |  CAST(max(CASE WHEN m = 2 THEN k END) AS INTEGER) AS c2,
      |  CAST(max(CASE WHEN m = 3 THEN k END) AS INTEGER) AS c3,
      |  CAST(max(CASE WHEN m = 4 THEN k END) AS INTEGER) AS c4,
      |  CAST(max(CASE WHEN m = 5 THEN k END) AS INTEGER) AS c5,
      |  CAST(max(CASE WHEN m = 6 THEN k END) AS INTEGER) AS c6,
      |  CAST(max(CASE WHEN m = 7 THEN k END) AS INTEGER) AS c7
      |FROM codes GROUP BY vec_id""".stripMargin

  def queries: Map[String, Q] = Map(
    "stream_pq_encode" -> Q(streamPqEncode _, streamPqEncodeSql),
    "stream_checkpoint_resume" ->
      Q(streamCheckpointResume _, streamCheckpointResumeSql),
    "stream_near_dedup" -> Q(streamNearDedup _, streamNearDedupSql),
    "stream_decontaminate" ->
      Q(streamDecontaminate _, streamDecontaminateSql),
    "stream_ivfsq8_encode" ->
      Q(streamIvfSq8Encode _, streamIvfSq8EncodeSql),
    "stream_binary_encode" ->
      Q(streamBinaryEncode _, streamBinaryEncodeSql),
    "stream_semantic_dedup" ->
      Q(streamSemanticDedup _, streamSemanticDedupSql),
    "stream_last_n_mean" -> Q(streamLastNMean _, streamLastNMeanSql),
    "stream_tdigest_window" -> Q(streamTdigestWindow _, None),
    "stream_cms" -> Q(streamCms _, streamCmsSql),
    "stream_kmv_window" -> Q(streamKmvWindow _, streamKmvWindowSql),
    "stream_scd2" -> Q(streamScd2 _, streamScd2Sql),
    "stream_postings" -> Q(streamPostings _, Retrieval.indexPostingsSql),
    "stream_transitions" -> Q(streamTransitions _, Extras.pathTransitionsSql),
    "stream_funnel" -> Q(streamFunnel _, Extras.funnelConversionSql),
    "stream_running_agg" -> Q(streamRunningAgg _, streamRunningAggSql),
    "stream_start_state" -> Q(streamStartState _, streamStartStateSql),
    "stream_tumbling" -> Q(streamTumbling _, streamTumblingSql),
    "stream_sliding" -> Q(streamSliding _, streamSlidingSql),
    "stream_ohlc" -> Q(streamOhlc _, Extras.resampleOhlcSql),
    "stream_session" -> Q(streamSession _, streamSessionSql),
    "stream_dedup_exact" -> Q(streamDedupExact _, streamDedupExactSql),
    "stream_join" -> Q(streamJoin _, streamJoinSql),
    "stream_asof_enrich" -> Q(streamAsofEnrich _, streamAsofEnrichSql),
    "stream_enrich_dim" -> Q(streamEnrichDim _, streamEnrichDimSql),
    "stream_zscore" -> Q(streamZscore _, Extras.tsAnomalyZscoreSql),
    "stream_attribution" -> Q(streamAttribution _, Extras.attributionLastTouchSql),
    "stream_attribution_window" ->
      Q(streamAttributionWindow _, streamAttributionWindowSql),
    "stream_drift" -> Q(streamDrift _, streamDriftSql)
  )
}
