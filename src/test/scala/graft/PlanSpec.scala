package graft

import org.apache.spark.sql.execution.FormattedMode
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression guards: pin the load-bearing plan
  * properties the 100 TB design depends on (pushdown, no cartesian
  * blow-ups, map-side ANN assignment, top-k short-circuit, partitioned
  * windows), so a refactor can't silently regress the shape. Plans are
  * inspected pre-AQE (the optimizer output, which is what scales).
  */
class PlanSpec extends AnyFunSuite {
  import TestSpark._

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf)
      .queryExecution.explainString(FormattedMode)

  test("ndsh_q1: shipdate filter and column pruning reach the parquet scan") {
    val p = plan("ndsh_q1")
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"),
      "shipdate predicate must be pushed to the scan")
    assert(!p.toLowerCase.contains("cartesianproduct"))
    // projection pruning: the scan must not read the whole row
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_partkey") && !readSchema.contains("l_suppkey"),
      s"scan reads pruned columns: $readSchema")
  }

  test("top_k compiles to TakeOrderedAndProject, not a global sort") {
    val p = plan("top_k")
    assert(p.contains("TakeOrderedAndProject"), "expected top-k short-circuit")
  }

  test("IVF cell assignment is map-side: no exchange between scan and argmax") {
    val emb = Tables.embeddings(spark, sf)
      .selectExpr("vec_id", "transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding")
    val cents = operators.Similarity.centroids(emb, 4)
    val p = operators.Similarity.assignCells(emb, cents)
      .queryExecution.explainString(FormattedMode)
    assert(!p.contains("Exchange"), s"assignCells must not shuffle:\n$p")
  }

  test("every windowed query partitions its windows (no global windows)") {
    for (q <- Seq("win_group_scan", "win_lead_lag", "win_rolling_rows",
        "win_sessionize", "win_ewma_stream")) {
      val p = plan(q)
      // a Window with an empty partition spec renders as
      // "windowspecdefinition(<order>...)" with no partition columns and
      // Spark logs the single-partition warning; assert the spec carries
      // a partition column instead
      val winLines = p.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
      winLines.foreach { l =>
        assert(l.contains("user_id") || l.contains("l_suppkey"),
          s"$q window not partitioned: $l")
      }
    }
  }

  test("round-7 NDS-H ports: dimensions broadcast, no cartesian blow-ups") {
    for (q <- Seq("ndsh_q2", "ndsh_q11", "ndsh_q16", "ndsh_q20", "ndsh_q21")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian product")
      assert(p.contains("BroadcastHashJoin"),
        s"$q should broadcast its dimension tables")
    }
  }

  test("LSH and embedding dedup plans contain no cartesian products") {
    for (q <- Seq("dedup_minhash_lsh", "dedup_minhash_lsh_portable",
        "dedup_emb_cosine", "dedup_ngram_jaccard",
        "join_range", "join_asof")) {
      assert(!plan(q).contains("CartesianProduct"), s"$q has a cartesian product")
    }
  }

  test("conv_zorder is a pure map-side projection: zero Exchange") {
    val p = plan("conv_zorder")
    assert(!p.contains("Exchange"),
      s"the Morton code must compute scan-side with no shuffle:\n$p")
    assert(p.contains("codegen id"),
      "the bit-interleave arithmetic must stay inside codegen")
  }

  test("PQ encode + ADC top-k: zero shuffle Exchange end to end") {
    val p = plan("sim_ivfpq_topk")
    // broadcast of the 1-row query is fine; a shuffle Exchange is not —
    // encode is a Project over the scan, scoring is map-side, the top-k
    // is TakeOrderedAndProject
    val shuffles = p.linesIterator
      .filter(l => l.matches("""\(\d+\) Exchange.*""")).toSeq
    assert(shuffles.isEmpty, s"PQ path must not shuffle: $shuffles\n$p")
    assert(p.contains("TakeOrderedAndProject"), "expected top-k short-circuit")
  }

  /** The r19 two-stage retrieve-and-refine ANN queries: stage 1 must
    * short-circuit to TakeOrderedAndProject over the persisted index
    * scan (never a global sort), and stage 2's rerank join must
    * broadcast the bounded candidate set — a SortMergeJoin there would
    * shuffle the whole raw corpus against 64 rows. Applies identically
    * to the binary (Hamming) and matryoshka (prefix-cosine) pipelines.
    */
  test("binary + matryoshka two-stage ANN: TakeOrdered stages, broadcast rerank") {
    for (q <- Seq("sim_binary_topk", "sim_matryoshka_topk")) {
      val p = plan(q)
      assert(p.contains("TakeOrderedAndProject"),
        s"$q: expected top-k short-circuit\n$p")
      assert(p.contains("BroadcastHashJoin"),
        s"$q: candidate set must broadcast into the rerank join\n$p")
      assert(!p.contains("SortMergeJoin"),
        s"$q: raw corpus must not sort-merge against 64 candidates\n$p")
      assert(!p.toLowerCase.contains("cartesianproduct"),
        s"$q: no corpus blow-up\n$p")
    }
  }

  test("mix_token_budget: threshold set broadcast, no sort-merge join") {
    val p = plan("mix_token_budget")
    // the over-budget source set is a handful of rows — both the
    // anti-join bypass and the window-side equi-join must broadcast it;
    // a SortMergeJoin here would shuffle the whole corpus twice
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"over-budget source set should broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"corpus must not sort-merge against a 20-row threshold set:\n$p")
    // the window partitions by source — never a global window
    p.linesIterator.filter(_.contains("windowspecdefinition")).foreach { l =>
      assert(l.contains("source"), s"window not partitioned by source: $l")
    }
  }

  test("merge_upsert anti-joins the snapshot against a broadcast delta") {
    val p = plan("merge_upsert")
    // the delta key set broadcasts, so the big base side streams
    // map-side — a SortMergeJoin here would sort the whole snapshot
    // just to subtract a sliver of keys
    assert(p.contains("BroadcastHashJoin"),
      s"delta keys should broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"snapshot must not sort-merge against the delta key set:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("incremental LSH dedup has no cartesian product and caps its windows") {
    val p = plan("dedup_incremental_lsh")
    assert(!p.contains("CartesianProduct"), "incremental dedup went cartesian")
    p.linesIterator.filter(_.contains("windowspecdefinition")).foreach { l =>
      assert(l.contains("band"), s"cap window not partitioned by band/bucket: $l")
    }
  }

  test("pca power iteration: linear lineage, bounded exchanges, no cartesian") {
    val p = plan("emb_pca_power")
    assert(!p.contains("CartesianProduct"), "pca went cartesian")
    // 5 iterations = 5 d-group hash aggregations; the linear-lineage
    // rebuild keeps the corpus-scan count at iters + 1, so the plan must
    // not balloon into the 2^iters shape (≈32+ scans) the first cut had
    val scans = p.linesIterator.count(_.matches("""\(\d+\) Scan parquet.*"""))
    assert(scans <= 8, s"pca plan re-scans the corpus $scans times")
  }

  test("kmv sketch: one corpus pass, bounded TopKAgg, no global sort") {
    val p = plan("sketch_kmv_distinct")
    assert(!p.contains("CartesianProduct"))
    // the k-min sketch and the exact count ride ONE aggregate over the
    // distinct hashes (ObjectHashAggregate carries the TopKAgg buffer);
    // a Sort node would mean the k-smallest regressed to a global sort
    assert(p.contains("ObjectHashAggregate"),
      s"TopKAgg aggregate missing:\n$p")
    assert(!p.linesIterator.exists(_.matches("""\(\d+\) Sort.*""")),
      s"kmv plan must not global-sort:\n$p")
    // exactly one scan: the count witness must not re-run the hash pass
    val scans = p.linesIterator.count(_.matches("""\(\d+\) Scan parquet.*"""))
    assert(scans == 1, s"kmv re-scans the corpus $scans times")
  }

  test("corpus_shard_shuffle shuffles exactly once, on the shard key") {
    val p = plan("corpus_shard_shuffle")
    // one hashpartitioning Exchange feeding the rank window — the hash
    // and shard assignment themselves are map-side
    val exchangeNodes = p.linesIterator
      .filter(l => l.matches("""\(\d+\) Exchange.*""")).toSeq
    assert(exchangeNodes.length == 1,
      s"expected exactly one Exchange, got $exchangeNodes:\n$p")
    val exchangeArgs = p.linesIterator
      .filter(l => l.contains("Arguments: hashpartitioning")).toSeq
    assert(exchangeArgs.length == 1 && exchangeArgs.head.contains("shard"),
      s"the Exchange must hash-partition by shard: $exchangeArgs")
  }

  test("dsir_importance: the weight model rides a broadcast, never a sort-merge") {
    val p = plan("dsir_importance")
    assert(p.contains("BroadcastHashJoin"),
      "the 1024-row weight table must broadcast onto the gram stream")
    assert(!p.contains("SortMergeJoin"),
      s"scoring must not shuffle the gram stream for a join:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("sketch_cms_topk: counter cells partial-aggregate map-side") {
    val p = plan("sketch_cms_topk")
    // the d×w sketch state must collapse before the exchange — a
    // final-only aggregate would ship every token occurrence
    val hashAggs = p.linesIterator
      .filter(_.matches("""\(\d+\) HashAggregate.*""")).size
    assert(hashAggs >= 2, s"expected partial+final HashAggregate pairs:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("mix_temperature: one lang-collapsed aggregate, totals broadcast") {
    val p = plan("mix_temperature")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"per-lang report must not widen into a real join:\n$p")
  }

  test("scd2_history: map-side WindowGroupLimit, exactly two exchanges") {
    val p = plan("scd2_history")
    // the per-day dedup must prune to top-1 BEFORE its exchange
    assert(p.contains("WindowGroupLimit"),
      s"row_number()=1 must compile to WindowGroupLimit:\n$p")
    // count the detail entries ("(n) Exchange"), not the tree echo
    val exchanges = p.linesIterator.count(l =>
      l.matches("""\(\d+\) Exchange.*"""))
    assert(exchanges == 2,
      s"expected 2 shuffles (key-day dedup + key intervals), got $exchanges")
    assert(!p.contains("CartesianProduct"))
  }

  test("ts_anomaly_zscore: one window exchange feeds a partial aggregate") {
    val p = plan("ts_anomaly_zscore")
    val exchanges = p.linesIterator.count(l =>
      l.matches("""\(\d+\) Exchange.*"""))
    assert(exchanges == 2,
      s"expected user window shuffle + final agg shuffle, got $exchanges")
    assert(p.contains("partial_count"),
      "event_type collapse must partial-aggregate map-side")
  }

  test("join_fuzzy_ngram: blocking buckets join by broadcast hash, no SMJ") {
    val p = plan("join_fuzzy_ngram")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      s"bounded blocking frames must hash-join:\n$p")
  }
}
