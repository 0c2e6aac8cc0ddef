package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over relational edge lists — the authority
  * side of corpus curation (web-scale pretraining pipelines weight
  * documents by link authority of their source; cf. the PageRank
  * weighting applied to Common Crawl in public pipeline writeups) and
  * the second iterative-graph family next to label-propagation
  * connected components (`operators/Dedup.scala`).
  *
  * Everything here is FIXED-POINT integer arithmetic in micro-units:
  * floating-point PageRank sums in shuffle order and is not
  * reproducible bit-for-bit across engines (or even across runs);
  * long addition is exact and commutative, integer division is a
  * deterministic floor, so ranks are bit-identical between Spark and
  * the DuckDB oracle — the same policy `graft.Agg` applies to money
  * sums.
  */
object GraphOps {

  /** PageRank (damping 0.85, 5 fixed iterations) over the bipartite
    * customer↔supplier transaction graph: an edge (c, s, w) for every
    * customer c whose orders contain lineitems from supplier s, with
    * w = the lineitem count, walked in BOTH directions so the chain is
    * irreducible without a dangling-mass correction (every node has
    * out-edges by construction).
    *
    * Node encoding: custkey*2 / suppkey*2+1 keeps the two key spaces
    * disjoint in one long column. Ranks live in micro-units (1.0 =
    * 1,000,000); per-edge contributions floor((r*w)/out_w) BEFORE the
    * destination sum, and the damped update is 150000 + (85*sum) div
    * 100 — all long ops, mirrored exactly in the oracle.
    *
    * Scale shape: the edge list is built once (one orders⋈lineitem
    * shuffle, then grouped to distinct (src, dst) pairs — map-side
    * combine collapses repeat purchases). Each iteration is one join
    * of ranks to edges on src plus one groupBy dst — the Pregel
    * message-passing step: at cluster scale edges are hash-partitioned
    * by src ONCE and every iteration reuses that partitioning, so the
    * per-iteration shuffle ships only the compact (dst, contrib)
    * partial aggregates. Iteration count is fixed (5), not
    * convergence-tested: the output contract is deterministic rank
    * mass after 5 walks, which is what a weighting pipeline snapshots.
    */
  private[graft] def pagerank(orders: DataFrame, lineitem: DataFrame,
      iters: Int): DataFrame = {
    val half = orders
      .select(col("o_orderkey"), col("o_custkey"))
      .join(lineitem.select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy((col("o_custkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst"))
      .agg(count(lit(1)).as("w"))
    val edges = half.unionByName(
      half.select(col("dst").as("src"), col("src").as("dst"), col("w")))
    // Materialize the weighted edge list ONCE and truncate its lineage:
    // without this every iteration's join re-resolves (and on any
    // recompute re-executes) the whole orders⋈lineitem build, the
    // unrolled 5-iteration plan grows superlinearly in analysis cost,
    // and the bench pays it per rep (r9: 4.3 s / 5.4 GB heap on the
    // driver). localCheckpoint is the same lineage-cut Dedup's
    // label-propagation loop uses; at cluster scale this is the
    // hash-partitioned edge RDD every Pregel round reuses.
    val ew = edges.join(
      edges.groupBy(col("src")).agg(sum(col("w")).as("ow")), "src")
      .localCheckpoint()
    var rank = ew.select(col("src").as("node")).distinct()
      .select(col("node"), lit(1000000L).as("r"))
    for (_ <- 1 to iters) {
      // shuffle-hash, not sort-merge: the rank side is node-cardinality
      // (bounded, far smaller than the edge list) but mid-plan stats are
      // unknown so Catalyst would default to SMJ and pay a full edge-list
      // sort per iteration; hash-building on the rank partition streams
      // the edges unsorted — the Pregel message-join shape.
      rank = ew
        .join(rank.hint("shuffle_hash"), col("src") === col("node"))
        .groupBy(col("dst"))
        .agg(sum(expr("(r * w) div ow")).as("contrib"))
        .select(col("dst").as("node"),
          (lit(150000L) + expr("(85 * contrib) div 100")).as("r"))
        // per-iteration lineage cut (the powerIterate pattern, but
        // LAZY like Dedup's label loop): truncates the plan the
        // analyzer re-resolves per step without forcing an extra job
        // per iteration — the rank frame is node-cardinality, tiny
        // next to the edge list. Values unchanged.
        .localCheckpoint(false)
    }
    rank.select(
      when(col("node") % 2 === 0, lit("customer")).otherwise(lit("supplier"))
        .as("node_type"),
      when(col("node") % 2 === 0, col("node") / 2).otherwise((col("node") - 1) / 2)
        .cast("long").as("key"),
      col("r").as("rank_micro"))
  }

  private def graphPagerank(s: SparkSession, dir: String): DataFrame =
    pagerank(Tables.orders(s, dir), Tables.lineitem(s, dir), iters = 5)

  private val graphPagerankSql = {
    // five unrolled iterations: DuckDB forbids aggregates in the
    // recursive arm of a recursive CTE, and unrolling keeps each step
    // a plain GROUP BY — bit-identical to the Spark loop.
    val step = (i: Int) =>
      s"""r$i AS (
         |  SELECT dst AS node, 150000 + (85 * sum((r * w) // ow)) // 100 AS r
         |  FROM ew JOIN r${i - 1} ON ew.src = r${i - 1}.node
         |  GROUP BY dst)""".stripMargin
    s"""WITH half AS (
       |  SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst,
       |    count(*) AS w
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
       |  GROUP BY 1, 2),
       |edges AS (
       |  SELECT src, dst, w FROM half
       |  UNION ALL SELECT dst AS src, src AS dst, w FROM half),
       |ow AS (SELECT src, sum(w) AS ow FROM edges GROUP BY src),
       |ew AS (SELECT e.src, e.dst, e.w, o.ow FROM edges e JOIN ow o USING (src)),
       |r0 AS (
       |  SELECT DISTINCT src AS node, CAST(1000000 AS BIGINT) AS r FROM edges),
       |${(1 to 5).map(step).mkString(",\n")}
       |SELECT
       |  CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type,
       |  CASE WHEN node % 2 = 0 THEN node // 2 ELSE (node - 1) // 2 END AS key,
       |  r AS rank_micro
       |FROM r5""".stripMargin
  }

  def queries: Map[String, Q] = Map(
    "graph_pagerank" -> Q(graphPagerank _, graphPagerankSql)
  )
}
