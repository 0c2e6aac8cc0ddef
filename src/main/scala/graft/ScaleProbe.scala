package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe: replicates the documents corpus N× (disjoint doc_id
  * ranges, identical texts) and runs the full near-dup pipeline —
  * MinHash → banded LSH candidates → connected-component resolution →
  * corpus dedup — at each scale. Replication makes every document an
  * exact near-dup cluster of size N, which is the WORST load for LSH
  * (every band bucket holds all N replicas), so the probe stresses
  * bucket joins, pair scoring, and label propagation together.
  *
  * Output: one JSON line per factor with wall time and the dedup
  * invariant (clusters collapse back to ~the original corpus size).
  * Evidence for SCALING.md: near-linear wall-time growth + intact
  * invariant ⇒ no quadratic blow-up hiding in the pipeline.
  *
  * Usage: runMain graft.ScaleProbe [sfDir] [factors csv, default 1,4,8]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = args.lift(1).getOrElse("1,4,8").split(",").map(_.trim.toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val baseN = docs.count()

    factors.foreach { f =>
      val big = (0 until f)
        .map(i => docs.select((col("doc_id") + lit(i.toLong * 1000000000L)).as("doc_id"), col("text")))
        .reduce(_ union _)
      val t0 = System.nanoTime()
      val pairs = queries.LlmOps
        .lshCandidatePairs(big, maxBucket = 1000)
        .filter(col("est_jaccard") >= 0.75)
        .select(col("id_a"), col("id_b"))
      val deduped = operators.Dedup.dedupCorpus(big, pairs)
      val outN = deduped.count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(
        f"""{"probe":"lsh_dedup","factor":$f,"n_docs":${baseN * f},"out_docs":$outN,"secs":$secs%.2f}""")
    }
    spark.stop()
  }
}
