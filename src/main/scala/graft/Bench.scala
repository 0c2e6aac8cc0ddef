package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — driver contract: one JSON line with per-query wall
  * seconds on SPARK_GRAFT_SF_DIR. Headline set = the NDS-H ports plus the
  * heavier LLM-pipeline operators (LSH dedup, cosine top-k).
  *
  * Timing forces full materialization through a noop datasource write
  * (a bare count() would let Catalyst prune the projections).
  */
object Bench {
  val headline: Seq[String] = Seq(
    "ndsh_q1", "ndsh_q5", "ndsh_q6", "ndsh_q9", "ndsh_q10",
    // round-5 NDS-H widening
    "ndsh_q3", "ndsh_q4", "ndsh_q12", "ndsh_q14", "ndsh_q18",
    "dedup_minhash_lsh", "sim_cosine_topk", "dedup_exact",
    "win_group_scan", "agg_basic_stats",
    // round-3 flagship additions
    "join_asof", "dedup_emb_cosine", "win_ewma_stream",
    // round-5: the capped n-gram verify stage and the (now fully
    // oracled) IVF probe — benched so regressions in the two paths
    // fixed this round stay visible
    "dedup_ngram_jaccard", "sim_ivf_topk",
    // round-7: the last five NDS-H ports (correlated-subquery family)
    "ndsh_q2", "ndsh_q11", "ndsh_q16", "ndsh_q20", "ndsh_q21",
    // round-7: the heavier new pipeline ops (packing is a sorted scan,
    // tfidf a two-shuffle rank, wordpiece a driver vocab + per-row UDF)
    "pack_sequences", "text_tfidf_topk", "text_wordpiece")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    // Two warmup passes (JVM/JIT/codegen-cache/file-listing — one pass
    // leaves the C2 compiler mid-flight on the heavier queries), then
    // per-query median of five measured runs taken back to back so each
    // query group runs on a warm JVM. An identical-code re-run of the
    // old min-of-2 harness swung ±50% per query — too noisy to detect a
    // real 1.5× regression; the median of five back-to-back runs is
    // robust to both one-sided GC outliers and bimodal scheduler noise.
    headline.foreach(run)
    headline.foreach(run)
    val reps = 5
    val results = headline.map { n =>
      val ts = Seq.fill(reps)(run(n))
      n -> (if (ts.exists(_ < 0)) -1.0 else ts.sorted.apply(reps / 2))
    }
    val qs = results
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
