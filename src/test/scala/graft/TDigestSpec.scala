package graft

import graft.agg.{TDigest, TDigestAgg}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Properties of the t-digest sketch that the oracle gate's one-sided
  * contract (`agg_tdigest_vs_exact`) can't express directly: rank
  * accuracy at the tails, state boundedness, merge/repartition
  * stability, and the local compress/quantile machinery.
  */
class TDigestSpec extends AnyFunSuite {
  import TestSpark._

  private def rankOf(sorted: IndexedSeq[Double], x: Double): Double = {
    var lo = 0; var hi = sorted.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (sorted(mid) <= x) lo = mid + 1 else hi = mid
    }
    lo.toDouble / sorted.length
  }

  test("compress respects the k1 size bound and conserves mass and order") {
    val pts = (1 to 10000).map(i => ((i * 48271L) % 9973).toDouble)
    val cent = TDigest.compress(pts.map((_, 1.0)), delta = 100)
    val w = cent.map(_._2).sum
    assert(math.abs(w - 10000.0) < 1e-6, "total weight must be conserved")
    assert(cent.map(_._1) == cent.map(_._1).sorted, "centroids sorted")
    assert(cent.length <= 2 * 100,
      s"state not O(delta): ${cent.length} centroids")
    // tails stay sharp: the extreme centroids carry little weight
    assert(cent.head._2 <= 16 && cent.last._2 <= 16,
      s"tail centroids too heavy: ${cent.head._2} / ${cent.last._2}")
  }

  test("local quantiles hit exact ranks within the t-digest envelope") {
    val pts = (1 to 50000).map(i => ((i * 1103515245L + 12345) % 1000003).toDouble)
    val sorted = pts.sorted
    val cent = TDigest.compress(pts.map((_, 1.0)), delta = 100).toIndexedSeq
    for (q <- Seq(0.01, 0.1, 0.5, 0.9, 0.99, 0.999)) {
      val est = TDigest.quantile(cent, q)
      val err = math.abs(rankOf(sorted, est) - q)
      val envelope = math.max(0.005, 8.0 * q * (1 - q) / 100)
      assert(err <= envelope, f"q=$q rank err $err%.4f > $envelope%.4f")
    }
  }

  test("distributed digest is partition-stable within the envelope") {
    import spark.implicits._
    val td = udaf(new TDigestAgg(100, Seq(0.1, 0.5, 0.99)))
    val data = (1 to 40000).map(i => ((i * 48271L) % 999983).toDouble)
    val sorted = data.sorted.toIndexedSeq
    val ests = Seq(2, 32).map { parts =>
      data.toDF("x").repartition(parts)
        .agg(td(col("x")).as("qs"))
        .head().getSeq[Double](0)
    }
    for (e <- ests; (q, est) <- Seq(0.1, 0.5, 0.99).zip(e)) {
      val err = math.abs(rankOf(sorted, est) - q)
      assert(err <= 0.02, f"parts-variant rank err $err%.4f at q=$q")
    }
    // the two partitionings agree with each other within the envelope too
    Seq(0, 1, 2).foreach { i =>
      val qs = Seq(0.1, 0.5, 0.99)
      val r0 = rankOf(sorted, ests(0)(i))
      val r1 = rankOf(sorted, ests(1)(i))
      assert(math.abs(r0 - r1) <= 0.02, s"instability at q=${qs(i)}")
    }
  }

  test("merge of disjoint halves covers the union's range") {
    val lo = (1 to 5000).map(_.toDouble)
    val hi = (5001 to 10000).map(_.toDouble)
    val merged = TDigest.compress(
      (TDigest.compress(lo.map((_, 1.0)), 100) ++
        TDigest.compress(hi.map((_, 1.0)), 100)).toSeq, 100).toIndexedSeq
    val med = TDigest.quantile(merged, 0.5)
    assert(med > 4500 && med < 5500, s"merged median off: $med")
    assert(TDigest.quantile(merged, 0.0) >= 1.0)
    assert(TDigest.quantile(merged, 1.0) <= 10000.0)
  }

  test("GK accuracy twin: every percentile_approx flag is true (r16)") {
    // The agg_gk_vs_exact gate row's local face: the rank interval of
    // each percentile_approx estimate must touch q ± 1/accuracy.
    import TestSpark._
    val rows = SparkEntry.queries("agg_gk_vs_exact")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("p50_ok"),
        s"p50 rank error blown for ${r.getString(0)}")
      assert(r.getAs[Boolean]("p99_ok"),
        s"p99 rank error blown for ${r.getString(0)}")
    }
  }
}
