package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the round-10 curation operators that the oracle gate's
  * value-equality can't express: the CMS one-sided error guarantee, DSIR
  * target-selectivity, temperature-flattening monotonicity, and the CDC
  * edit-stability property (the reason content-defined beats fixed-width
  * chunking).
  */
class CurationSpec extends AnyFunSuite {
  import TestSpark._

  test("CMS estimate is never below the exact count (one-sided error)") {
    val rows = SparkEntry.queries("sketch_cms_topk")(spark, sf).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val (n, est) = (r.getAs[Long]("n_exact"), r.getAs[Long]("cms_est"))
      assert(est >= n, s"CMS underestimated ${r.getAs[String]("tok")}: $est < $n")
    }
  }

  test("DSIR top-25 is dominated by the target (en) domain") {
    val rows = SparkEntry.queries("dsir_importance")(spark, sf).collect()
    assert(rows.length == 25)
    val en = rows.count(_.getAs[String]("lang") == "en")
    assert(en * 2 > rows.length,
      s"only $en/25 top-importance docs are target-domain")
    // scores arrive sorted by the declared (avg desc, doc_id) order
    val avgs = rows.map(_.getAs[Long]("avg_w_micro")).toSeq
    assert(avgs == avgs.sorted.reverse)
  }

  test("temperature sampling flattens the language mixture") {
    val rows = SparkEntry.queries("mix_temperature")(spark, sf).collect()
    val byShare = rows.sortBy(_.getAs[Long]("share_ppm"))
    val (minL, maxL) = (byShare.head, byShare.last)
    // sqrt-temperature shrinks the head and boosts the tail
    assert(maxL.getAs[Long]("target_share_ppm") < maxL.getAs[Long]("share_ppm"))
    assert(minL.getAs[Long]("target_share_ppm") > minL.getAs[Long]("share_ppm"))
    assert(minL.getAs[Long]("factor_micro") > 1000000L)
    assert(maxL.getAs[Long]("factor_micro") < 1000000L)
    // floor-division mass loss is bounded by the number of languages
    val mass = rows.map(_.getAs[Long]("target_share_ppm")).sum
    assert(mass > 1000000L - rows.length && mass <= 1000000L)
  }

  test("CDC chunking is edit-stable: a prefix insertion only disturbs the first chunk run") {
    import spark.implicits._
    val base = Tables.documents(spark, sf)
      .filter(col("doc_id") === 7).select(col("text")).head().getString(0)
    val docs = Seq((1L, base), (2L, "inserted " + base))
      .toDF("doc_id", "text")
    val fps = queries.Curation.chunkFingerprints(docs)
      .select(col("doc_id"), col("chunk_id"), col("fp")).collect()
    val a = fps.filter(_.getLong(0) == 1L).sortBy(_.getLong(1)).map(_.getLong(2))
    val b = fps.filter(_.getLong(0) == 2L).sortBy(_.getLong(1)).map(_.getLong(2))
    // every chunk of the original after its first boundary must reappear
    // verbatim in the edited doc: the insertion cannot ripple past the
    // first content-defined boundary
    assert(a.length >= 2, "fixture doc too short to carry the property")
    val shared = a.drop(1).toSet.intersect(b.toSet)
    assert(shared == a.drop(1).toSet,
      s"prefix insertion rippled past the first boundary: " +
        s"${a.drop(1).toSet.size - shared.size} downstream chunks changed")
  }
}
