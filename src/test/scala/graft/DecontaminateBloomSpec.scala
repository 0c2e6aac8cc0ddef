package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bloom decontamination vs the exact broadcast-semi-join path: the
  * sketch's error must be ONE-SIDED — every document the exact path
  * flags is flagged with at-least-equal gram count (no false
  * negatives), and the false-positive overshoot stays within the
  * configured fpp's reach.
  */
class DecontaminateBloomSpec extends AnyFunSuite {
  import TestSpark._

  test("bloom flags are a superset of exact flags; FP overshoot bounded") {
    val exact = SparkEntry.queries("decontaminate_ngrams")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloom = SparkEntry.queries("decontaminate_bloom")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    assert(exact.nonEmpty, "fixture must contain contaminated docs")
    // no false negatives: every exactly-flagged doc appears with >= count
    exact.foreach { case (doc, n) =>
      assert(bloom.contains(doc), s"doc $doc lost by the bloom path")
      assert(bloom(doc) >= n,
        s"doc $doc: bloom count ${bloom(doc)} < exact $n")
    }
    // false positives exist only bloom-side and must stay rare: the
    // production filter is sized at fpp=1e-5 per gram, and a doc testing
    // k ≈ 150 grams is falsely flagged with prob 1-(1-1e-5)^k ≈ 1.5e-3 —
    // so expected bloom-only docs are ~0.15% of the clean population.
    // The cap of clean/10 is a ~60x cushion over that expectation,
    // loose enough to never flake yet far below any real fpp blowout
    val cleanDocs = SparkEntry.queries("chunk_documents")(spark, sf)
      .select("doc_id").distinct().count() - exact.size
    val fpDocs = (bloom.keySet -- exact.keySet).size
    assert(fpDocs <= math.max(1L, cleanDocs / 10),
      s"$fpDocs bloom-only docs out of $cleanDocs clean — fpp blown")
    // and the per-doc overshoot on true positives stays small
    val overshoot = exact.keys.map(d => bloom(d) - exact(d)).sum.toDouble /
      math.max(exact.values.sum, 1L)
    assert(overshoot <= 0.1, s"gram-count overshoot $overshoot > 10%")
  }
}
