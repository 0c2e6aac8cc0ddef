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
    // false positives exist only bloom-side and must stay rare: with
    // fpp=0.01 the expected extra flagged grams are ~1% of tested grams,
    // so allow docs flagged ONLY by bloom but cap them well below the
    // clean-doc population (a 10x-fpp cushion keeps this non-flaky)
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
