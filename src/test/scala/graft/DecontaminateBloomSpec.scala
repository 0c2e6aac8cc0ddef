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

  test("sketch build restores the session bloom ceilings (r16)") {
    // The build raises spark.sql.optimizer.runtime.bloomFilter ceilings
    // for its own aggregate only; a later query in the same session must
    // see EXACTLY the tuning it had before — including a user-raised
    // ceiling, which must never be lowered to the defaults. Run against
    // a staged copy of the docs table so the DimCache key is fresh and
    // the build genuinely executes inside this test.
    val itemsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val bitsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    val origItems = spark.conf.get(itemsKey)
    val origBits = spark.conf.get(bitsKey)
    val stage = java.nio.file.Files
      .createTempDirectory("graft-bloomconf").toString
    try {
      spark.read.parquet(s"$sf/documents.parquet")
        .write.mode("overwrite").parquet(s"$stage/documents.parquet")
      // sentinel "user-raised" ceilings above the 4M/8MB defaults
      spark.conf.set(itemsKey, "5000001")
      spark.conf.set(bitsKey, "67108865")
      SparkEntry.queries("decontaminate_bloom")(spark, stage).collect()
      assert(spark.conf.get(itemsKey) == "5000001",
        s"maxNumItems not restored: ${spark.conf.get(itemsKey)}")
      assert(spark.conf.get(bitsKey) == "67108865",
        s"maxNumBits not restored: ${spark.conf.get(bitsKey)}")
    } finally {
      spark.conf.set(itemsKey, origItems)
      spark.conf.set(bitsKey, origBits)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(stage))
    }
  }
}
