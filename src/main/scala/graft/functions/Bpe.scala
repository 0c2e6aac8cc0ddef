package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair encoding with merge ranks (reference
  * `cpp/include/nvtext/byte_pair_encoding.hpp:129`, `load_merge_pairs`):
  * a word is split into single characters, then the adjacent pair with
  * the LOWEST merge rank is merged, repeatedly, until no adjacent pair
  * appears in the merge table. This is a genuinely different algorithm
  * from greedy longest-match wordpiece ([[Wordpiece.tokenizeWord]]):
  * wordpiece consumes the longest vocab prefix outright, while BPE
  * replays the learned merge history — "hug" with merges [(h,u),(u,g)]
  * becomes [hu, g] even when "hug" itself is in a wordpiece vocab.
  *
  * Shape mirrors the wordpiece path: the merge table is a bounded
  * dimension learned driver-side from frequent-word statistics (one
  * distributed word-count aggregation feeds it), broadcast once, and
  * tokenization is a per-row map-side UDF — no shuffle.
  */
object Bpe {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Hard cap on the driver-collected frequent-word table the trainer
    * iterates over — the same bounded-dimension contract as
    * [[Wordpiece.maxVocab]]: minFreq bounds the table only as corpus
    * diversity allows, so at 100 TB the cap is what keeps the collect
    * driver-safe. Top entries by (count desc, word) — deterministic.
    */
  val maxWords: Int = 1 << 17

  /** One word split into code points (not UTF-16 units — a surrogate
    * pair is ONE initial symbol, matching code-point-indexing engines).
    */
  private def cpSplit(word: String): Vector[String] =
    word.codePoints().toArray.map(cp => new String(Character.toChars(cp))).toVector

  /** Tokenize one word by iterative lowest-rank merging. */
  def bpeWord(word: String, ranks: Map[(String, String), Int]): Seq[String] = {
    if (word.isEmpty) return Seq.empty
    var pieces: Vector[String] = cpSplit(word)
    var done = false
    while (!done && pieces.length > 1) {
      var best = -1
      var bestRank = Int.MaxValue
      var i = 0
      while (i < pieces.length - 1) {
        val r = ranks.getOrElse((pieces(i), pieces(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = i }
        i += 1
      }
      if (best < 0) done = true
      else pieces = pieces.patch(best, Seq(pieces(best) + pieces(best + 1)), 2)
    }
    pieces
  }

  /** Learn a merge table from the corpus: classic BPE training (count
    * adjacent symbol pairs weighted by word frequency, merge the most
    * frequent, repeat) over the bounded frequent-word table. The word
    * counts come from one distributed aggregation; the training loop
    * itself runs driver-side over that bounded dimension — the same
    * collect exemption as the wordpiece vocab build. Ties break on
    * (count desc, pair lexicographic) so the table is deterministic.
    */
  def learnMerges(docs: DataFrame, nMerges: Int, minFreq: Long): Seq[(String, String)] =
    learnMergesWeighted(docs, nMerges, minFreq).map(_._1)

  /** [[learnMerges]] with each chosen pair's frequency-weighted adjacency
    * count AT THE MOMENT it was picked — the trainer-LOOP oracle surface:
    * `text_bpe_trainer_steps` replays steps 1..k as chained SQL CTEs
    * (pair-stats argmax → left-to-right non-overlapping merge →
    * re-stats) and must reproduce these exact (pair, weight) rows.
    */
  def learnMergesWeighted(
      docs: DataFrame,
      nMerges: Int,
      minFreq: Long): Seq[((String, String), Long)] = {
    val counted = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w"))
      .count()
      .filter(col("count") >= minFreq)
      .orderBy(col("count").desc, col("w"))
      .limit(maxWords + 1)
      .collect()
    if (counted.length > maxWords)
      log.warn(
        s"BPE frequent-word table capped at $maxWords entries " +
          s"(minFreq=$minFreq admitted more); dropping the tail")
    var words: Array[(Vector[String], Long)] = counted
      .take(maxWords)
      .map(r => cpSplit(r.getString(0)) -> r.getLong(1))
    val merges =
      scala.collection.mutable.ArrayBuffer.empty[((String, String), Long)]
    var step = 0
    while (step < nMerges) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- words; i <- 0 until syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        pairCounts(p) = pairCounts.getOrElse(p, 0L) + c
      }
      if (pairCounts.isEmpty) step = nMerges
      else {
        val best = pairCounts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best -> pairCounts(best)
        words = words.map { case (syms, c) => mergeOnce(syms, best) -> c }
        step += 1
      }
    }
    merges.toSeq
  }

  /** [[learnMerges]] computed once per (dataset dir, params) — see
    * [[graft.DimCache]]; repeated query-builder invocations reuse the
    * trained table instead of re-running the corpus aggregation and the
    * 200-step driver loop.
    */
  def mergesFor(
      dir: String,
      docs: => DataFrame,
      nMerges: Int,
      minFreq: Long): Seq[(String, String)] =
    graft.DimCache.cached(s"bpe-merges:$dir:$nMerges:$minFreq")(
      learnMerges(docs, nMerges, minFreq))

  private def mergeOnce(syms: Vector[String], p: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == p._1 && syms(i + 1) == p._2) {
        out += syms(i) + syms(i + 1)
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.result()
  }

  /** documents → (doc_id, pieces array) under a broadcast merge table.
    *
    * The merge-table broadcast is memoized per (JVM, merges) via
    * DimCache (r20): a trained merge table is a fixed model artifact,
    * and re-broadcasting it on every DataFrame construction made each
    * bench rep pay broadcast setup + a dead broadcast for the cleaner
    * to chase — pure per-call overhead on an otherwise map-only scan.
    */
  def tokenize(
      spark: SparkSession,
      docs: DataFrame,
      merges: Seq[(String, String)]): DataFrame = {
    // keyed on the applicationId so a broadcast never outlives its
    // SparkContext (tests stop/start sessions within one JVM), and on a
    // CONTENT digest of the merge sequence (r21, ADVICE fix): the r20
    // key used merges.hashCode — 32 bits, so two different trained
    // tables colliding would silently reuse the wrong broadcast and
    // mistokenize with no error. SHA-256 over the escaped pair list
    // makes key equality imply content equality.
    val digest = {
      val md = java.security.MessageDigest.getInstance("SHA-256")
      merges.foreach { case (a, b) =>
        md.update(a.getBytes("UTF-8")); md.update(0.toByte)
        md.update(b.getBytes("UTF-8")); md.update(1.toByte)
      }
      md.digest().map("%02x".format(_)).mkString
    }
    val bc: Broadcast[Map[(String, String), Int]] =
      graft.DimCache.cached(
        s"bpe-ranks-bcast:${spark.sparkContext.applicationId}:$digest") {
        spark.sparkContext.broadcast(merges.zipWithIndex.toMap)
      }
    val bpe = udf((text: String) =>
      if (text == null) Seq.empty[String]
      else text.split(" ").toSeq.filter(_.nonEmpty).flatMap(w => bpeWord(w, bc.value)))
    docs.select(col("doc_id"), bpe(col("text")).as("pieces"))
  }
}
