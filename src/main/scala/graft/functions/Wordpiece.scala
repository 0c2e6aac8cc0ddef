package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Wordpiece / BPE-style subword tokenization (reference
  * `cpp/include/nvtext/wordpiece_tokenize.hpp:114`,
  * `byte_pair_encoding.hpp:129`): greedy longest-match-first against a
  * broadcast vocabulary, continuation pieces prefixed "##", unknown
  * characters emitted as "[UNK]".
  *
  * The vocab is a driver-built dimension broadcast once per job (the
  * same shape a real BERT vocab file takes); tokenization itself is a
  * per-row UDF — map-side only, no shuffle.
  */
object Wordpiece {

  /** Greedy wordpiece of one word against a vocab set. */
  def tokenizeWord(word: String, vocab: Set[String]): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    while (start < word.length) {
      var end = word.length
      var piece: String = null
      while (end > start && piece == null) {
        val cand0 = word.substring(start, end)
        val cand = if (start > 0) "##" + cand0 else cand0
        if (vocab.contains(cand)) piece = cand else end -= 1
      }
      if (piece == null) return Seq("[UNK]")
      out += piece
      start = end
    }
    out.toSeq
  }

  /** Build a subword vocab from the corpus: whole tokens above a
    * frequency floor plus all single characters (and their "##" forms).
    */
  def buildVocab(docs: DataFrame, minFreq: Long): Set[String] = {
    val frequent = docs
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("tok"))
      .count()
      .filter(col("count") >= minFreq)
      .collect()
      .map(_.getString(0))
    val chars = frequent.flatMap(_.toCharArray).distinct.map(_.toString)
    (frequent ++ chars ++ chars.map("##" + _)).toSet
  }

  /** documents → (doc_id, pieces array) using a broadcast vocab. */
  def tokenize(spark: SparkSession, docs: DataFrame, vocab: Set[String]): DataFrame = {
    val bc: Broadcast[Set[String]] = spark.sparkContext.broadcast(vocab)
    val wp = udf((text: String) =>
      if (text == null) Seq.empty[String]
      else text.split(" ").toSeq.flatMap(w => tokenizeWord(w, bc.value)))
    docs.select(col("doc_id"), wp(col("text")).as("pieces"))
  }
}
