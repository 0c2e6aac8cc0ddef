package graft.pipeline

import graft.operators.Dedup
import graft.queries.LlmOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** End-to-end LLM training-data pipeline — the north-star composition of
  * the engine's operators, every stage partition-parallel:
  *
  *   raw documents
  *     → quality filter (length / stopword / short-token ratios)
  *     → language filter (stopword-profile langid)
  *     → exact dedup (content digest, keep min doc_id)
  *     → near-dup dedup (shingle MinHash → LSH bands → candidate pairs
  *       → connected-component keepers)
  *     → tokenization (whitespace + wordpiece subwords)
  *     → stats
  *
  * At 100 TB each arrow is a map-side pass or a shuffle on compact keys
  * (digest, band bucket, pair ids) — no stage materializes anything
  * driver-side except the subword vocab (an explicit dimension).
  */
object TrainingDataPipeline {

  case class Config(
      minTokens: Int = 10,
      maxShortTokenRatio: Double = 0.4,
      lang: String = "en",
      lshJaccardThreshold: Double = 0.75,
      wordpieceMinFreq: Long = 50)

  /** Stage 1-2: quality + language gate. */
  def qualityFilter(docs: DataFrame, cfg: Config): DataFrame =
    docs
      .withColumn("__toks", split(col("text"), " "))
      .withColumn("__n", size(col("__toks")))
      .withColumn("__short",
        expr("size(filter(__toks, t -> length(t) <= 2))"))
      .filter(col("__n") >= cfg.minTokens &&
        col("__short") / col("__n") <= cfg.maxShortTokenRatio)
      .drop("__toks", "__n", "__short")

  /** Stage 3: exact dedup by content digest, keeping the smallest id. */
  def exactDedup(docs: DataFrame): DataFrame = {
    val keepers = docs
      .groupBy(md5(col("text").cast(BinaryType)).as("__sig"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    docs.join(keepers, "doc_id")
  }

  /** Stage 4: near-dup dedup via MinHash-LSH candidates + component
    * resolution (keeps one doc per near-dup cluster).
    */
  def nearDedup(spark: SparkSession, docs: DataFrame, cfg: Config): DataFrame = {
    val sigs = LlmOps
      .withShingles(docs)
      .select(col("doc_id"), graft.functions.MinHash64.minhash64(col("tk"), 16).as("mh"))
    val banded = sigs.select(
      col("doc_id"),
      col("mh"),
      posexplode(expr(
        "transform(sequence(0, 3), b -> xxhash64(mh[b*4], mh[b*4+1], mh[b*4+2], mh[b*4+3]))"))
        .as(Seq("band", "bucket")))
    val l = banded.select(col("band"), col("bucket"), col("doc_id").as("id_a"), col("mh").as("mh_a"))
    val r = banded.select(col("band"), col("bucket"), col("doc_id").as("id_b"), col("mh").as("mh_b"))
    val pairs = l
      .join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        expr("size(filter(zip_with(mh_a, mh_b, (x, y) -> x = y), v -> v)) / CAST(16 AS DOUBLE)")
          .as("est_jaccard"))
      .distinct()
      .filter(col("est_jaccard") >= cfg.lshJaccardThreshold)
    Dedup.dedupCorpus(docs, pairs.select(col("id_a"), col("id_b")))
  }

  /** Stage 5: tokenize into whitespace tokens + wordpiece subwords. */
  def tokenizeStage(spark: SparkSession, docs: DataFrame, cfg: Config): DataFrame = {
    val vocab = graft.functions.Wordpiece.buildVocab(docs, cfg.wordpieceMinFreq)
    graft.functions.Wordpiece
      .tokenize(spark, docs, vocab)
      .join(docs, "doc_id")
      .withColumn("n_tokens", size(split(col("text"), " ")))
      .withColumn("n_pieces", size(col("pieces")))
  }

  /** Full pipeline; returns (clean corpus with tokens, per-stage counts). */
  def run(spark: SparkSession, docs: DataFrame,
      cfg: Config = Config()): (DataFrame, Map[String, Long]) = {
    val q = qualityFilter(docs, cfg).cache()
    val lang = q.filter(col("lang") === cfg.lang).cache()
    val exact = exactDedup(lang).cache()
    val near = nearDedup(spark, exact, cfg).cache()
    val tokenized = tokenizeStage(spark, near, cfg)
    val counts = Map(
      "input" -> docs.count(),
      "after_quality" -> q.count(),
      "after_lang" -> lang.count(),
      "after_exact_dedup" -> exact.count(),
      "after_near_dedup" -> near.count())
    (tokenized, counts)
  }
}
