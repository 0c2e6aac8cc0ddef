package graft.queries

import graft.{Q, Tables}
import graft.functions.GraftFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Queries driving the custom Catalyst expressions (SURVEY §2.8 gap
  * list: swapcase case.hpp:83, is_title capitalize.hpp:123, xxhash_32
  * hashing.hpp:183, rsplit split.hpp:84, porter_stemmer_measure
  * stemmer.hpp:80). No portable SQL oracle — ScalaTest pins goldens.
  */
object CustomExprs {

  private def customStrings(s: SparkSession, dir: String): DataFrame =
    Tables
      .part(s, dir)
      .select(
        col("p_partkey"),
        swapcase(col("p_name")).as("swapped"),
        is_title(initcap(col("p_name"))).as("title_after_initcap"),
        is_title(col("p_name")).as("title_raw"),
        xxhash32(col("p_name")).as("xxh32"),
        graft.ArrCanon.joined(rsplit(col("p_name"), lit(" "), 1)).as("rsplit_1"),
        porter_measure(element_at(split(col("p_name"), " "), 1)).as("porter_m"),
        graft.ArrCanon.joined(murmur3_128(col("p_name"))).as("murmur128"))

  private def ewmaPerUser(s: SparkSession, dir: String): DataFrame = {
    val e = graft.agg.Ewma(0.2)
    Tables
      .events(s, dir)
      .groupBy(col("user_id"))
      .agg(e(unix_micros(col("ts")), col("value")).as("ewma_value"))
  }

  /** DuckDB twin of the buffered EWMA aggregator: per user, the ordered
    * value list folded through the identical adjust=true recurrence in
    * the identical left-to-right IEEE op order (the same proof of
    * exactness as `win_ewma_stream`, whose twin this reuses). The µs
    * order key is tie-free in the testdata at every SF (checked), and
    * EwmaAgg's finish-time sort makes the result independent of
    * partitioning, so the fold order is total in both engines.
    */
  private val ewmaPerUserSql =
    """SELECT user_id,
      |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), vals),
      |    (a, x) -> x + (CAST(1.0 AS DOUBLE) - CAST(0.2 AS DOUBLE)) * a) /
      |  list_reduce(list_prepend(CAST(0.0 AS DOUBLE), vals),
      |    (a, x) -> CAST(1.0 AS DOUBLE) + (CAST(1.0 AS DOUBLE) - CAST(0.2 AS DOUBLE)) * a)
      |  AS ewma_value
      |FROM (
      |  SELECT user_id, list(value ORDER BY epoch_us(ts), event_id) AS vals
      |  FROM events GROUP BY user_id)""".stripMargin

  /** Per-row EWMA via the streaming sorted-partition pass
    * ([[graft.agg.Ewma.smoothedPerRow]], O(1) state per group — the
    * unbounded-series scale path for the EWMA aggregation). Oracle-exact:
    * the DuckDB twin folds each row's value-prefix list through the SAME
    * adjust=true recurrence (num = x + (1-α)·num; den = 1 + (1-α)·den)
    * in the same left-to-right order, so every IEEE operation matches
    * bit-for-bit — no rounding needed.
    */
  private def winEwmaStream(s: SparkSession, dir: String): DataFrame = {
    val base = Tables
      .events(s, dir)
      .select(col("user_id"), col("event_id"),
        expr("unix_micros(ts)").as("us"), col("value"))
    graft.agg.Ewma
      .smoothedPerRow(base, "user_id", Seq("us", "event_id"), "value", 0.2)
      .select(col("user_id"), col("event_id"), col("ewma"))
  }

  private val winEwmaStreamSql =
    """SELECT user_id, event_id,
      |  CASE WHEN value IS NULL THEN NULL ELSE
      |    list_reduce(pfx, (a, x) -> x + (CAST(1.0 AS DOUBLE) - CAST(0.2 AS DOUBLE)) * a) /
      |    list_reduce(list_transform(pfx, x -> CAST(1.0 AS DOUBLE)),
      |                (a, x) -> CAST(1.0 AS DOUBLE) + (CAST(1.0 AS DOUBLE) - CAST(0.2 AS DOUBLE)) * a)
      |  END AS ewma
      |FROM (
      |  SELECT user_id, event_id, value,
      |    list(value) FILTER (value IS NOT NULL)
      |      OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pfx
      |  FROM events)""".stripMargin

  /** wordpiece subword tokenization (wordpiece_tokenize.hpp:114) with a
    * corpus-derived broadcast vocab; rows-only (vocab is data-derived).
    */
  private def wordpieceTokens(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val vocab = graft.functions.Wordpiece.buildVocab(docs, minFreq = 50)
    graft.functions.Wordpiece
      .tokenize(s, docs, vocab)
      .select(col("doc_id"), size(col("pieces")).as("n_pieces"),
        graft.ArrCanon.joined(slice(col("pieces"), 1, 5)).as("head_pieces"))
  }

  /** merge-ranks BPE (byte_pair_encoding.hpp:129): corpus-learned merge
    * table (driver-side classic BPE training over the bounded
    * frequent-word stats), broadcast ranks, map-side iterative
    * lowest-rank merging per word — a genuinely different algorithm from
    * greedy wordpiece above (goldens in WordpieceSpec distinguish the
    * two on the same input). Rows-only (merge table is data-derived).
    */
  private def bpeTokens(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val merges = graft.functions.Bpe.learnMerges(docs, nMerges = 200, minFreq = 50)
    graft.functions.Bpe
      .tokenize(s, docs, merges)
      .select(col("doc_id"), size(col("pieces")).as("n_pieces"),
        graft.ArrCanon.joined(slice(col("pieces"), 1, 5)).as("head_pieces"))
  }

  /** percentile_approx — the engine's t-digest stand-in (TDIGEST Kind,
    * aggregation.hpp:121; Spark's GK sketch, tolerance documented).
    */
  private def percentileApprox(s: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000))
          .as("approx_median_price"),
        percentile_approx(col("l_extendedprice"), lit(0.99), lit(1000))
          .as("approx_p99_price"))

  def queries: Map[String, Q] = Map(
    "custom_string_exprs" -> Q(customStrings _, None),
    "agg_ewma" -> Q(ewmaPerUser _, ewmaPerUserSql),
    "win_ewma_stream" -> Q(winEwmaStream _, winEwmaStreamSql),
    "text_wordpiece" -> Q(wordpieceTokens _, None),
    "text_bpe" -> Q(bpeTokens _, None),
    "agg_percentile_approx" -> Q(percentileApprox _, None)
  )
}
