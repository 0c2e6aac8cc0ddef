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
        rsplit(col("p_name"), lit(" "), 1).as("rsplit_1"),
        porter_measure(element_at(split(col("p_name"), " "), 1)).as("porter_m"),
        murmur3_128(col("p_name")).as("murmur128"))

  private def ewmaPerUser(s: SparkSession, dir: String): DataFrame = {
    val e = graft.agg.Ewma(0.2)
    Tables
      .events(s, dir)
      .groupBy(col("user_id"))
      .agg(e(unix_micros(col("ts")), col("value")).as("ewma_value"))
  }

  def queries: Map[String, Q] = Map(
    "custom_string_exprs" -> Q(customStrings _, None),
    "agg_ewma" -> Q(ewmaPerUser _, None)
  )
}
