package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** UDF / UDAF / UDTF surface — SURVEY §2.8 UDF table (reference: numba
  * masked scalar UDFs `python/cudf/cudf/core/udf/`, `Series.apply`
  * series.py:2528, `apply_rows`/`apply_chunks` dataframe.py:4999,
  * groupby apply `core/groupby/`).
  *
  * cudf's masked UDFs exist because GPU kernels need explicit validity
  * plumbing; on the JVM, `Option`-typed Scala UDFs give the same
  * null-aware semantics natively. `apply_rows` (row-batch kernels) maps
  * to `mapPartitions`; groupby-apply maps to typed `mapGroups`.
  */
object UdfSurface {

  /** Masked scalar UDF: null-aware lambda with a sentinel for missing
    * inputs — the `cudf.NA`-handling pattern of masked_typing.py.
    */
  private def maskedUdf(s: SparkSession, dir: String): DataFrame = {
    val maskedRatio = udf((price: Option[Double], qty: Option[Double]) =>
      (price, qty) match {
        case (Some(p), Some(q)) if q != 0 => p / q
        case _ => -1.0
      })
    Tables
      .lineitem(s, dir)
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        when(col("l_quantity") > 45, null).otherwise(col("l_quantity")).as("qty_masked"))
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        maskedRatio(lit(100d), col("qty_masked")).as("ratio"))
  }

  private val maskedUdfSql =
    """SELECT l_orderkey, l_linenumber,
      |  CASE WHEN qty_masked IS NULL OR qty_masked = 0 THEN -1.0
      |       ELSE 100.0 / qty_masked END AS ratio
      |FROM (SELECT l_orderkey, l_linenumber,
      |        CASE WHEN l_quantity > 45 THEN NULL ELSE l_quantity END
      |          AS qty_masked
      |      FROM lineitem)""".stripMargin

  /** apply_rows (dataframe.py:4999): per-partition row-batch kernel via
    * mapPartitions — constant memory, no driver involvement.
    */
  private def applyRows(s: SparkSession, dir: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("event_id", LongType, nullable = false),
      StructField("bucketed", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    Tables
      .events(s, dir)
      .select(col("event_id"), col("value"))
      .mapPartitions { rows =>
        rows.map { r =>
          val v = r.getDouble(1)
          Row(r.getLong(0), math.floor(v / 10).toLong)
        }
      }(enc)
  }

  private val applyRowsSql =
    """SELECT event_id, CAST(floor(value / 10) AS BIGINT) AS bucketed
      |FROM events""".stripMargin

  /** groupby.apply (core/groupby JIT engine): typed mapGroups computing a
    * per-group kernel (count + fixed-point sum + span).
    */
  private def groupApply(s: SparkSession, dir: String): DataFrame = {
    val spark = s
    import spark.implicits._
    Tables
      .events(s, dir)
      .select(col("user_id"), col("value"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroups { (uid, it) =>
        var n = 0L
        var sumFp = 0L
        var mn = Double.MaxValue
        var mx = Double.MinValue
        it.foreach { case (_, v) =>
          n += 1
          sumFp += math.floor(v * 1e4).toLong
          if (v < mn) mn = v
          if (v > mx) mx = v
        }
        (uid, n, sumFp.toDouble / 1e4, mx - mn)
      }
      .toDF("user_id", "n_events", "sum_value", "value_span")
  }

  private val groupApplySql =
    """SELECT user_id, count(*) AS n_events,
      |  CAST(sum(CAST(floor(value * 1e4) AS BIGINT)) AS DOUBLE) / 1e4
      |    AS sum_value,
      |  max(value) - min(value) AS value_span
      |FROM events GROUP BY user_id""".stripMargin

  def queries: Map[String, Q] = Map(
    "udf_masked" -> Q(maskedUdf _, maskedUdfSql),
    "udf_apply_rows" -> Q(applyRows _, applyRowsSql),
    "udf_group_apply" -> Q(groupApply _, groupApplySql)
  )
}
