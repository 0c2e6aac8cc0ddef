package graft

import graft.operators.GlobalOrder
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.scalatest.funsuite.AnyFunSuite

/** Pins the distributed global argsort against the naive
  * single-partition window on real data, across repeated invocations
  * (the determinism property the zipWithIndex design guarantees by
  * construction: both of its jobs read one RDD instance, so range
  * boundaries can never be re-sampled between the counts pass and the
  * data pass).
  */
class GlobalOrderSpec extends AnyFunSuite {
  import TestSpark._

  private def input = Tables
    .customer(spark, sf)
    .select(
      col("c_custkey"),
      when(col("c_acctbal") < 0, null).otherwise(col("c_acctbal")).as("bal"))

  private val order =
    Seq(col("bal").asc_nulls_first, col("c_custkey"))

  test("rowNumber matches the naive global row_number, output is LongType") {
    val got = GlobalOrder.rowNumber(input, order, "rn")
    assert(got.schema("rn").dataType == LongType)
    val want = input.withColumn(
      "rn",
      row_number()
        .over(Window.partitionBy(lit(0)).orderBy(order: _*))
        .cast(LongType))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("rowNumber is stable across invocations (no boundary re-sampling)") {
    val a = GlobalOrder.rowNumber(input, order, "rn").collect().toSet
    val b = GlobalOrder.rowNumber(input, order, "rn").collect().toSet
    assert(a == b)
    // exactly the numbers 1..n, once each
    val n = a.size
    assert(a.map(_.getAs[Long]("rn")) == (1L to n.toLong).toSet)
  }
}
