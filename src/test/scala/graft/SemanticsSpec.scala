package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Engine semantic contracts from SURVEY §1.2/§1.3 and FIXTURES items
  * 1 (null/NaN), 8 (decimals), 9 (type mapping): the knobs cuDF exposes
  * as enums (`types.hpp:118-186`) pinned to this engine's fixed choices.
  */
class SemanticsSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val nullNan = {
    val schema = StructType(Seq(
      StructField("key", StringType, true),
      StructField("i", LongType, true),
      StructField("f", DoubleType, true)))
    spark.createDataFrame(
      java.util.Arrays.asList(
        Row("a", 1L, 1.5),
        Row("a", null, Double.NaN),
        Row(null, 3L, -0.0),
        Row(null, null, 0.0),
        Row("b", 5L, Double.PositiveInfinity),
        Row("b", 6L, null)),
      schema)
  }

  test("count(col) excludes nulls; count(*) includes (null_policy)") {
    val r = nullNan.agg(count(col("i")).as("valid"), count(lit(1)).as("all")).head()
    assert(r.getLong(0) == 4 && r.getLong(1) == 6)
  }

  test("groupBy treats null as a real group; NaN == NaN in grouping") {
    val groups = nullNan.groupBy(col("key")).count().collect()
    assert(groups.length == 3) // a, b, null
    val nanGroups = nullNan
      .groupBy(col("f")).count().collect()
    // NaN forms a single group (Spark NaN==NaN in grouping)
    val nanRows = nanGroups.filter(r => !r.isNullAt(0) && r.getDouble(0).isNaN)
    assert(nanRows.length == 1)
  }

  test("-0.0 and 0.0 group together (normalize_nans_and_zeros contract)") {
    val zeroGroups = nullNan
      .filter(col("f") === 0.0)
      .groupBy(col("f")).count().collect()
    assert(zeroGroups.length == 1 && zeroGroups.head.getLong(1) == 2)
  }

  test("null-safe equality <=> joins null keys (null_equality::EQUAL)") {
    val l = nullNan.select(col("key").as("lk"))
    val r = nullNan.select(col("key").as("rk")).distinct()
    val eqJoin = l.join(r, col("lk") === col("rk")).count()
    val nsJoin = l.join(r, col("lk") <=> col("rk")).count()
    assert(nsJoin == eqJoin + 2) // the two null-key rows match the null group
  }

  test("NaN sorts last among doubles (fixed NaN order)") {
    val sorted = nullNan
      .filter(col("f").isNotNull)
      .select(col("f"))
      .orderBy(col("f"))
      .collect()
      .map(_.getDouble(0))
    assert(sorted.last.isNaN)
    assert(sorted(sorted.length - 2) == Double.PositiveInfinity)
  }

  test("nulls-first vs nulls-last sort orders (null_order knob)") {
    val first = nullNan.orderBy(col("i").asc_nulls_first).collect()
    val last = nullNan.orderBy(col("i").asc_nulls_last).collect()
    assert(first.head.isNullAt(1) && last.last.isNullAt(1))
  }

  test("decimal cast round-trip and scale semantics (DECIMAL32/64/128)") {
    val df = spark.range(1).select(
      lit("123.456").cast(DecimalType(9, 3)).as("d32"),
      lit("123456789012.345").cast(DecimalType(18, 3)).as("d64"),
      lit("1234567890123456789012345.678").cast(DecimalType(38, 3)).as("d128"))
    val r = df.head()
    assert(r.getDecimal(0).toString == "123.456")
    assert(r.getDecimal(1).toString == "123456789012.345")
    assert(r.getDecimal(2).toString == "1234567890123456789012345.678")
    // sum promotes precision without overflow (cudf scale = -3 ↔ (p,3))
    val s = spark.range(1000)
      .select(lit("9999999.999").cast(DecimalType(10, 3)).as("d"))
      .agg(sum(col("d")).as("s")).head().getDecimal(0)
    assert(s.toString == "9999999999.000")
  }

  test("decimal round HALF_UP vs HALF_EVEN on exact ties") {
    val r = spark.range(1).select(
      round(lit("2.5").cast(DecimalType(3, 1)), 0).as("up"),
      bround(lit("2.5").cast(DecimalType(3, 1)), 0).as("even"),
      round(lit("3.5").cast(DecimalType(3, 1)), 0).as("up2"),
      bround(lit("3.5").cast(DecimalType(3, 1)), 0).as("even2")).head()
    assert(r.getDecimal(0).intValue == 3 && r.getDecimal(1).intValue == 2)
    assert(r.getDecimal(2).intValue == 4 && r.getDecimal(3).intValue == 4)
  }

  test("ns timestamps truncate to µs at the loader (§1.2 contract)") {
    val ts = Tables.events(spark, sf).select(col("ts")).head().getTimestamp(0)
    assert(ts != null)
    // micros-precision Timestamp: nanos field is a multiple of 1000
    assert(ts.getNanos % 1000 == 0)
  }

  test("unsigned widening contract (§1.2): UINT64 max fits Decimal(20,0)") {
    // Spark has no unsigned types; the declared mapping widens. Verify the
    // widened types hold the full unsigned ranges.
    val r = spark.range(1).select(
      lit(255).cast(ShortType).as("u8"),
      lit(65535).cast(IntegerType).as("u16"),
      lit(4294967295L).cast(LongType).as("u32"),
      lit("18446744073709551615").cast(DecimalType(20, 0)).as("u64")).head()
    assert(r.getShort(0) == 255 && r.getInt(1) == 65535)
    assert(r.getLong(2) == 4294967295L)
    assert(r.getDecimal(3).toString == "18446744073709551615")
  }
}
