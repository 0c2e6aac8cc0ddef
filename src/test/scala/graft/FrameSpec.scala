package graft

import graft.engine.Frame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Façade tests: each cudf-flavored verb lowers to the same result as
  * the direct DataFrame formulation (differential style).
  */
class FrameSpec extends AnyFunSuite {
  import TestSpark._

  private def li = Frame(Tables.lineitem(spark, sf))
  private def orders = Frame(Tables.orders(spark, sf))

  test("query/assign/select mirror filter/withColumn") {
    val got = li
      .query("l_quantity > 30 and l_discount < 0.05")
      .assign("net", col("l_extendedprice") * (lit(1) - col("l_discount")))
      .select("l_orderkey", "net")
      .df
    val exp = Tables.lineitem(spark, sf)
      .filter(col("l_quantity") > 30 && col("l_discount") < 0.05)
      .select(col("l_orderkey"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net"))
    assert(got.exceptAll(exp).isEmpty && exp.exceptAll(got).isEmpty)
  }

  test("merge how-mapping covers outer/semi/anti") {
    val c = Frame(Tables.customer(spark, sf).select(col("c_custkey").as("o_custkey")))
    assert(orders.merge(c, Seq("o_custkey"), "semi").df.count() ==
      Tables.orders(spark, sf).count())
    val anti = orders.merge(c, Seq("o_custkey"), "anti").df.count()
    assert(anti == 0)
    val outer = c.merge(orders, Seq("o_custkey"), "outer").df
    assert(outer.count() >= Tables.orders(spark, sf).count())
  }

  test("dropDuplicates keep=first matches window formulation; keep=none") {
    val first = li
      .dropDuplicates(Seq("l_orderkey"), "first",
        orderBy = Seq(col("l_linenumber"), col("l_partkey"), col("l_suppkey")))
      .df
    assert(first.count() ==
      Tables.lineitem(spark, sf).select(col("l_orderkey")).distinct().count())
    val none = li.dropDuplicates(Seq("l_orderkey"), "none").df
    val exp = Tables.lineitem(spark, sf).groupBy(col("l_orderkey"))
      .count().filter(col("count") === 1).count()
    assert(none.count() == exp)
  }

  test("groupby.agg and valueCounts") {
    val g = li.groupby("l_returnflag")
      .agg("n" -> count(lit(1)), "total_qty" -> sum(col("l_quantity"))).df
    assert(g.count() == 3)
    val vc = li.valueCounts("l_returnflag").df.collect()
    assert(vc.map(_.getLong(1)).sum == Tables.lineitem(spark, sf).count())
    assert(vc.head.getLong(1) >= vc.last.getLong(1))
  }

  test("nlargest equals orderBy.limit") {
    val got = li.nlargest(5, "l_extendedprice", Seq("l_orderkey", "l_linenumber")).df
    val exp = Tables.lineitem(spark, sf)
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(5)
    assert(got.collect().map(_.toSeq).sameElements(exp.collect().map(_.toSeq)))
  }

  test("rolling with min_periods nulls the short frames") {
    val r = Frame(Tables.events(spark, sf))
      .rolling(3, 3, "value", Seq("user_id"), Seq(col("ts"), col("event_id")),
        c => sum(c), "roll")
      .df
    val nulls = r.filter(col("roll").isNull).count()
    val users = Tables.events(spark, sf).select(countDistinct(col("user_id"))).head().getLong(0)
    assert(nulls == users * 2) // first two rows per user have <3 in frame
  }

  test("resample buckets cover all events") {
    val r = Frame(Tables.events(spark, sf))
      .resample("ts", 180)
      .agg("n" -> count(lit(1)))
      .df
    assert(r.agg(sum(col("n"))).head().getLong(0) == Tables.events(spark, sf).count())
  }

  test("melt/getDummies/cut shapes") {
    val c = Frame(Tables.customer(spark, sf))
    val melted = c.melt(Seq("c_custkey"), Seq("c_acctbal")).df
    assert(melted.count() == Tables.customer(spark, sf).count())
    val dum = c.getDummies("c_mktsegment", Seq("BUILDING", "MACHINERY")).df
    assert(dum.columns.contains("c_mktsegment_BUILDING"))
    val cutted = c.cut("c_acctbal", 0, 10000, 10, "bin").df
    val bins = cutted.select(col("bin")).distinct().collect().map(_.getInt(0))
    assert(bins.forall(b => b >= 0 && b <= 9))
  }

  test("ffill fills group-wise") {
    val f = Frame(Tables.events(spark, sf)
      .withColumn("value", when(col("value") < 30, null).otherwise(col("value"))))
      .ffill("value", Seq("user_id"), Seq(col("ts"), col("event_id")))
      .df
    val before = Tables.events(spark, sf).filter(col("value") < 30).count()
    assert(f.filter(col("value").isNull).count() < before)
  }
}
