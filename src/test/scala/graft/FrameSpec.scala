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

  test("update overwrites matched non-null cells, preserves the rest") {
    val delta = Frame(Tables.orders(spark, sf)
      .filter(col("o_orderkey") % 100 === 0)
      .select(col("o_orderkey"), lit("U").as("o_orderstatus"),
        lit(null).cast("double").as("o_totalprice")))
    val got = orders.update(delta, Seq("o_orderkey")).df
    // row count and columns unchanged — update never inserts
    assert(got.count() == Tables.orders(spark, sf).count())
    assert(got.columns.sameElements(Tables.orders(spark, sf).columns))
    // matched rows take the delta's non-null status...
    assert(got.filter(col("o_orderkey") % 100 === 0 &&
      col("o_orderstatus") =!= "U").count() == 0)
    // ...but keep their own totalprice where the delta cell is null
    val kept = got.filter(col("o_orderkey") % 100 === 0)
      .select(col("o_orderkey"), col("o_totalprice"))
    val orig = Tables.orders(spark, sf).filter(col("o_orderkey") % 100 === 0)
      .select(col("o_orderkey"), col("o_totalprice"))
    assert(kept.exceptAll(orig).isEmpty && orig.exceptAll(kept).isEmpty)
    // unmatched rows are bit-identical to the input
    val untouched = got.filter(col("o_orderkey") % 100 =!= 0)
    val origRest = Tables.orders(spark, sf).filter(col("o_orderkey") % 100 =!= 0)
    assert(untouched.exceptAll(origRest).isEmpty)
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

  test("clip/mask/where mirror least-greatest/when formulations") {
    val got = li
      .clip("l_quantity", 10.0, 40.0, "q_clip")
      .mask("l_discount", col("l_discount") > 0.05, lit(0.05))
      .where("l_tax", col("l_tax") > 0.0, lit(0.0))
      .df
      .select("q_clip", "l_discount", "l_tax")
    val exp = Tables.lineitem(spark, sf).select(
      least(greatest(col("l_quantity"), lit(10.0)), lit(40.0)).as("q_clip"),
      when(col("l_discount") > 0.05, 0.05).otherwise(col("l_discount")).as("l_discount"),
      when(col("l_tax") > 0.0, col("l_tax")).otherwise(0.0).as("l_tax"))
    assert(got.exceptAll(exp).isEmpty && exp.exceptAll(got).isEmpty)
  }

  test("replace swaps listed values and passes misses; map nulls them") {
    import spark.implicits._
    val base = Frame(Seq("en", "de", "fr", "zz").toDF("lang"))
    val rep = base
      .replaceValues("lang", Seq("en" -> "english", "de" -> "german"))
      .df.as[String].collect().sorted.toSeq
    assert(rep == Seq("english", "fr", "german", "zz"))
    val mapped = base
      .mapDict("lang", Seq("en" -> 1, "de" -> 2), "code")
      .df.select("lang", "code").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1))))
      .toMap
    assert(mapped == Map("en" -> Some(1), "de" -> Some(2),
      "fr" -> None, "zz" -> None))
  }

  test("duplicated marks all rows beyond the first of each key group") {
    val d = li.duplicated(Seq("l_orderkey"),
      Seq(col("l_linenumber"), col("l_partkey"), col("l_suppkey")), "is_dup").df
    val nKeys = Tables.lineitem(spark, sf).select("l_orderkey").distinct().count()
    assert(d.filter(!col("is_dup")).count() == nKeys)
    assert(d.count() == Tables.lineitem(spark, sf).count())
  }

  test("rank methods agree with pandas semantics on a known series") {
    import spark.implicits._
    val df = Frame(Seq(("a", 10.0), ("a", 20.0), ("a", 20.0), ("a", 30.0))
      .toDF("k", "v"))
    def ranks(m: String) = df.rank("v", Seq("k"), m, "r").df
      .orderBy("v", "r").select("r").as[Double].collect().toSeq
    assert(ranks("min") == Seq(1.0, 2.0, 2.0, 4.0))
    assert(ranks("dense") == Seq(1.0, 2.0, 2.0, 3.0))
    assert(ranks("first") == Seq(1.0, 2.0, 3.0, 4.0))
    assert(ranks("average") == Seq(1.0, 2.5, 2.5, 4.0))
  }

  test("shift/diff mirror lag formulations; sortValues honors na_position") {
    val got = Frame(Tables.events(spark, sf))
      .diff("value", Seq("user_id"), Seq(col("ts"), col("event_id")), "dv")
      .df.select("event_id", "dv")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val exp = Tables.events(spark, sf)
      .select(col("event_id"), (col("value") - lag(col("value"), 1).over(w)).as("dv"))
    assert(got.exceptAll(exp).isEmpty && exp.exceptAll(got).isEmpty)

    import spark.implicits._
    val withNulls = Frame(Seq(Some(2.0), None, Some(1.0)).toDF("v"))
    val lastRow = withNulls.sortValues(Seq("v"), ascending = true, naPosition = "last")
      .df.collect().last
    assert(lastRow.isNullAt(0), "nulls must sort last")
  }

  test("groupby transform broadcasts the aggregate onto every row") {
    val got = li.groupby("l_orderkey")
      .transformAgg(max(col("l_quantity")), "grp_max")
      .df.select("l_orderkey", "l_linenumber", "grp_max")
    val agged = Tables.lineitem(spark, sf).groupBy(col("l_orderkey"))
      .agg(max(col("l_quantity")).as("grp_max"))
    val exp = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber").join(agged, "l_orderkey")
      .select("l_orderkey", "l_linenumber", "grp_max")
    assert(got.count() == Tables.lineitem(spark, sf).count())
    assert(got.exceptAll(exp).isEmpty && exp.exceptAll(got).isEmpty)
  }

  test("sample is deterministic per seed; describe matches direct aggregates incl. stddev") {
    val a = li.sample(0.1, 42L).df.count()
    val b = li.sample(0.1, 42L).df.count()
    assert(a == b)
    // full five-row shape golden: describe's string cells parse back to
    // the direct aggregate values — including stddev, which the oracled
    // frame_describe row excludes as the one order-dependent double
    // (this differential check is within ONE engine, so it is exact
    // modulo the string round-trip)
    val d = li.describe("l_quantity").df.collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(d.keySet == Set("count", "mean", "stddev", "min", "max"))
    val g = li.df.agg(
      count(col("l_quantity")), avg(col("l_quantity")),
      stddev_samp(col("l_quantity")),
      min(col("l_quantity")).cast("double"),
      max(col("l_quantity")).cast("double")).head()
    assert(d("count").toLong == g.getLong(0))
    assert(math.abs(d("mean").toDouble - g.getDouble(1)) < 1e-9)
    assert(math.abs(d("stddev").toDouble - g.getDouble(2)) < 1e-9)
    assert(d("min").toDouble == g.getDouble(3))
    assert(d("max").toDouble == g.getDouble(4))
  }

  test("qcut yields near-equal-frequency bins; mergeAsof directions agree with window forms") {
    val binned = li.qcut("l_extendedprice", 4,
      partitionBy = Seq("l_returnflag"),
      tiebreak = Seq("l_orderkey", "l_linenumber"), out = "q4")
    val sizes = binned.df.groupBy(col("l_returnflag"), col("q4")).count()
      .groupBy(col("l_returnflag"))
      .agg((max(col("count")) - min(col("count"))).as("spread"))
      .collect()
    sizes.foreach(r => assert(r.getAs[Long]("spread") <= 1,
      "ntile bins within a group must differ by at most one row"))

    val ev = graft.engine.Frame(Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("ts")))
    val ref = graft.engine.Frame(Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts")).agg(max(col("value")).as("pv")))
    val back = ev.mergeAsof(ref, "user_id", "ts", "pv", "backward").df
    val fwd = ev.mergeAsof(ref, "user_id", "ts", "pv", "forward").df
    assert(back.count() == ev.df.count() && fwd.count() == ev.df.count())
    // backward result ts <= probe ts; forward result ts >= probe ts
    assert(back.filter(col("asof_ts") > col("ts")).count() == 0)
    assert(fwd.filter(col("asof_fwd_ts") < col("ts")).count() == 0)
    intercept[IllegalArgumentException] {
      ev.mergeAsof(ref, "user_id", "ts", "pv", "sideways")
    }
  }

  test("zorderBy preserves content and produces the requested partitioning") {
    val z = li.zorderBy(Seq("l_partkey", "l_suppkey"), 8)
    assert(z.df.rdd.getNumPartitions == 8)
    val sig = (f: graft.engine.Frame) => f.df
      .agg(count(lit(1)), sum(col("l_partkey")), sum(col("l_suppkey")))
      .head().toSeq
    assert(sig(z) == sig(li))
  }
}
