package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of the product-analytics / statistics family that the
  * oracle gate's value-equality can't express: conservation laws
  * (probability mass, containment), ordering laws (WAU ≥ DAU), and
  * exact recovery on synthetic inputs.
  */
class AnalyticsSpec extends AnyFunSuite {
  import TestSpark._

  test("path transitions: per-source probabilities conserve mass") {
    val rows = SparkEntry.queries("path_transitions")(spark, sf).collect()
    assert(rows.nonEmpty)
    val bySrc = rows.groupBy(_.getString(0))
    bySrc.foreach { case (src, rs) =>
      val mass = rs.map(_.getAs[Long]("p_ppm")).sum
      // floor-division loses < 1 ppm per destination
      assert(mass <= 1000000L && mass > 1000000L - rs.length,
        s"source $src mass $mass")
    }
  }

  test("cohort retention: offset 0 is the cohort itself, cells within size") {
    val rows = SparkEntry.queries("cohort_retention")(spark, sf).collect()
    rows.foreach { r =>
      val (off, n, size, ppm) = (r.getAs[Long]("offset"),
        r.getAs[Long]("n_users"), r.getAs[Long]("cohort_size"),
        r.getAs[Long]("retention_ppm"))
      assert(n <= size)
      if (off == 0L) assert(n == size && ppm == 1000000L)
    }
  }

  test("DAU/WAU: every day's trailing weekly actives >= daily actives") {
    val rows = SparkEntry.queries("win_sliding_distinct")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("wau") >= r.getAs[Long]("dau"))
      assert(r.getAs[Long]("stickiness_ppm") <= 1000000L)
    }
  }

  test("TWAP stays inside each day's value range") {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(spark, sf)
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        floor(col("value") * 100).cast("long").as("vc"))
      .groupBy(col("user_id"), col("day"))
      .agg(min(col("vc")).as("lo"), max(col("vc")).as("hi"))
    val twap = SparkEntry.queries("twap_daily")(spark, sf)
    val bad = twap.join(ev, Seq("user_id", "day"))
      .filter(col("twap_cents") < col("lo") - 1 ||
        col("twap_cents") > col("hi"))
      .count()
    assert(bad == 0L, s"$bad TWAP rows escaped their day's [min,max]")
  }

  test("as-of tolerance: matches are a subset of the unbounded as-of") {
    val tol = SparkEntry.queries("join_asof_tolerance")(spark, sf)
      .filter(col("asof_pv").isNotNull)
      .select(col("event_id"), col("ts_us"), col("asof_ts_us"))
      .collect()
    assert(tol.nonEmpty)
    tol.foreach { r =>
      val gap = r.getLong(1) - r.getLong(2)
      assert(gap >= 0 && gap <= 3600L * 1000000L, s"gap $gap out of bound")
    }
    val plain = SparkEntry.queries("join_asof")(spark, sf)
      .filter(col("asof_pv").isNotNull).count()
    assert(tol.length <= plain)
  }

  test("k-anonymity report is internally consistent") {
    val r = SparkEntry.queries("privacy_k_anon")(spark, sf).head()
    assert(r.getAs[Long]("n_risky_combos") <= r.getAs[Long]("n_combos"))
    // every risky combo has 1..4 members
    val risky = r.getAs[Long]("n_risky_combos")
    val users = r.getAs[Long]("n_risky_users")
    assert(users >= risky && users <= 4 * risky)
    assert(r.getAs[Long]("risk_ppm") <= 1000000L)
  }

  test("skew/kurt are exactly zero-ish on a symmetric synthetic block") {
    val spark2 = TestSpark.spark
    import spark2.implicits._
    // symmetric {1..9} uniform => skew 0, excess kurtosis of the
    // discrete uniform on 9 points: 3*(3n^2-7)/(5(n^2-1)) - 3 with
    // n=9 -> -(6/5)*(n^2+1)/(n^2-1) = -1.23
    val df = (1 to 9).flatMap(v => Seq(("U", v.toLong))).toDF("g", "x")
    df.createOrReplaceTempView("sym_block")
    val got = df.groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s1"),
        sum(col("x") * col("x")).as("s2"),
        sum(col("x") * col("x") * col("x")).as("s3"),
        sum(col("x") * col("x") * col("x") * col("x")).as("s4"))
      .selectExpr("g", "CAST(s1 AS DOUBLE)/n AS m", "CAST(s2 AS DOUBLE)/n AS r2",
        "CAST(s3 AS DOUBLE)/n AS r3", "CAST(s4 AS DOUBLE)/n AS r4")
      .selectExpr("r2 - m*m AS m2", "r3 - 3*m*r2 + 2*m*m*m AS m3",
        "r4 - 4*m*r3 + 6*m*m*r2 - 3*m*m*m*m AS m4")
      .selectExpr("m3 / (sqrt(m2)*m2) AS skew", "m4/(m2*m2) - 3 AS kurt")
      .head()
    assert(math.abs(got.getDouble(0)) < 1e-12)
    assert(math.abs(got.getDouble(1) - (-1.23)) < 1e-9)
  }

  test("profile report: distinct and null counts match direct queries") {
    val rows = SparkEntry.queries("profile_columns")(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val ev = Tables.events(spark, sf)
    assert(rows("user_id").getAs[Long]("n_distinct") ==
      ev.select(col("user_id")).distinct().count())
    assert(rows("event_type").getAs[Long]("n_null") ==
      ev.filter(col("event_type").isNull).count())
    assert(rows.values.map(_.getAs[Long]("n")).toSet.size == 1)
  }
}
