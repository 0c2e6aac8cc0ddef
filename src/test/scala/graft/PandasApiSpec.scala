package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic pins for the pandas-API surface queries added in round 14:
  * pct_change, rank tie-methods, cumprod scan, searchsorted, digitize.
  * The DuckDB gate checks cross-engine equality; these pin the MATH —
  * each result is re-derived from an independent identity or a brute
  * in-memory fold.
  */
class PandasApiSpec extends AnyFunSuite {
  import TestSpark._

  test("pct_change matches value/prev - 1 and nulls the first row per user") {
    val rows = queries.Windows
      .queries("win_pct_change")
      .fn(spark, sf)
      .collect()
    val byUser = Tables
      .events(spark, sf)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .collect()
      .groupBy(_.getLong(0))
      .view
      .mapValues(
        _.sortBy(r => (r.getTimestamp(2).getTime, r.getLong(1))).toSeq)
      .toMap
    val expected = byUser.flatMap { case (u, evs) =>
      evs.zipWithIndex.map { case (r, i) =>
        val pct =
          if (i == 0) null
          else {
            val prev = evs(i - 1).getDouble(3)
            java.lang.Double.valueOf((r.getDouble(3) - prev) / prev)
          }
        (u, r.getLong(1)) -> pct
      }
    }
    assert(rows.length == expected.size)
    rows.foreach { r =>
      val exp = expected((r.getLong(0), r.getLong(1)))
      if (exp == null) assert(r.isNullAt(2))
      else assert(r.getDouble(2) == exp.doubleValue())
    }
  }

  test("rank ties: avg=(min+max)/2, first is a permutation, pct ends at (n+1)/2n..1") {
    val df = queries.Windows.queries("win_rank_ties").fn(spark, sf)
    val bad = df
      .filter(
        col("avg_rnk") =!= (col("min_rnk") + col("max_rnk")) / 2.0 ||
          col("min_rnk") > col("first_rnk") ||
          col("first_rnk") > col("max_rnk") ||
          col("pct_rnk") <= 0 || col("pct_rnk") > 1)
      .count()
    assert(bad == 0)
    // method='first' assigns each row a distinct 1..n per user
    val firstOk = df
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("first_rnk")).as("d"),
        max(col("first_rnk")).as("mx"),
        min(col("first_rnk")).as("mn"))
      .filter(
        col("n") =!= col("d") || col("mx") =!= col("n") || col("mn") =!= 1)
      .count()
    assert(firstOk == 0)
  }

  test("cumprod sign equals brute product of per-event signs") {
    val rows = queries.Windows
      .queries("win_cumprod")
      .fn(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val byUser = Tables
      .events(spark, sf)
      .select(col("user_id"), col("event_id"), col("ts"),
        floor(col("value")).cast("long").as("vi"))
      .collect()
      .groupBy(_.getLong(0))
    byUser.foreach { case (u, evs) =>
      var prod = 1L
      evs.sortBy(r => (r.getTimestamp(2).getTime, r.getLong(1))).foreach {
        r =>
          prod *= (if (r.getLong(3) % 2 == 0) -1L else 1L)
          assert(rows((u, r.getLong(1))) == prod)
      }
    }
  }

  test("searchsorted indices are monotone and equal an independent count") {
    val got = queries.Extras
      .queries("sort_searchsorted")
      .fn(spark, sf)
      .collect()
      .sortBy(_.getDouble(0))
    val prices =
      Tables.lineitem(spark, sf).select(col("l_extendedprice")).collect()
        .map(_.getDouble(0))
    var prevHi = 0L
    got.foreach { r =>
      val p = r.getDouble(0)
      val lo = prices.count(_ < p).toLong
      val hi = prices.count(_ <= p).toLong
      assert(r.getLong(1) == lo && r.getLong(2) == hi)
      assert(lo <= hi && r.getLong(1) >= 0 && hi >= prevHi)
      prevHi = hi
    }
  }

  test("tz ops: January offsets are exactly EST +5h / JST -9h") {
    val bad = queries.Conversions
      .queries("dt_tz_ops")
      .fn(spark, sf)
      .filter(
        col("localize_ny_epoch") - col("epoch_utc") =!= 5L * 3600 ||
          col("localize_tokyo_epoch") - col("epoch_utc") =!= -9L * 3600 ||
          col("ny_hour") < 0 || col("ny_hour") > 23)
      .count()
    assert(bad == 0)
  }

  test("slice_stride equals the brute iloc[10:5000:3] gather") {
    val got = queries.Relational
      .queries("slice_stride")
      .fn(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .sortBy(_._2)
    val all = Tables
      .orders(spark, sf)
      .select(col("o_orderkey"))
      .collect()
      .map(_.getLong(0))
      .sorted
    val exp = all.zipWithIndex
      .collect { case (k, i) if i >= 10 && i < 5000 && (i - 10) % 3 == 0 =>
        (k, i + 1L)
      }
    assert(got.toSeq == exp.toSeq)
  }

  test("group_head_tail: 5 rows per user unless head and tail overlap") {
    val df = queries.Relational.queries("group_head_tail").fn(spark, sf)
    val perUser = df.groupBy(col("user_id")).count().collect()
    val sizes = Tables
      .events(spark, sf)
      .groupBy(col("user_id"))
      .count()
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    perUser.foreach { r =>
      val n = sizes(r.getLong(0))
      assert(r.getLong(1) == math.min(n, 5L))
    }
    // ngroup is dense 0..k-1 over the sorted distinct keys
    val ng = df
      .select(col("user_id"), col("ngroup"))
      .distinct()
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    assert(ng.map(_._2).toSeq == ng.indices.map(_.toLong))
    // every group's head row carries cumcount 0
    assert(
      df.filter(col("cumcount") === 0).count() == sizes.size &&
        df.filter(col("is_head") && col("cumcount") > 2).count() == 0)
  }

  test("gram matrix equals the brute-force fold over collected vectors") {
    val got = queries.Aggregates
      .queries("emb_gram_matrix")
      .fn(spark, sf)
      .collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2))
      .toMap
    val vecs = Tables
      .embeddings(spark, sf)
      .select(col("embedding"))
      .collect()
      .map(_.getSeq[Float](0).take(6)
        .map(f => math.floor(f.toDouble * 1000).toLong).toArray)
    for { i <- 0 until 6; j <- i until 6 } {
      val brute = vecs.map(v => v(i) * v(j)).sum
      assert(got((i, j)) == brute, s"G[$i][$j]")
    }
  }

  test("calendar flags agree with java.time on every distinct date") {
    import java.time.LocalDate
    val rows = queries.Functions
      .queries("dt_calendar_flags")
      .fn(spark, sf)
      .join(Tables.orders(spark, sf).select(col("o_orderkey"),
        col("o_orderdate")), Seq("o_orderkey"))
      .drop("o_orderkey")
      .distinct()
      .collect()
    rows.foreach { r =>
      val d: LocalDate = r.getAs[Any]("o_orderdate") match {
        case dt: java.time.LocalDateTime => dt.toLocalDate
        case sd: java.sql.Date => sd.toLocalDate
        case ts: java.sql.Timestamp => ts.toLocalDateTime.toLocalDate
      }
      assert(r.getAs[String]("day_nm") ==
        d.getDayOfWeek.getDisplayName(java.time.format.TextStyle.FULL,
          java.util.Locale.ENGLISH))
      assert(r.getAs[Boolean]("is_leap") == d.isLeapYear)
      assert(r.getAs[Boolean]("is_month_end") ==
        (d.getDayOfMonth == d.lengthOfMonth))
      assert(r.getAs[Int]("iso_week") ==
        d.get(java.time.temporal.WeekFields.ISO.weekOfWeekBasedYear()))
      assert(r.getAs[Int]("iso_year") ==
        d.get(java.time.temporal.WeekFields.ISO.weekBasedYear()))
    }
  }

  test("digitize: numpy semantics at and between the edges") {
    val byQty = queries.Functions
      .queries("math_digitize")
      .fn(spark, sf)
      .select(col("qty"), col("bin_left"), col("bin_right"))
      .distinct()
      .collect()
    val edges = Seq(10d, 20d, 30d, 40d)
    byQty.foreach { case Row(q: Double, bl: Long, br: Long) =>
      assert(bl == edges.count(_ <= q), s"left at $q")
      assert(br == edges.count(_ < q), s"right at $q")
    }
    // edge value lands IN the lower bin for right=True, upper for right=False
    val at10 = byQty.find(_.getDouble(0) == 10d)
    at10.foreach(r => assert(r.getLong(1) == 1 && r.getLong(2) == 0))
  }
}
