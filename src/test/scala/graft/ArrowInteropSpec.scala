package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ArrowBridge
import org.scalatest.funsuite.AnyFunSuite

/** Arrow interop round-trip (reference `interop.hpp:658` to_arrow /
  * `:703` from_arrow): schema and values must survive
  * DataFrame → Arrow IPC batches → DataFrame unchanged.
  */
class ArrowInteropSpec extends AnyFunSuite {
  import TestSpark._

  test("nation table round-trips through Arrow IPC batches") {
    val df = Tables.nation(spark, sf)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
    val back = ArrowBridge.roundTrip(df)
    assert(back.schema == df.schema)
    assert(back.count() == df.count())
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
  }

  test("mixed types (string/long/double/date/array/null) round-trip") {
    val df = Tables.orders(spark, sf)
      .limit(500)
      .select(
        col("o_orderkey"),
        col("o_orderstatus"),
        col("o_totalprice"),
        col("o_orderdate"),
        split(col("o_orderpriority"), "-").as("prio_parts"),
        when(col("o_orderkey") % 7 === 0, col("o_orderstatus")).as("maybe_null"))
    val back = ArrowBridge.roundTrip(df)
    assert(back.schema == df.schema)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
  }

  test("multiple small batches reassemble completely") {
    val df = Tables.customer(spark, sf).select(col("c_custkey"), col("c_name"))
    val batches = ArrowBridge.toArrowBatches(df, maxRecordsPerBatch = 64L)
    assert(batches.length > 1, "expected several Arrow batches at batch size 64")
    val back = ArrowBridge.fromArrowBatches(spark, batches, df.schema.json)
    assert(back.count() == df.count())
    assert(back.exceptAll(df).isEmpty)
  }

  test("feather v2 file round-trips (Arrow IPC file format)") {
    import org.apache.spark.sql.graftbridge.Feather
    val df = Tables
      .orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        when(col("o_orderkey") % 5 === 0, col("o_custkey")).as("maybe_null"))
    val path = java.nio.file.Files
      .createTempDirectory("graft-feather").toString + "/orders.feather"
    Feather.writeFeather(df, path)
    val back = Feather.readFeather(spark, path)
    assert(back.schema.fieldNames.toSeq == df.schema.fieldNames.toSeq)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
  }

  test("feather file opens in pyarrow (cross-ecosystem proof)") {
    import org.apache.spark.sql.graftbridge.Feather
    val df = Tables.nation(spark, sf)
      .select(col("n_nationkey"), col("n_name"))
    val path = java.nio.file.Files
      .createTempDirectory("graft-feather-py").toString + "/nation.feather"
    Feather.writeFeather(df, path)
    val script =
      s"""import pyarrow.feather as f
         |t = f.read_table("$path")
         |print(t.num_rows, t.num_columns)""".stripMargin
    val out = new StringBuilder
    val rc = scala.sys.process.Process(Seq("python3", "-c", script))
      .!(scala.sys.process.ProcessLogger(l => out.append(l).append('\n'), _ => ()))
    assert(rc == 0, s"pyarrow failed to open the feather file: $out")
    assert(out.toString.trim == s"${df.count()} 2", out.toString)
  }
}
