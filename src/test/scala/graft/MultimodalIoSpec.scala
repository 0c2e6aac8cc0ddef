package graft

import graft.multimodal.Multimodal
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal plumbing + IO round-trip tests (reference fuzz targets
  * `python/cudf/cudf/_fuzz_testing/{csv,json,orc,parquet}.py`).
  */
class MultimodalIoSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val media = Multimodal.toMediaFrame(
    Tables.documents(spark, sf).withColumn("payload", encode(col("text"), "UTF-8")),
    "doc_id", "payload", "source", "text/plain")

  test("media frame carries schema'd binary payload + metadata") {
    // nullability is derived from the source plan; names/types must match
    assert(media.schema.map(f => (f.name, f.dataType)) ==
      Multimodal.mediaSchema.map(f => (f.name, f.dataType)))
    val r = media.orderBy(col("media_id")).head()
    assert(r.getAs[Array[Byte]]("payload").nonEmpty)
    assert(r.getAs[org.apache.spark.sql.Row]("meta").getAs[Long]("n_bytes") > 0)
  }

  test("feature extraction runs partition-parallel with stable results") {
    val f1 = Multimodal.extractFeatures(spark, media).orderBy(col("media_id")).collect()
    val f2 = Multimodal
      .extractFeatures(spark, media.repartition(7))
      .orderBy(col("media_id"))
      .collect()
    assert(f1.map(_.toSeq).sameElements(f2.map(_.toSeq)))
    assert(f1.forall(_.getAs[Double]("mean_intensity") > 0))
  }

  test("resize stub caps payload size; frame sampling emits digests") {
    val resized = Multimodal.resizeStub(media, 100)
    assert(resized.agg(max(octet_length(col("payload")))).head().getInt(0) <= 100)
    val frames = Multimodal.frameSample(media, 32, 2)
    assert(frames.count() > 0)
    assert(frames.select(countDistinct(col("frame_digest"))).head().getLong(0) > 1)
  }

  test("parquet/orc/json/csv round-trips preserve data") {
    val dir = Files.createTempDirectory("graft-io").toString
    val src = Tables
      .customer(spark, sf)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_mktsegment"))

    src.write.mode("overwrite").parquet(s"$dir/p")
    assert(spark.read.parquet(s"$dir/p").exceptAll(src).isEmpty)

    src.write.mode("overwrite").orc(s"$dir/o")
    assert(spark.read.orc(s"$dir/o").exceptAll(src).isEmpty)

    src.write.mode("overwrite").json(s"$dir/j")
    val j = spark.read
      .schema(src.schema)
      .json(s"$dir/j")
    assert(j.exceptAll(src).isEmpty)

    src.write.mode("overwrite").option("header", "true").csv(s"$dir/c")
    val c = spark.read.schema(src.schema).option("header", "true").csv(s"$dir/c")
    assert(c.exceptAll(src).isEmpty)
  }

  test("compressed parquet codecs round-trip") {
    val dir = Files.createTempDirectory("graft-codec").toString
    val src = Tables.nation(spark, sf)
    Seq("snappy", "gzip", "zstd").foreach { codec =>
      src.write.mode("overwrite").option("compression", codec).parquet(s"$dir/$codec")
      assert(spark.read.parquet(s"$dir/$codec").exceptAll(src).isEmpty, codec)
    }
  }

  test("text source reads raw lines") {
    val dir = Files.createTempDirectory("graft-txt").toString
    Tables
      .documents(spark, sf)
      .select(col("text"))
      .write.mode("overwrite").text(s"$dir/t")
    assert(spark.read.text(s"$dir/t").count() == Tables.documents(spark, sf).count())
  }
}
