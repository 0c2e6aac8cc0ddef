package org.apache.spark.sql.graftbridge

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, FileInputStream, FileOutputStream}
import java.nio.channels.Channels

import org.apache.arrow.vector.{VectorLoader, VectorSchemaRoot, VectorUnloader}
import org.apache.arrow.vector.ipc.{ArrowFileReader, ArrowFileWriter}
import org.apache.arrow.vector.ipc.message.MessageSerializer
import org.apache.arrow.vector.ipc.{ReadChannel, WriteChannel}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.arrow.ArrowConverters
import org.apache.spark.sql.util.ArrowUtils

/** Feather v2 IO (reference `python/cudf/cudf/io/feather.py` —
  * `read_feather`/`to_feather`). Feather v2 IS the Arrow IPC *file*
  * format, so this is [[ArrowBridge]]'s stream batches wrapped in the
  * random-access file container: a file written here opens directly in
  * `pyarrow.feather.read_table` / pandas `read_feather` / R `arrow`.
  *
  * Distribution contract (same as ArrowBridge): batch SERIALIZATION is
  * distributed (each partition yields its own IPC batches); the file
  * assembly/read is driver-local, because feather is the hand-off
  * format to a single-machine consumer (pandas/R) — a bounded result,
  * not a 100 TB table. For engine-to-engine bulk exchange at scale, use
  * parquet; feather files of unbounded inputs are an anti-pattern this
  * API intentionally does not hide.
  */
object Feather {

  /** Write `df` as one Feather v2 (Arrow IPC file format) file. */
  def writeFeather(df: DataFrame, path: String): Unit = {
    val tz = df.sparkSession.sessionState.conf.sessionLocalTimeZone
    val arrowSchema = ArrowUtils.toArrowSchema(
      df.schema, tz, errorOnDuplicatedFieldNames = true, largeVarTypes = false)
    val payloads = ArrowBridge.toArrowBatches(df)
    val alloc = ArrowUtils.rootAllocator
      .newChildAllocator(s"feather-write-$path", 0, Long.MaxValue)
    val root = VectorSchemaRoot.create(arrowSchema, alloc)
    val ch = new FileOutputStream(path).getChannel
    val writer = new ArrowFileWriter(root, null, ch)
    try {
      writer.start()
      val loader = new VectorLoader(root)
      payloads.foreach { bytes =>
        val rb = MessageSerializer.deserializeRecordBatch(
          new ReadChannel(Channels.newChannel(new ByteArrayInputStream(bytes))),
          alloc)
        try {
          loader.load(rb)
          writer.writeBatch()
        } finally rb.close()
      }
      writer.end()
    } finally {
      writer.close()
      root.close()
      alloc.close()
    }
  }

  /** Read a Feather v2 / Arrow IPC file into a DataFrame. */
  def readFeather(spark: SparkSession, path: String): DataFrame = {
    val alloc = ArrowUtils.rootAllocator
      .newChildAllocator(s"feather-read-$path", 0, Long.MaxValue)
    val ch = new FileInputStream(path).getChannel
    val reader = new ArrowFileReader(ch, alloc)
    try {
      val root = reader.getVectorSchemaRoot
      val sparkSchema = ArrowUtils.fromArrowSchema(root.getSchema)
      val payloads = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      val unloader = new VectorUnloader(root)
      while (reader.loadNextBatch()) {
        val rb = unloader.getRecordBatch
        try {
          val out = new ByteArrayOutputStream()
          MessageSerializer.serialize(
            new WriteChannel(Channels.newChannel(out)), rb)
          payloads += out.toByteArray
        } finally rb.close()
      }
      ArrowConverters.toDataFrame(
        payloads.iterator, sparkSchema.json,
        spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession])
    } finally {
      reader.close()
      alloc.close()
    }
  }
}
