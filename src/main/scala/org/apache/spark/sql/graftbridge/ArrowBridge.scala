package org.apache.spark.sql.graftbridge

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.arrow.ArrowConverters

/** Arrow interop (reference `cpp/include/cudf/interop.hpp:658` to_arrow /
  * `:703` from_arrow): DataFrame → Arrow IPC record batches → DataFrame,
  * via Spark's own `private[sql]` ArrowConverters (the machinery behind
  * `df.toArrow` in PySpark / Spark Connect).
  *
  * The serialize side runs distributed (`mapPartitions` over the
  * InternalRow RDD — each partition becomes its own stream of batches);
  * only the rehydrate side is driver-local, which is the Arrow interop
  * contract: batches are the hand-off unit to an external Arrow consumer.
  */
object ArrowBridge {

  /** Serialize each partition of `df` to Arrow IPC batch payloads. */
  def toArrowBatches(df: DataFrame, maxRecordsPerBatch: Long = 4096L): Array[Array[Byte]] = {
    val schema = df.schema
    val tz = df.sparkSession.sessionState.conf.sessionLocalTimeZone
    df.queryExecution.toRdd
      .mapPartitions { iter =>
        ArrowConverters.toBatchIterator(
          iter, schema, maxRecordsPerBatch, tz,
          errorOnDuplicatedFieldNames = true, largeVarTypes = false,
          context = TaskContext.get())
      }
      .collect()
  }

  /** Rehydrate Arrow IPC batches into a DataFrame with the given schema. */
  def fromArrowBatches(
      spark: SparkSession,
      batches: Array[Array[Byte]],
      schemaJson: String): DataFrame =
    ArrowConverters.toDataFrame(
      batches.iterator, schemaJson,
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession])

  /** Full round-trip: df → Arrow batches → df. */
  def roundTrip(df: DataFrame): DataFrame =
    fromArrowBatches(df.sparkSession, toArrowBatches(df), df.schema.json)
}
