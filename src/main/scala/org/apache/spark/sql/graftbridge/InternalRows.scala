package org.apache.spark.sql.graftbridge

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.classic.{SparkSession => ClassicSession}
import org.apache.spark.sql.types.StructType

/** Bridge to the `private[sql]` InternalRow boundary of a DataFrame, for
  * operators that must leave the Catalyst plan (distributed prefix scans,
  * partition-offset numbering) without paying the external-Row tax:
  * `df.rdd` deserializes every InternalRow into a GenericRowWithSchema
  * and `createDataFrame(rowRdd, schema)` converts each one back — two
  * full per-row materializations that exist only because the public API
  * speaks external Rows. `toRdd`/`fromRdd` keep the rows in Tungsten
  * format end to end; the physical plan (scan → exchange → sort) and the
  * shuffle-reuse/determinism properties are identical to the `.rdd` path.
  */
object InternalRows {
  /** The DataFrame's executed-plan RDD of InternalRows (UnsafeRow-backed;
    * rows are REUSED per partition iterator — copy anything retained
    * across `next()` calls, e.g. group keys held in a map).
    */
  def toRdd(df: DataFrame): RDD[InternalRow] = df.queryExecution.toRdd

  /** Wrap an InternalRow RDD back into a DataFrame without per-row
    * conversion (the `private[sql]` twin of `createDataFrame`).
    */
  def fromRdd(spark: SparkSession, rdd: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.asInstanceOf[ClassicSession].internalCreateDataFrame(rdd, schema)
}
