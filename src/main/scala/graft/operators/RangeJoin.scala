package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join — probe points against [start, end) intervals —
  * via BUCKETING: intervals are exploded to the fixed-width buckets they
  * cover, probes map to their single bucket map-side, and the join is a
  * plain equi-join on the bucket key followed by the exact range filter.
  *
  * This is the standard big-data range-join shape: a raw inequality
  * join is a nested-loop (O(probes × intervals)); bucketing makes it a
  * hash join whose per-bucket fan-out is (interval span / bucketWidth)
  * — pick bucketWidth ≈ the typical span so each interval lands in
  * O(1) buckets. A probe matches an interval in exactly one bucket (its
  * own), so no post-join dedup is needed.
  */
object RangeJoin {

  /** probe(ptCol, …) ⋈ intervals(startCol, endCol, …) on
    * start <= pt < end. All three columns must be numeric (epoch days /
    * seconds / µs); `bucketWidth` in the same unit.
    */
  def joinRange(probe: DataFrame, intervals: DataFrame, ptCol: String,
      startCol: String, endCol: String, bucketWidth: Long): DataFrame = {
    val iv = intervals.withColumn("__bucket",
      explode(sequence(
        floor(col(startCol) / bucketWidth).cast("long"),
        // end is exclusive: a zero-length interval still covers its bucket
        floor((col(endCol) - 1) / bucketWidth).cast("long"))))
    val p = probe.withColumn("__bucket",
      floor(col(ptCol) / bucketWidth).cast("long"))
    p.join(iv, Seq("__bucket"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) < col(endCol))
      .drop("__bucket")
  }
}
