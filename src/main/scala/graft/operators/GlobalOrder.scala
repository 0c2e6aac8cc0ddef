package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable global row numbering (cudf `sorted_order` — a total-order
  * argsort). A naive `row_number() OVER (ORDER BY …)` moves the entire
  * input into ONE partition; this operator computes the identical
  * numbers with a range repartition instead:
  *
  *   1. `repartitionByRange` on the full sort key → partitions hold
  *      disjoint, ordered key ranges;
  *   2. per-partition local `row_number` (window partitioned by the
  *      physical partition id — no data movement);
  *   3. partition offsets = running sum of partition counts, computed
  *      on the #partitions-row aggregate (the ONLY global window, over
  *      a bounded domain) and broadcast back;
  *   4. global number = offset + local number.
  *
  * Both aggregate and data branches read the SAME range exchange
  * (ReusedExchange), so the partition assignment the offsets were
  * computed from is exactly the one the data carries. Requires the
  * sort key to be TOTAL (append a unique tiebreaker) — equal keys
  * could otherwise straddle a range boundary.
  */
object GlobalOrder {

  /** Appends `out` = 1-based global row number of each row under
    * `order` (must be a total order).
    */
  def rowNumber(df: DataFrame, order: Seq[Column], out: String): DataFrame = {
    import org.apache.spark.TaskContext
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
    val idxSchema = StructType(df.schema.fields ++
      Seq(StructField("__pid", IntegerType), StructField("__local", IntegerType)))
    // Local numbering is a mapPartitions counter over the already-sorted
    // range partition — a window partitioned by __pid would re-shuffle
    // the full input a second time just to cluster what is already
    // clustered physically.
    val withIdx = df
      .repartitionByRange(order: _*)
      .sortWithinPartitions(order: _*)
      .mapPartitions { it =>
        val pid = TaskContext.getPartitionId()
        var i = 0
        it.map { r => i += 1; Row.fromSeq(r.toSeq :+ pid :+ i) }
      }(Encoders.row(idxSchema))
    val offsets = withIdx
      .groupBy(col("__pid"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__offset",
        coalesce(
          sum(col("__cnt")).over(
            Window.orderBy(col("__pid"))
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__pid"), col("__offset"))
    withIdx
      .join(broadcast(offsets), Seq("__pid"))
      .withColumn(out, (col("__offset") + col("__local")).cast("int"))
      .drop("__pid", "__local", "__offset")
  }
}
