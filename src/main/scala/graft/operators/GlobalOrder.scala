package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Scalable global row numbering (cudf `sorted_order` — a total-order
  * argsort). A naive `row_number() OVER (ORDER BY …)` moves the entire
  * input into ONE partition; this operator computes the identical
  * numbers with a range repartition instead:
  *
  *   1. `repartitionByRange` on the full sort key → partitions hold
  *      disjoint, ordered key ranges; `sortWithinPartitions` orders
  *      each range locally (a per-partition sort, never a global one);
  *   2. `RDD.zipWithIndex` numbers the rows: it runs one lightweight
  *      counts job over the sorted RDD, derives per-partition offsets
  *      on the driver (#partitions longs), then streams each partition
  *      once attaching offset + local position.
  *
  * Determinism: both of zipWithIndex's jobs (the counts pass and the
  * data pass) execute over the SAME RDD instance, so the range
  * boundaries — sampled once when that RDD's shuffle materializes —
  * are fixed by construction; the second job reads the first job's
  * shuffle files rather than re-sampling. This is structurally
  * immune to the hazard a two-branch DataFrame formulation has, where
  * losing ReusedExchange (exchange-reuse disabled, AQE replanning a
  * branch) would let each branch re-sample boundaries with different
  * seeds and silently diverge.
  *
  * The output is LongType: at 100 TB the numbering passes 2^31 rows,
  * where an int would wrap silently under non-ANSI casts.
  *
  * Requires the sort key to be TOTAL (append a unique tiebreaker) —
  * equal keys could otherwise straddle a range boundary.
  */
object GlobalOrder {

  /** Appends `out` = 1-based global row number (LongType) of each row
    * under `order` (must be a total order).
    */
  def rowNumber(df: DataFrame, order: Seq[Column], out: String): DataFrame = {
    val sorted = df
      .repartitionByRange(order: _*)
      .sortWithinPartitions(order: _*)
    val outSchema = StructType(
      sorted.schema.fields :+ StructField(out, LongType, nullable = false))
    val numbered = sorted.rdd
      .zipWithIndex()
      .map { case (r, i) => Row.fromSeq(r.toSeq :+ (i + 1L)) }
    df.sparkSession.createDataFrame(numbered, outSchema)
  }
}
