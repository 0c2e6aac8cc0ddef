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
  /** SQL-standard `ntile(k)` recomputed from a global row number and the
    * frame's total row count — the scalable replacement for
    * `ntile(k) OVER (ORDER BY …)`, whose single-partition sort is the
    * thing [[rowNumber]] exists to avoid. Semantics are identical to
    * Spark's and DuckDB's ntile: with n rows, the first `n mod k` tiles
    * take `n/k + 1` rows, the rest `n/k` (the `q = 0` small-frame edge
    * falls out of the first branch, so the `/ q` in the second is never
    * evaluated there).
    */
  def ntileFromRowNumber(rn: Column, n: Column, k: Int): Column = {
    import org.apache.spark.sql.functions.{floor, when}
    // Spark's `/` on integer Columns is double division; floor() yields
    // the true integer quotient for nonnegative operands below 2^52 —
    // frames beyond 4.5e15 ROWS are out of envelope even at 100 TB.
    def idiv(a: Column, b: Column): Column = floor(a / b).cast(LongType)
    val q = idiv(n, org.apache.spark.sql.functions.lit(k))
    val r = n % k
    val cut = r * (q + 1)
    when(rn <= cut, idiv(rn - 1, q + 1) + 1)
      .otherwise(r + idiv(rn - cut - 1, q) + 1)
  }

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
