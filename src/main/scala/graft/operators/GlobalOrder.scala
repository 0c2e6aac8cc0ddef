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

  /** Appends `out` = 1-based row number (LongType) WITHIN each `group`
    * under `order` — the scalable replacement for
    * `row_number() OVER (PARTITION BY boundedKey ORDER BY …)` when the
    * partition key's cardinality does NOT grow with the data (returnflag,
    * market segment, class label, …): a plain Window then funnels an
    * SF-scaled frame through a handful of tasks, one per key value.
    *
    * Shape: one [[rowNumber]] range-partitioned global numbering over
    * (group ++ order), then a per-group min-offset — ONE row per group,
    * broadcast back — subtracted out. No task ever holds more than a
    * range slice. Contract: `group` is bounded-cardinality (the offsets
    * frame is broadcast); for partition keys that scale with the data a
    * plain Window is already the right tool. `group ++ order` must be a
    * total order (append a unique tiebreaker).
    */
  def groupedRowNumber(
      df: DataFrame,
      group: Seq[String],
      order: Seq[Column],
      out: String): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col, lit, min}
    val tmp = s"__${out}_glob"
    val off = s"__${out}_off"
    val numbered = rowNumber(df, group.map(col) ++ order, tmp)
    val offs = numbered.groupBy(group.map(col): _*).agg(min(col(tmp)).as(off))
    numbered
      .join(broadcast(offs), group)
      .withColumn(out, col(tmp) - col(off) + lit(1L))
      .drop(tmp, off)
  }

  /** Appends `out` = running sum (LongType) of `value` WITHIN each
    * `group` under `order` — the scalable replacement for
    * `sum(v) OVER (PARTITION BY boundedKey ORDER BY … ROWS UNBOUNDED
    * PRECEDING)` on bounded-cardinality keys. The classic distributed
    * prefix scan:
    *
    *   1. range repartition on (group ++ order) + per-partition sort —
    *      partitions hold disjoint contiguous key ranges;
    *   2. a lightweight pass collects per-(partition, group) subtotals —
    *      ranges are contiguous, so the collected size is bounded by
    *      #partitions + #groups, never by the data;
    *   3. the driver derives each (partition, group)'s starting offset
    *      (sum of the same group's subtotals in earlier partitions) and
    *      broadcasts the map; a second pass streams each partition once,
    *      accumulating locally on top of the offset.
    *
    * Determinism: both jobs run over the SAME RDD instance, so the range
    * boundaries are sampled once and the second job reuses the first's
    * shuffle files (the [[rowNumber]] argument). Contract: `value` is
    * non-null integral (cast to Long), `group ++ order` a total order,
    * `group` bounded-cardinality.
    */
  def groupedCumSum(
      df: DataFrame,
      group: Seq[String],
      order: Seq[Column],
      value: Column,
      out: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    val vTmp = s"__${out}_v"
    val keyed = df.withColumn(vTmp, value.cast(LongType))
    val sorted = keyed
      .repartitionByRange((group.map(col) ++ order): _*)
      .sortWithinPartitions((group.map(col) ++ order): _*)
    val gIdx = group.map(sorted.schema.fieldIndex)
    val vIdx = sorted.schema.fieldIndex(vTmp)
    val rdd = sorted.rdd
    val partials: Array[(Int, Seq[Any], Long)] = rdd
      .mapPartitionsWithIndex { (pi, it) =>
        val sums = scala.collection.mutable.LinkedHashMap.empty[Seq[Any], Long]
        it.foreach { r =>
          val k = gIdx.map(r.get)
          sums.update(k, sums.getOrElse(k, 0L) + r.getLong(vIdx))
        }
        sums.iterator.map { case (k, s) => (pi, k, s) }
      }
      .collect()
    val byGroup = partials.groupBy(_._2)
    val offsets: Map[(Int, Seq[Any]), Long] = partials.map { case (pi, k, _) =>
      ((pi, k), byGroup(k).iterator.filter(_._1 < pi).map(_._3).sum)
    }.toMap
    val bc = df.sparkSession.sparkContext.broadcast(offsets)
    val outSchema = StructType(
      sorted.schema.fields :+ StructField(out, LongType, nullable = false))
    val scanned = rdd.mapPartitionsWithIndex { (pi, it) =>
      var curK: Seq[Any] = null
      var run = 0L
      it.map { r =>
        val k = gIdx.map(r.get)
        if (k != curK) {
          curK = k
          run = bc.value.getOrElse((pi, k), 0L)
        }
        run += r.getLong(vIdx)
        Row.fromSeq(r.toSeq :+ run)
      }
    }
    df.sparkSession.createDataFrame(scanned, outSchema).drop(vTmp)
  }
}
