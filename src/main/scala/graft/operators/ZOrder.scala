package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) multi-column clustering for data layout — the
  * file-skipping technique behind Delta/Iceberg `OPTIMIZE ZORDER BY`.
  *
  * A table range-partitioned and sorted by ONE key gives perfect parquet
  * min/max pruning on that key and none on any other. Interleaving the
  * bits of k keys into one Morton code and laying files out along that
  * code gives every key a share of the pruning power: each file covers a
  * hyper-rectangle of the key space, so a selective predicate on ANY of
  * the k columns overlaps only ~N^((k-1)/k) of N files instead of all of
  * them. At 100 TB this is a write-once layout decision that turns
  * full-corpus scans into partial ones for every dimension a reader
  * filters on; the scan-side benefit needs no reader cooperation beyond
  * ordinary parquet row-group/file statistics pruning.
  *
  * The bit-interleave is pure integer arithmetic (shift/and/or), so it
  * stays inside whole-stage codegen on the Spark side and is expressible
  * verbatim in ANSI SQL for the DuckDB oracle (Q:`conv_zorder`).
  */
object ZOrder {

  /** Morton spread of the low 16 bits of `c` into the even bit positions
    * of a 32-bit lane (the classic magic-mask doubling sequence).
    */
  private def spread16(c: Column): Column = {
    val x0 = c.cast("long").bitwiseAND(lit(0xFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333L))
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two non-negative integer columns (low 16 bits
    * of each; callers normalize wider domains first — see [[clusterByZ]]).
    * `a`'s bits land in even positions, `b`'s in odd.
    */
  def zValue2(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** General n-dimension Morton code: bit i of column k lands at position
    * i*n + k. Emits 16·n shift/and/or terms — still a single codegen'd
    * projection, used for n >= 3 where no magic-mask sequence applies.
    */
  def zValueN(cols: Seq[Column], bitsPerDim: Int = 16): Column = {
    require(cols.nonEmpty && bitsPerDim * cols.length <= 63,
      s"z-value must fit a long: ${cols.length} dims x $bitsPerDim bits")
    val n = cols.length
    val terms = for {
      (c, k) <- cols.zipWithIndex
      i <- 0 until bitsPerDim
    } yield shiftleft(
      shiftrightunsigned(c.cast("long"), i).bitwiseAND(lit(1L)), i * n + k)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Cluster `df` into `numFiles` output partitions along the Morton
    * curve of `cols`: each column is first normalized to a 16-bit code by
    * width-bucketing its [min, max] range (one bounded stats job — the
    * same sample-then-layout shape Delta's OPTIMIZE uses), codes are
    * interleaved, and rows are range-partitioned + sorted by the code so
    * every output file covers one compact z-range (= one hyper-rectangle
    * of the key space, tight parquet min/max stats on every key).
    *
    * Write the result with `.write.parquet(...)` — sortWithinPartitions
    * survives the file write, so per-file column stats stay tight.
    */
  def clusterByZ(df: DataFrame, cols: Seq[String], numFiles: Int): DataFrame = {
    require(cols.size >= 2, "z-order needs at least two columns")
    // Code width must match the interleave width: for n >= 4 only
    // 63/n < 16 bits per dimension fit a long, so normalize into exactly
    // that many bits — bucketing to 16 bits and interleaving fewer would
    // silently drop each code's high bits (opposite halves of a column's
    // range would collide and the layout/pruning contract would break).
    val bitsPerDim = (63 / cols.size).min(16)
    val buckets = 1L << bitsPerDim
    val aggExprs =
      cols.flatMap(c => Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val stats = df.agg(aggExprs.head, aggExprs.tail: _*).head()
    val codes = cols.zipWithIndex.map { case (c, i) =>
      // empty input or all-null column → no range; treat as constant
      if (stats.isNullAt(2 * i) || stats.isNullAt(2 * i + 1)) lit(0L)
      else {
        val (mn, mx) = (stats.getDouble(2 * i), stats.getDouble(2 * i + 1))
        if (mx <= mn) lit(0L) // degenerate constant column
        // width_bucket is 1-based and right-open per bucket; +1 on the max
        // keeps the max value inside the top bucket rather than overflowing
        else (width_bucket(col(c).cast("double"), lit(mn), lit(mx + 1), lit(buckets)) - 1)
          .cast("long")
      }
    }
    val z = if (codes.size == 2) zValue2(codes(0), codes(1))
            else zValueN(codes, bitsPerDim)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
