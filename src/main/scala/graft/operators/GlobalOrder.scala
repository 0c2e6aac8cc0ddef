package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.graftbridge.InternalRows
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
    // InternalRow end to end (r21): `sorted.rdd` deserialized every row
    // to an external Row and `createDataFrame` converted each back —
    // two full per-row materializations around a pass that only APPENDS
    // one long. zipWithIndex's two jobs (counts + data) run over the
    // same Tungsten rows now; the appended column rides a JoinedRow
    // through one UnsafeProjection per partition.
    val outTypes = outSchema.fields.map(_.dataType)
    val numbered = InternalRows.toRdd(sorted)
      .zipWithIndex()
      .mapPartitions { it =>
        val proj = UnsafeProjection.create(outTypes)
        val joined = new JoinedRow
        val extra = new GenericInternalRow(1)
        it.map { case (r, i) =>
          extra.update(0, i + 1L)
          proj(joined(r, extra)): InternalRow
        }
      }
    InternalRows.fromRdd(df.sparkSession, numbered, outSchema)
  }

  /** Guard on the grouped-scan contract: the offsets map collected to
    * the driver is #partitions × #groups entries, so `group` must be
    * bounded-cardinality (returnflag, market segment, class label, …).
    * Exceeding this cap fails fast with a pointer to the right tool —
    * for partition keys that SCALE with the data a plain Window is
    * already correct (its per-key frames stay small).
    */
  val defaultMaxGroups: Int = 4096

  /** First name in `base`, `base_1`, `base_2`, … absent from `df` —
    * temp columns must never silently replace a like-named input column
    * (withColumn overwrites; the original data would be lost).
    */
  private def fresh(df: DataFrame, base: String): String =
    Iterator.from(0)
      .map(i => if (i == 0) base else s"${base}_$i")
      .find(n => !df.columns.contains(n))
      .get

  /** Shared distributed grouped prefix scan. Both jobs (the subtotal
    * collect and the data pass) run over the SAME RDD instance, so the
    * range boundaries — sampled once when that RDD's shuffle
    * materializes — are fixed by construction and the second job reads
    * the first's shuffle files rather than re-sampling.
    *
    * Null group keys are ordinary values here (they range-sort together
    * and form their own `Seq(null, …)` map key), matching
    * `PARTITION BY k`'s treatment of null as a valid partition — no
    * join is involved, so there is no null-dropping hazard.
    */
  private def scanCore(
      df: DataFrame,
      group: Seq[String],
      order: Seq[Column],
      out: String,
      maxGroups: Int,
      totOut: Option[String] = None)(
      mkValue: StructType => InternalRow => Long): DataFrame = {
    import org.apache.spark.sql.functions.col
    require(!df.columns.contains(out),
      s"groupedScan: output column '$out' already exists in the input")
    totOut.foreach(t => require(!df.columns.contains(t) && t != out,
      s"groupedScan: total column '$t' collides with an existing column"))
    val sorted = df
      .repartitionByRange((group.map(col) ++ order): _*)
      .sortWithinPartitions((group.map(col) ++ order): _*)
    val schema = sorted.schema
    val gIdx = group.map(schema.fieldIndex).toArray
    val gTypes = gIdx.map(i => schema.fields(i).dataType)
    val valueAt = mkValue(schema)
    // InternalRow end to end (r21): both jobs previously deserialized
    // every row to an external Row (`sorted.rdd`) and the data pass
    // re-converted each output via `createDataFrame` — per-row
    // materializations that dominated the operator's wall next to the
    // one range exchange. Same RDD instance for both jobs (the
    // determinism contract above is unchanged); group-key values are
    // COPIED out of the reused UnsafeRow buffer before being held
    // across rows (map keys, curK).
    val rdd = InternalRows.toRdd(sorted)
    val groupDesc = group.mkString("(", ",", ")")
    // Extract the (copied) group key of the current row — buffer-backed
    // values (UTF8String) must not be retained across next() calls.
    def keyAt(r: InternalRow): Seq[Any] = {
      val a = new Array[Any](gIdx.length)
      var j = 0
      while (j < gIdx.length) {
        a(j) = InternalRow.copyValue(r.get(gIdx(j), gTypes(j)))
        j += 1
      }
      scala.collection.immutable.ArraySeq.unsafeWrapArray(a)
    }
    // The cap is enforced INSIDE the task, before anything reaches the
    // driver: a partition that sees > maxGroups distinct keys throws in
    // the executor, so a mistakenly SF-scaled group key fails the job
    // with this message instead of first materializing an SF-scaled
    // `.collect()` on the driver (the hazard the cap exists to prevent).
    // This bounds the collect below to ≤ #partitions × maxGroups tuples.
    // Range partitioning puts each group in a contiguous run, so a key
    // whose cardinality scales with the data necessarily overflows
    // individual partitions, not just the global count.
    val partials: Array[(Int, Seq[Any], Long)] = rdd
      .mapPartitionsWithIndex { (pi, it) =>
        val sums = scala.collection.mutable.LinkedHashMap.empty[Seq[Any], Long]
        it.foreach { r =>
          val k = keyAt(r)
          if (!sums.contains(k) && sums.size >= maxGroups)
            throw new IllegalArgumentException(
              s"groupedScan: $groupDesc exceeds maxGroups=$maxGroups " +
                s"distinct values within one range partition; this operator " +
                "is for bounded-cardinality keys — for keys that scale with " +
                "the data use a plain PARTITION BY Window, whose per-key " +
                "frames stay small")
          sums.update(k, sums.getOrElse(k, 0L) + valueAt(r))
        }
        sums.iterator.map { case (k, s) => (pi, k, s) }
      }
      .collect()
    // Exact global check — the executor-side cap only bounds what any one
    // partition may contribute; a key just over the cap but spread thinly
    // across partitions is caught here, after a collect that the task-side
    // cap has already bounded to a harmless size.
    val nGroups = partials.iterator.map(_._2).toSet.size
    require(nGroups <= maxGroups,
      s"groupedScan: $groupDesc has $nGroups distinct " +
        s"values (> maxGroups=$maxGroups); this operator is for " +
        "bounded-cardinality keys — for keys that scale with the data use " +
        "a plain PARTITION BY Window, whose per-key frames stay small")
    val byGroup = partials.groupBy(_._2)
    val offsets: Map[(Int, Seq[Any]), Long] = partials.map { case (pi, k, _) =>
      ((pi, k), byGroup(k).iterator.filter(_._1 < pi).map(_._3).sum)
    }.toMap
    val bc = df.sparkSession.sparkContext.broadcast(offsets)
    // Group TOTALS fall out of the same partials for free — when the
    // caller wants them (weighted median's half-weight threshold), ride
    // them through the same pass instead of paying a separate
    // whole-input aggregate + broadcast join downstream.
    val bcTot = totOut.map { _ =>
      df.sparkSession.sparkContext.broadcast(
        byGroup.map { case (k, ps) => (k, ps.iterator.map(_._3).sum) })
    }
    val outSchema = StructType(
      schema.fields ++ (
        StructField(out, LongType, nullable = false) +:
          totOut.map(StructField(_, LongType, nullable = false)).toSeq))
    val outTypes = outSchema.fields.map(_.dataType)
    val nExtra = if (totOut.isDefined) 2 else 1
    val scanned = rdd.mapPartitionsWithIndex { (pi, it) =>
      val proj = UnsafeProjection.create(outTypes)
      val joined = new JoinedRow
      val extra = new GenericInternalRow(nExtra)
      var curK: Seq[Any] = null
      var seen = false
      var run = 0L
      var tot = 0L
      it.map { r =>
        val k = keyAt(r)
        if (!seen || k != curK) {
          seen = true
          curK = k
          run = bc.value.getOrElse((pi, k), 0L)
          bcTot.foreach(b => tot = b.value.getOrElse(k, 0L))
        }
        run += valueAt(r)
        extra.update(0, run)
        if (nExtra == 2) extra.update(1, tot)
        proj(joined(r, extra)): InternalRow
      }
    }
    InternalRows.fromRdd(df.sparkSession, scanned, outSchema)
  }

  /** Appends `out` = 1-based row number (LongType) WITHIN each `group`
    * under `order` — the scalable replacement for
    * `row_number() OVER (PARTITION BY boundedKey ORDER BY …)` when the
    * partition key's cardinality does NOT grow with the data (returnflag,
    * market segment, class label, …): a plain Window there funnels an
    * SF-scaled frame through a handful of tasks, one per key value.
    *
    * Implemented as the grouped prefix scan of the constant 1 — a range
    * repartition on (group ++ order) so no task ever holds more than a
    * range slice, one lightweight per-(partition, group) count collect
    * (bounded by #partitions × #groups — enforced via `maxGroups`), and
    * one streaming pass attaching offsets. Null group keys are kept and
    * numbered as their own partition, exactly like `PARTITION BY`.
    * Contract: `group ++ order` must be a total order (append a unique
    * tiebreaker) for the numbering of tied rows to be deterministic.
    */
  def groupedRowNumber(
      df: DataFrame,
      group: Seq[String],
      order: Seq[Column],
      out: String,
      maxGroups: Int = defaultMaxGroups): DataFrame =
    scanCore(df, group, order, out, maxGroups)(_ => _ => 1L)

  /** [[groupedRowNumber]] that ALSO appends `nOut` = the group's total
    * row count, riding the partials the scan already collects (r21, the
    * [[groupedCumSumWithTotal]] free-total mechanism with value = 1):
    * every `ntile`/percentile consumer previously paid a separate
    * whole-input count aggregate plus a broadcast join to get n.
    */
  def groupedRowNumberWithCount(
      df: DataFrame,
      group: Seq[String],
      order: Seq[Column],
      out: String,
      nOut: String,
      maxGroups: Int = defaultMaxGroups): DataFrame =
    scanCore(df, group, order, out, maxGroups, Some(nOut))(_ => _ => 1L)

  /** Appends `out` = running sum (LongType) of `value` WITHIN each
    * `group` under `order` — the scalable replacement for
    * `sum(v) OVER (PARTITION BY boundedKey ORDER BY … ROWS UNBOUNDED
    * PRECEDING)` on bounded-cardinality keys (see [[groupedRowNumber]]
    * for the shape and the null-group-key semantics).
    *
    * Fail-fast contract enforcement (the doc-comment-only contract was
    * a silent-wrong-answer hazard): `value` must resolve to an integral
    * type — a fractional input would be silently truncated by the Long
    * cast — and must be non-null on every row (a window `sum` skips
    * nulls; a prefix scan that treated null as 0 would silently diverge
    * from it in the all-null-prefix edge, so nulls are rejected instead;
    * pre-coalesce explicitly if that is the intent).
    */
  def groupedCumSum(
      df: DataFrame,
      group: Seq[String],
      order: Seq[Column],
      value: Column,
      out: String,
      maxGroups: Int = defaultMaxGroups): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, ShortType}
    val vType = df.select(value).schema.head.dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(vType),
      s"groupedCumSum: value must be integral (got $vType); cast explicitly " +
        "to a fixed-point long if fractional input is intended")
    val vTmp = fresh(df, s"__${out}_v")
    val keyed = df.withColumn(vTmp, value.cast(LongType))
    scanCore(keyed, group, order, out, maxGroups) { schema =>
      val vIdx = schema.fieldIndex(vTmp)
      r =>
        if (r.isNullAt(vIdx))
          throw new IllegalArgumentException(
            "groupedCumSum: null value encountered — the contract requires " +
              "non-null integral values (coalesce first if null means 0)")
        else r.getLong(vIdx)
    }.drop(vTmp)
  }

  /** [[groupedCumSum]] that ALSO appends `totOut` = the group's total of
    * `value` — at zero extra passes: the totals are the column sums of
    * the per-(partition, group) partials the scan already collects, so a
    * "cumulative share of group total" consumer (weighted median's
    * half-weight threshold, CDF normalization) skips the separate
    * whole-input aggregate AND the broadcast join of the scanned frame
    * it would otherwise pay. Unlike that join formulation, null group
    * keys keep their rows here (scanCore treats null as an ordinary
    * partition value, exactly like `PARTITION BY`).
    */
  def groupedCumSumWithTotal(
      df: DataFrame,
      group: Seq[String],
      order: Seq[Column],
      value: Column,
      out: String,
      totOut: String,
      maxGroups: Int = defaultMaxGroups): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, ShortType}
    val vType = df.select(value).schema.head.dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(vType),
      s"groupedCumSum: value must be integral (got $vType); cast explicitly " +
        "to a fixed-point long if fractional input is intended")
    val vTmp = fresh(df, s"__${out}_v")
    val keyed = df.withColumn(vTmp, value.cast(LongType))
    scanCore(keyed, group, order, out, maxGroups, Some(totOut)) { schema =>
      val vIdx = schema.fieldIndex(vTmp)
      r =>
        if (r.isNullAt(vIdx))
          throw new IllegalArgumentException(
            "groupedCumSum: null value encountered — the contract requires " +
              "non-null integral values (coalesce first if null means 0)")
        else r.getLong(vIdx)
    }.drop(vTmp)
  }

  /** Crossing-partition order-statistic lookup (r22): per bounded group,
    * the `order`-column VALUE at each requested cumulative-weight target —
    * `stat_i(g)` = the value of the first row (in ascending `order` within
    * the group) whose running `weight` sum reaches `targets(tot_g)(i)`.
    * With `weight = 1` this is the nearest-rank order statistic (p01/p99
    * winsorize bounds); with a real weight it is the weighted-quantile
    * crossing row (weighted median at target ceil(tot/2)).
    *
    * Why it exists: every consumer of [[groupedCumSum]]-style scans that
    * only needs K VALUES per group (not a per-row output) still paid the
    * full machinery — a per-partition sort of every range partition in
    * BOTH RDD jobs, a second full streaming pass appending columns, and a
    * downstream filter+aggregate over the whole frame. The partials the
    * first job collects already tell the driver WHICH range partition
    * holds each group's crossing, so:
    *
    *   1. range-exchange on (group, order) with NO per-partition sort —
    *      the first job only sums weights per (partition, group), which
    *      is order-free;
    *   2. the driver locates, per group and target, the one partition
    *      whose weight span contains the target, with the exact prefix
    *      carried in;
    *   3. a [[org.apache.spark.rdd.PartitionPruningRDD]] second job
    *      touches ONLY those partitions (≤ #groups × #targets of them,
    *      usually far fewer), sorts each pruned partition's (value,
    *      weight) pairs in-task — Spark's interpreted ordering for the
    *      column's type, so the order matches `sortWithinPartitions`
    *      exactly — and walks to the crossing values.
    *
    * The full partitions never sort and never re-stream; the result is a
    * driver-assembled bounded frame (≤ maxGroups rows — the same bound
    * the offsets collect always had), computed from the parquet input on
    * every invocation.
    *
    * Contracts: `weight` must be integral, non-null and strictly positive
    * (a zero weight could make the crossing row ambiguous under ties);
    * `order` values must be non-null; each target must lie in
    * [1, tot_g]. Output value equality with the sorted-scan formulation
    * is tie-invariant by construction: rows with equal `order` values
    * form one run, and any crossing inside the run reports the run's
    * value regardless of intra-run order. Same determinism (both jobs
    * over ONE RDD instance) and maxGroups contracts as [[scanCore]].
    */
  def groupedOrderStats(
      df: DataFrame,
      group: Seq[String],
      order: Column,
      weight: Column,
      statNames: Seq[String],
      targets: Long => Seq[Long],
      totOut: String,
      maxGroups: Int = defaultMaxGroups): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{ByteType, IntegerType, ShortType}
    require(statNames.nonEmpty, "groupedOrderStats: statNames must be non-empty")
    require((group :+ totOut).intersect(statNames).isEmpty &&
      statNames.distinct.size == statNames.size && !group.contains(totOut),
      "groupedOrderStats: output column names must be distinct from each " +
        "other and from the group columns")
    val vTmp = fresh(df, "__os_v")
    val wTmp = fresh(df.withColumn(vTmp, order), "__os_w")
    val keyed = df
      .select(group.map(col) :+ order.as(vTmp) :+ weight.as(wTmp): _*)
    val wType = keyed.schema(wTmp).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(wType),
      s"groupedOrderStats: weight must be integral (got $wType)")
    val projected = keyed
      .select(group.map(col) :+ col(vTmp) :+ col(wTmp).cast(LongType): _*)
    // Range exchange WITHOUT sortWithinPartitions: the partials job sums
    // weights (order-free), and only the pruned crossing partitions ever
    // sort — in-task, below.
    val parted = projected.repartitionByRange(group.map(col) :+ col(vTmp): _*)
    val schema = parted.schema
    val gIdx = group.map(schema.fieldIndex).toArray
    val gTypes = gIdx.map(i => schema.fields(i).dataType)
    val vIdx = schema.fieldIndex(vTmp)
    val vType = schema.fields(vIdx).dataType
    val wIdx = schema.fieldIndex(wTmp)
    val rdd = InternalRows.toRdd(parted)
    val groupDesc = group.mkString("(", ",", ")")
    def keyAt(r: InternalRow): Seq[Any] = {
      val a = new Array[Any](gIdx.length)
      var j = 0
      while (j < gIdx.length) {
        a(j) = InternalRow.copyValue(r.get(gIdx(j), gTypes(j)))
        j += 1
      }
      scala.collection.immutable.ArraySeq.unsafeWrapArray(a)
    }
    // Job 1: per-(partition, group) weight sums — identical cap/validate
    // discipline to scanCore (executor-side cap first, global check after).
    val partials: Array[(Int, Seq[Any], Long)] = rdd
      .mapPartitionsWithIndex { (pi, it) =>
        val sums = scala.collection.mutable.LinkedHashMap.empty[Seq[Any], Long]
        it.foreach { r =>
          if (r.isNullAt(wIdx) || r.getLong(wIdx) <= 0L)
            throw new IllegalArgumentException(
              "groupedOrderStats: weight must be non-null and > 0 on every row")
          if (r.isNullAt(vIdx))
            throw new IllegalArgumentException(
              "groupedOrderStats: order value must be non-null on every row")
          val k = keyAt(r)
          if (!sums.contains(k) && sums.size >= maxGroups)
            throw new IllegalArgumentException(
              s"groupedOrderStats: $groupDesc exceeds maxGroups=$maxGroups " +
                "distinct values within one range partition; this operator " +
                "is for bounded-cardinality keys")
          sums.update(k, sums.getOrElse(k, 0L) + r.getLong(wIdx))
        }
        sums.iterator.map { case (k, s) => (pi, k, s) }
      }
      .collect()
    val byGroup = partials.groupBy(_._2)
    require(byGroup.size <= maxGroups,
      s"groupedOrderStats: $groupDesc has ${byGroup.size} distinct values " +
        s"(> maxGroups=$maxGroups)")
    // Driver: locate each (group, target)'s crossing partition + the
    // exact weight prefix carried into it.
    val k = statNames.size
    // lookups(pi) = list of (group, targetIdx, target, prefixIntoPartition)
    val lookups = scala.collection.mutable.Map
      .empty[Int, List[(Seq[Any], Int, Long, Long)]]
    val totals = scala.collection.mutable.Map.empty[Seq[Any], Long]
    byGroup.foreach { case (g, ps) =>
      val inOrder = ps.sortBy(_._1)
      val tot = inOrder.iterator.map(_._3).sum
      totals.update(g, tot)
      val ts = targets(tot)
      require(ts.size == k,
        s"groupedOrderStats: targets returned ${ts.size} values, expected $k")
      ts.zipWithIndex.foreach { case (t, ti) =>
        require(t >= 1L && t <= tot,
          s"groupedOrderStats: target $t outside [1, $tot] for group $g")
        var prefix = 0L
        var placed = false
        inOrder.iterator.takeWhile(_ => !placed).foreach { case (pi, _, s) =>
          if (prefix + s >= t) {
            lookups.update(pi, (g, ti, t, prefix) :: lookups.getOrElse(pi, Nil))
            placed = true
          } else prefix += s
        }
        assert(placed, s"groupedOrderStats: target $t not placed (bug)")
      }
    }
    val needed = lookups.keySet.toSet
    val bcLookups = df.sparkSession.sparkContext.broadcast(lookups.toMap)
    // Job 2: pruned to the crossing partitions only; each task buffers
    // the (value, weight) pairs of the groups it owes answers for, sorts
    // them with Spark's interpreted ordering for the column type (the
    // exact `sortWithinPartitions` order), and walks to the crossings.
    val ord = org.apache.spark.sql.catalyst.util.TypeUtils
      .getInterpretedOrdering(vType)
    // PartitionPruningRDD RENUMBERS partitions (0..m-1 over the kept
    // set), so the lookup keys — PARENT partition indices — must ride
    // with the rows: a narrow per-row tag evaluated only on the kept
    // partitions (pruning a narrow child prunes the parent).
    val tagged = rdd.mapPartitionsWithIndex(
      (pi, it) => it.map(r => (pi, r)), preservesPartitioning = true)
    val pruned = org.apache.spark.rdd.PartitionPruningRDD
      .create(tagged, needed.contains)
    // (group, targetIdx, value) — ≤ #groups × k rows total
    val found: Array[(Seq[Any], Int, Any)] = pruned
      .mapPartitions { it0 =>
        if (!it0.hasNext) Iterator.empty
        else {
          val buffered = it0.buffered
          val pi = buffered.head._1
          val it = buffered.map(_._2)
          val mine = bcLookups.value.getOrElse(pi, Nil)
          if (mine.isEmpty) Iterator.empty
          else {
          val wanted = mine.map(_._1).toSet
          val buf = scala.collection.mutable
            .Map.empty[Seq[Any], scala.collection.mutable.ArrayBuffer[(Any, Long)]]
          it.foreach { r =>
            val g = keyAt(r)
            if (wanted.contains(g))
              buf.getOrElseUpdate(g,
                scala.collection.mutable.ArrayBuffer.empty[(Any, Long)])
                .append((InternalRow.copyValue(r.get(vIdx, vType)), r.getLong(wIdx)))
          }
          mine.groupBy(_._1).iterator.flatMap { case (g, reqs) =>
            val rows = buf(g).sortBy(_._1)(ord)
            // targets ascending; one walk answers all of this group's
            // requests that landed in this partition
            val asc = reqs.sortBy(_._3)
            var cum = 0L
            var i = 0
            val out = scala.collection.mutable.ArrayBuffer.empty[(Seq[Any], Int, Any)]
            var ri = 0
            while (ri < asc.length) {
              val (_, ti, t, prefix) = asc(ri)
              val rel = t - prefix // target within this partition's span
              while (cum < rel && i < rows.length) {
                cum += rows(i)._2
                i += 1
              }
              assert(i > 0 && cum >= rel,
                "groupedOrderStats: crossing row not found (bug)")
              out.append((g, ti, rows(i - 1)._1))
              ri += 1
            }
            out.iterator
          }
          }
        }
      }
      .collect()
    // Assemble the bounded result frame on the driver (external values —
    // this frame is ≤ maxGroups rows by construction).
    val statsByGroup = found.groupBy(_._1)
      .map { case (g, rs) => (g, rs.map(r => r._2 -> r._3).toMap) }
    val outSchema = StructType(
      gIdx.zipWithIndex.map { case (fi, j) =>
        StructField(group(j), schema.fields(fi).dataType,
          schema.fields(fi).nullable) } ++
        (StructField(totOut, LongType, nullable = false) +:
          statNames.map(n => StructField(n, vType, nullable = false))))
    val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
      .createToScalaConverter(outSchema)
    val rows: Seq[org.apache.spark.sql.Row] = byGroup.keys.toSeq.map { g =>
      val stats = statsByGroup(g)
      val vals: Seq[Any] = g ++ (totals(g) +: (0 until k).map(stats))
      conv(InternalRow.fromSeq(vals)).asInstanceOf[org.apache.spark.sql.Row]
    }
    import scala.jdk.CollectionConverters._
    df.sparkSession.createDataFrame(rows.asJava, outSchema)
  }

  /** One-pass grouped RANK FAMILY (r21): appends, WITHIN each `group`
    * under the total order `tieKeys ++ tiebreak`,
    *
    *   - `rowOut`   = row_number() (1-based, LongType),
    *   - `rankOut`  = rank()       (the tie run's head row number),
    *   - `denseOut` = dense_rank() (1-based tie-run index),
    *
    * where a "tie run" is a maximal run of equal `tieKeys` values —
    * exactly `rank()/dense_rank() OVER (PARTITION BY group ORDER BY
    * tieKeys)` with `tiebreak` making the scan order total.
    *
    * Why it exists: building the family from [[groupedRowNumber]] took a
    * second numbering pass over `distinct(group ++ tieKeys)`, a
    * tie-group Window (its own exchange) and a null-safe join back.
    * This computes all three columns in the SAME two jobs the plain
    * numbering pays, with boundary-aware partials: each partition
    * reports, per group, its row count, naive run count, first/last tie
    * key and tail-run length; the driver stitches runs that straddle a
    * range boundary (possible — only `group ++ tieKeys ++ tiebreak` is
    * total, so equal tie keys may split) by walking partitions in order
    * per group: a partition whose first tie key equals its predecessor's
    * last merges its first run (dense −1) and inherits the run-head row
    * number through the accumulated carry length.
    *
    * Same determinism/maxGroups/null-key contracts as [[scanCore]].
    */
  def groupedRankFamily(
      df: DataFrame,
      group: Seq[String],
      tieKeys: Seq[Column],
      tiebreak: Seq[Column],
      rowOut: String,
      rankOut: String,
      denseOut: String,
      maxGroups: Int = defaultMaxGroups): DataFrame = {
    import org.apache.spark.sql.functions.col
    Seq(rowOut, rankOut, denseOut).foreach(o => require(
      !df.columns.contains(o), s"groupedRankFamily: output column '$o' " +
        "already exists in the input"))
    require(Seq(rowOut, rankOut, denseOut).distinct.size == 3,
      "groupedRankFamily: output column names must be distinct")
    // Tie keys must be plain input columns so the partials can read them
    // by index; project computed ones first.
    val tieTmp = tieKeys.zipWithIndex.map { case (_, i) => fresh(df, s"__tie_$i") }
    val keyed = tieKeys.zip(tieTmp).foldLeft(df) {
      case (d, (c, n)) => d.withColumn(n, c)
    }
    val order = tieTmp.map(col) ++ tiebreak
    val sorted = keyed
      .repartitionByRange((group.map(col) ++ order): _*)
      .sortWithinPartitions((group.map(col) ++ order): _*)
    val schema = sorted.schema
    val gIdx = group.map(schema.fieldIndex).toArray
    val gTypes = gIdx.map(i => schema.fields(i).dataType)
    val tIdx = tieTmp.map(schema.fieldIndex).toArray
    val tTypes = tIdx.map(i => schema.fields(i).dataType)
    val rdd = InternalRows.toRdd(sorted)
    val groupDesc = group.mkString("(", ",", ")")
    def keyOf(r: InternalRow, idx: Array[Int], dts: Array[org.apache.spark.sql.types.DataType]): Seq[Any] = {
      val a = new Array[Any](idx.length)
      var j = 0
      while (j < idx.length) {
        a(j) = InternalRow.copyValue(r.get(idx(j), dts(j)))
        j += 1
      }
      scala.collection.immutable.ArraySeq.unsafeWrapArray(a)
    }
    // Per-(partition, group) partials: rows, naive run count, first/last
    // tie key, and the tail run's length (rows of the partition's final
    // run). LinkedHashMap keeps group-arrival order (not required, but
    // deterministic).
    final case class Part(pi: Int, g: Seq[Any], rows: Long, runs: Long,
        firstTie: Seq[Any], lastTie: Seq[Any], tailRunLen: Long)
    val partials: Array[Part] = rdd
      .mapPartitionsWithIndex { (pi, it) =>
        val acc = scala.collection.mutable.LinkedHashMap
          .empty[Seq[Any], (Long, Long, Seq[Any], Seq[Any], Long)]
        var curG: Seq[Any] = null
        var curT: Seq[Any] = null
        var rows = 0L; var runs = 0L; var firstT: Seq[Any] = null
        var tail = 0L
        def flush(): Unit = if (curG != null) {
          acc.update(curG, (rows, runs, firstT, curT, tail))
        }
        it.foreach { r =>
          val g = keyOf(r, gIdx, gTypes)
          val t = keyOf(r, tIdx, tTypes)
          if (curG == null || g != curG) {
            flush()
            if (!acc.contains(g) && acc.size >= maxGroups)
              throw new IllegalArgumentException(
                s"groupedRankFamily: $groupDesc exceeds maxGroups=" +
                  s"$maxGroups distinct values within one range " +
                  "partition; this operator is for bounded-cardinality " +
                  "keys — use a plain PARTITION BY Window for keys that " +
                  "scale with the data")
            curG = g; curT = t; rows = 0L; runs = 1L; firstT = t; tail = 0L
          } else if (t != curT) {
            curT = t; runs += 1L; tail = 0L
          }
          rows += 1L; tail += 1L
        }
        flush()
        acc.iterator.map { case (g, (rw, rn, ft, lt, tl)) =>
          Part(pi, g, rw, rn, ft, lt, tl)
        }
      }
      .collect()
    val nGroups = partials.iterator.map(_.g).toSet.size
    require(nGroups <= maxGroups,
      s"groupedRankFamily: $groupDesc has $nGroups distinct values " +
        s"(> maxGroups=$maxGroups)")
    // Driver stitch, per group in partition order: row offsets, dense
    // offsets (naive run sums minus boundary merges), and the first
    // run's carried-in length (for the run-head row number).
    final case class Off(rowOff: Long, denseBase: Long, cont: Boolean,
        carryIn: Long)
    val offsets = scala.collection.mutable.Map.empty[(Int, Seq[Any]), Off]
    partials.groupBy(_.g).foreach { case (g, ps) =>
      val inOrder = ps.sortBy(_.pi)
      var rowOff = 0L; var denseSum = 0L; var merges = 0L
      var prevLast: Seq[Any] = null; var carry = 0L
      inOrder.foreach { p =>
        val cont = prevLast != null && p.firstTie == prevLast
        if (cont) merges += 1L
        offsets.update((p.pi, g),
          Off(rowOff, denseSum - merges, cont, if (cont) carry else 0L))
        // carry for the NEXT partition: length of the run that ends at
        // this partition's tail, accumulated across partitions when the
        // whole partition is one continuing run.
        carry =
          if (p.runs == 1L && cont) carry + p.rows
          else p.tailRunLen
        rowOff += p.rows
        denseSum += p.runs
        prevLast = p.lastTie
      }
    }
    val bc = df.sparkSession.sparkContext.broadcast(offsets.toMap)
    val outSchema = StructType(
      schema.fields ++ Seq(
        StructField(rowOut, LongType, nullable = false),
        StructField(rankOut, LongType, nullable = false),
        StructField(denseOut, LongType, nullable = false)))
    val outTypes = outSchema.fields.map(_.dataType)
    val scanned = rdd.mapPartitionsWithIndex { (pi, it) =>
      val proj = UnsafeProjection.create(outTypes)
      val joined = new JoinedRow
      val extra = new GenericInternalRow(3)
      var curG: Seq[Any] = null
      var curT: Seq[Any] = null
      var rowNum = 0L   // global row number of the previous row
      var dense = 0L    // global dense rank of the current run
      var headRow = 0L  // global row number of the current run's head
      it.map { r =>
        val g = keyOf(r, gIdx, gTypes)
        val t = keyOf(r, tIdx, tTypes)
        if (curG == null || g != curG) {
          val off = bc.value((pi, g))
          curG = g; curT = t
          rowNum = off.rowOff
          dense = off.denseBase + 1L
          headRow = off.rowOff - off.carryIn + 1L
          // a non-continuing first run heads at this very row
          if (!off.cont) headRow = off.rowOff + 1L
        } else if (t != curT) {
          curT = t
          dense += 1L
          headRow = rowNum + 1L
        }
        rowNum += 1L
        extra.update(0, rowNum)
        extra.update(1, headRow)
        extra.update(2, dense)
        proj(joined(r, extra)): InternalRow
      }
    }
    InternalRows.fromRdd(df.sparkSession, scanned, outSchema)
      .drop(tieTmp: _*)
  }
}
