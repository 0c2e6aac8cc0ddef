package graft.agg

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable.ArrayBuffer

/** Mergeable t-digest quantile sketch (Dunning & Ertl, "Computing
  * extremely accurate quantiles using t-digests") — the reference's
  * tdigest aggregation (cpp/include/cudf/aggregation.hpp:121) re-expressed
  * as a Spark `Aggregator`: O(δ) state, map-side combine, mergeable
  * across partitions, relative accuracy concentrated at the tails
  * (the k₁ asin scale function: centroid capacity shrinks toward the
  * extremes), which is exactly
  * why the tail quantiles a data pipeline monitors (p99 latencies,
  * length caps) come out sharper than a uniform-error sketch.
  *
  * Determinism note: centroid formation depends on merge order, so the
  * OUTPUT is a sketch (rows-only in the oracle gate, like HLL/GK); the
  * one-sided accuracy contract is what gets oracle-checked
  * (`agg_tdigest_vs_exact` emits booleans the DuckDB twin pins TRUE —
  * any bound violation flips a cell and fails the hash). TDigestSpec
  * additionally pins rank error, repartition stability, and the O(δ)
  * state bound.
  */
object TDigest {

  /** Sketch state: centroids (mean, weight) + an unmerged point buffer
    * (points become weight-1 centroids at the next compress).
    */
  final case class Buf(
      cent: ArrayBuffer[(Double, Double)],
      raw: ArrayBuffer[Double])

  /** k₁-scale compress (the paper's asin scale function): sort by mean,
    * then greedily merge neighbours while the merged centroid's quantile
    * span stays within one k-unit, where k(q) = δ/(2π)·asin(2q−1).
    * k′(q) → ∞ at the tails, so extreme centroids stay near-singletons
    * (tail accuracy), and k(1) − k(0) = δ/2 bounds the centroid count by
    * ~δ — strict O(δ) state.
    */
  def compress(cent: Seq[(Double, Double)], delta: Int): ArrayBuffer[(Double, Double)] = {
    val out = ArrayBuffer.empty[(Double, Double)]
    if (cent.isEmpty) return out
    val sorted = cent.sortBy(_._1)
    val w = sorted.iterator.map(_._2).sum
    def k(q: Double): Double =
      delta / (2 * math.Pi) * math.asin(2 * math.min(1.0, math.max(0.0, q)) - 1)
    var cm = sorted.head._1
    var cw = sorted.head._2
    var acc = 0.0
    sorted.iterator.drop(1).foreach { case (m, wt) =>
      if (k((acc + cw + wt) / w) - k(acc / w) <= 1.0) {
        val nw = cw + wt
        cm = cm + (m - cm) * wt / nw
        cw = nw
      } else {
        out += ((cm, cw))
        acc += cw
        cm = m
        cw = wt
      }
    }
    out += ((cm, cw))
    out
  }

  /** Quantile estimate: piecewise-linear interpolation between centroid
    * midpoints (each centroid's mass sits at cumulative-weight midpoint),
    * clamped to the extreme centroid means at the ends.
    */
  def quantile(cent: IndexedSeq[(Double, Double)], q: Double): Double = {
    require(cent.nonEmpty, "quantile of an empty digest")
    val w = cent.iterator.map(_._2).sum
    val target = q * w
    var acc = 0.0
    var prevMid = Double.NaN
    var prevMean = cent.head._1
    var i = 0
    while (i < cent.length) {
      val (m, wt) = cent(i)
      val mid = acc + wt / 2
      if (target <= mid) {
        return if (prevMid.isNaN || mid == prevMid) m
        else prevMean + (m - prevMean) * (target - prevMid) / (mid - prevMid)
      }
      acc += wt
      prevMid = mid
      prevMean = m
      i += 1
    }
    cent.last._1
  }
}

/** t-digest aggregator producing quantile estimates at the given
  * probabilities. `rawLimit` bounds the unmerged buffer (compress
  * amortizes to O(log) per point); state stays O(δ + rawLimit).
  */
class TDigestAgg(delta: Int, qs: Seq[Double], rawLimit: Int = 512)
    extends Aggregator[Double, TDigest.Buf, Seq[Double]] {
  require(delta >= 10, s"delta too small for a useful digest: $delta")
  require(qs.nonEmpty && qs.forall(q => q >= 0 && q <= 1))

  private def compacted(b: TDigest.Buf): TDigest.Buf =
    if (b.raw.isEmpty) b
    else TDigest.Buf(
      TDigest.compress(b.cent.toSeq ++ b.raw.map((_, 1.0)), delta),
      ArrayBuffer.empty)

  override def zero: TDigest.Buf =
    TDigest.Buf(ArrayBuffer.empty, ArrayBuffer.empty)

  override def reduce(b: TDigest.Buf, x: Double): TDigest.Buf = {
    b.raw += x
    if (b.raw.length >= rawLimit) compacted(b) else b
  }

  override def merge(a: TDigest.Buf, b: TDigest.Buf): TDigest.Buf = {
    val ca = compacted(a)
    val cb = compacted(b)
    TDigest.Buf(
      TDigest.compress(ca.cent.toSeq ++ cb.cent.toSeq, delta),
      ArrayBuffer.empty)
  }

  override def finish(b: TDigest.Buf): Seq[Double] = {
    val c = compacted(b).cent.toIndexedSeq
    if (c.isEmpty) Seq.fill(qs.length)(Double.NaN)
    else qs.map(TDigest.quantile(c, _))
  }

  override def bufferEncoder: Encoder[TDigest.Buf] =
    Encoders.kryo[TDigest.Buf]
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
