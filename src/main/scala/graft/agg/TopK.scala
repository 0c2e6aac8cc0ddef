package graft.agg

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable.ArrayBuffer

/** Bounded top-k aggregator: keeps the k smallest (rank, id) pairs per
  * group with O(k) state and map-side combine — the scale shape for
  * exact k-per-group selection. A rank window computes the same thing
  * by SORTING every group in full; this aggregator's partial buffers
  * cap at k on every executor, so a billion-row stratum costs the same
  * state as a thousand-row one and the shuffle moves only k pairs per
  * (group, map partition).
  *
  * Insertion keeps the buffer sorted (binary search + insert, O(log k)
  * compare + O(k) shift — k is small by construction); merge is a
  * bounded merge of two sorted buffers.
  */
class TopKAgg(k: Int)
    extends Aggregator[(Long, Long), ArrayBuffer[(Long, Long)], Seq[(Long, Long)]] {
  require(k >= 1, s"k must be >= 1, got $k")

  private def lt(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)

  private def insert(b: ArrayBuffer[(Long, Long)], x: (Long, Long)): ArrayBuffer[(Long, Long)] = {
    if (b.length == k && !lt(x, b.last)) return b
    var lo = 0
    var hi = b.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (lt(b(mid), x)) lo = mid + 1 else hi = mid
    }
    b.insert(lo, x)
    if (b.length > k) b.remove(k)
    b
  }

  override def zero: ArrayBuffer[(Long, Long)] = ArrayBuffer.empty

  override def reduce(b: ArrayBuffer[(Long, Long)], in: (Long, Long)): ArrayBuffer[(Long, Long)] =
    insert(b, in)

  override def merge(a: ArrayBuffer[(Long, Long)], b: ArrayBuffer[(Long, Long)]): ArrayBuffer[(Long, Long)] = {
    b.foreach(x => insert(a, x))
    a
  }

  override def finish(b: ArrayBuffer[(Long, Long)]): Seq[(Long, Long)] = b.toSeq

  override def bufferEncoder: Encoder[ArrayBuffer[(Long, Long)]] =
    Encoders.kryo[ArrayBuffer[(Long, Long)]]
  // ExpressionEncoder (not Kryo) so the output lands as a real
  // array<struct> column the caller can posexplode in SQL.
  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
}
