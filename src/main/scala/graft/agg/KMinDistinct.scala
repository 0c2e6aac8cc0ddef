package graft.agg

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable.ArrayBuffer

/** Bounded k-minimum-DISTINCT-values aggregator: the KMV sketch state
  * proper (Beyer et al.), as an Aggregator so it runs inside streaming
  * window aggregations where a distinct()-before-aggregate would be a
  * second stateful operator (chained stateful ops are rejected by the
  * streaming planner). Keeps the k smallest distinct longs with O(k)
  * state and map-side combine; duplicates are skipped at insert (binary
  * search hits an equal element), which is exactly the DISTINCT the
  * batch path gets from `.distinct()` before [[TopKAgg]].
  */
class KMinDistinctAgg(k: Int)
    extends Aggregator[Long, ArrayBuffer[Long], Seq[Long]] {
  require(k >= 1, s"k must be >= 1, got $k")

  private def insert(b: ArrayBuffer[Long], x: Long): ArrayBuffer[Long] = {
    if (b.length == k && x >= b.last) return b
    var lo = 0
    var hi = b.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (b(mid) < x) lo = mid + 1 else hi = mid
    }
    if (lo < b.length && b(lo) == x) return b // already present
    b.insert(lo, x)
    if (b.length > k) b.remove(k)
    b
  }

  override def zero: ArrayBuffer[Long] = ArrayBuffer.empty

  override def reduce(b: ArrayBuffer[Long], x: Long): ArrayBuffer[Long] =
    insert(b, x)

  override def merge(a: ArrayBuffer[Long], b: ArrayBuffer[Long]): ArrayBuffer[Long] = {
    b.foreach(x => insert(a, x))
    a
  }

  override def finish(b: ArrayBuffer[Long]): Seq[Long] = b.toSeq

  override def bufferEncoder: Encoder[ArrayBuffer[Long]] =
    Encoders.kryo[ArrayBuffer[Long]]
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
