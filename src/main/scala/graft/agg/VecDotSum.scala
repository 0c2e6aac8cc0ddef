package graft.agg

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Element-wise Σ rowᵥ · s over long vectors: for rows (v: array<long>,
  * s: long), the d-length array whose j-th entry is Σ v(j)·s — the
  * matrix-vector product step of the power-iteration family, as ONE
  * map-side-combining aggregate.
  *
  * Why: the previous formulation exploded every row into d (dim, x·s)
  * rows and hash-aggregated them by dim — n·d rows through Generate +
  * HashAggregate + a d-row exchange, per iteration. Here each task
  * folds its rows into one d-long buffer (exact long adds, order-free),
  * partials merge element-wise, and the exchange carries #partitions
  * buffers. Values are bit-identical: the same x·s products, summed in
  * exact long arithmetic.
  *
  * State is O(d) — a bounded dimension vector, the same class of
  * aggregation state as the t-digest/KMV sketches beside it.
  */
class VecDotSumAgg
    extends Aggregator[(Seq[Long], Long), Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(b: Array[Long], in: (Seq[Long], Long)): Array[Long] = {
    val (v, s) = in
    if (v == null) return b
    val buf = if (b.isEmpty) new Array[Long](v.length) else b
    var j = 0
    val n = math.min(buf.length, v.length)
    while (j < n) { buf(j) += v(j) * s; j += 1 }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      var j = 0
      val n = math.min(a.length, b.length)
      while (j < n) { a(j) += b(j); j += 1 }
      a
    }

  override def finish(b: Array[Long]): Seq[Long] =
    scala.collection.immutable.ArraySeq.unsafeWrapArray(b)

  override def bufferEncoder: Encoder[Array[Long]] =
    Encoders.kryo[Array[Long]]
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
