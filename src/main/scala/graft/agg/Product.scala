package graft.agg

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** PRODUCT aggregation (reference `cpp/include/cudf/aggregation.hpp:87`,
  * PRODUCT Kind): multiplies the non-null values of a group; NULL for an
  * empty / all-null group (DuckDB `product()` semantics).
  *
  * Partial-aggregation friendly: reduce and merge are both plain
  * multiplications, so map-side combine applies and the shuffle carries
  * one (prod, count) pair per group — the right 100 TB shape.
  *
  * Exactness contract: double multiplication is commutative but not
  * associative in general, so cross-engine bit-equality holds when every
  * intermediate product is exactly representable (e.g. small integers
  * within 2^53, as in the oracle query over `l_linenumber`). For
  * arbitrary doubles the result is correct to ulps, like any
  * floating-point product.
  */
class ProductAgg extends Aggregator[java.lang.Double, (Double, Long), java.lang.Double] {
  override def zero: (Double, Long) = (1.0, 0L)
  override def reduce(b: (Double, Long), in: java.lang.Double): (Double, Long) =
    if (in == null) b else (b._1 * in.doubleValue(), b._2 + 1L)
  override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
    (a._1 * b._1, a._2 + b._2)
  override def finish(r: (Double, Long)): java.lang.Double =
    if (r._2 == 0L) null else Double.box(r._1)
  override def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  override def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
}

object Product {
  /** Column-API entry: `Product(col("x"))`. */
  private lazy val agg = udaf(new ProductAgg, Encoders.DOUBLE)
  def apply(c: Column): Column = agg(c)
}
