package graft.agg

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** EWMA aggregation (reference `cpp/include/cudf/aggregation.hpp:107`,
  * EWMA Kind with center-of-mass / adjust options; pandas
  * `Series.ewm(alpha).mean()` semantics, adjust=true):
  *
  *   y_n = Σ_{i=0..n} (1-α)^i · x_{n-i}  /  Σ_{i=0..n} (1-α)^i
  *
  * Consumes (orderKey, value) pairs, buffers per group, sorts by orderKey
  * at finish, and runs the numerically stable recurrence
  *   num_n = x_n + (1-α)·num_{n-1};  den_n = 1 + (1-α)·den_{n-1}
  * (no (1-α)^-n blow-up at any series length). Returns the final smoothed
  * value of the series.
  *
  * 100 TB note: state is O(group size) like any exact order-sensitive
  * per-key aggregate; groups are per-entity time series (bounded). For
  * unbounded keys use a windowed formulation or a sorted mapPartitions
  * pass instead.
  */
class EwmaAgg(alpha: Double)
    extends Aggregator[(Long, Double), Seq[(Long, Double)], Double] {
  override def zero: Seq[(Long, Double)] = Vector.empty
  override def reduce(b: Seq[(Long, Double)], in: (Long, Double)): Seq[(Long, Double)] =
    b :+ in
  override def merge(a: Seq[(Long, Double)], b: Seq[(Long, Double)]): Seq[(Long, Double)] =
    a ++ b
  override def finish(buf: Seq[(Long, Double)]): Double = {
    var num = 0.0
    var den = 0.0
    val oneMinus = 1.0 - alpha
    buf.sortBy(_._1).foreach { case (_, x) =>
      num = x + oneMinus * num
      den = 1.0 + oneMinus * den
    }
    if (den == 0.0) Double.NaN else num / den
  }
  override def bufferEncoder: Encoder[Seq[(Long, Double)]] =
    Encoders.kryo[Seq[(Long, Double)]]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object Ewma {
  /** Column-API entry: `Ewma(0.2)(col("order_key"), col("value"))`. */
  def apply(alpha: Double): (Column, Column) => Column = {
    val agg = udaf(new EwmaAgg(alpha))
    (order, value) => agg(order, value)
  }
}
