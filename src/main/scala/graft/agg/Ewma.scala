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
class EwmaAgg(alpha: Double, maxGroup: Int = 4 << 20)
    extends Aggregator[(Long, Double), scala.collection.mutable.ArrayBuffer[(Long, Double)], Double] {
  import scala.collection.mutable.ArrayBuffer

  // Amortized-O(1) append (an immutable `Seq :+` here re-wraps per row —
  // quadratic on Vector-unfriendly runtimes and pure garbage churn), and
  // a hard group-size guard so a runaway key fails loudly instead of
  // OOMing an executor: exact order-sensitive EWMA needs the whole group
  // buffered, so beyond the bound the right tool is the O(1)-state
  // sorted streaming pass, Ewma.smoothedPerRow.

  override def zero: ArrayBuffer[(Long, Double)] = ArrayBuffer.empty
  override def reduce(
      b: ArrayBuffer[(Long, Double)], in: (Long, Double)): ArrayBuffer[(Long, Double)] = {
    require(b.size < maxGroup,
      s"EwmaAgg group exceeds $maxGroup rows; use Ewma.smoothedPerRow " +
        "(O(1) state per group) for unbounded series")
    b += in
  }
  override def merge(
      a: ArrayBuffer[(Long, Double)],
      b: ArrayBuffer[(Long, Double)]): ArrayBuffer[(Long, Double)] = {
    require(a.size + b.size <= maxGroup,
      s"EwmaAgg group exceeds $maxGroup rows; use Ewma.smoothedPerRow " +
        "(O(1) state per group) for unbounded series")
    a ++= b
  }
  override def finish(buf: ArrayBuffer[(Long, Double)]): Double = {
    var num = 0.0
    var den = 0.0
    val oneMinus = 1.0 - alpha
    buf.sortInPlaceBy(_._1).foreach { case (_, x) =>
      num = x + oneMinus * num
      den = 1.0 + oneMinus * den
    }
    if (den == 0.0) Double.NaN else num / den
  }
  override def bufferEncoder: Encoder[ArrayBuffer[(Long, Double)]] =
    Encoders.kryo[ArrayBuffer[(Long, Double)]]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object Ewma {
  /** Column-API entry: `Ewma(0.2)(col("order_key"), col("value"))`. */
  def apply(alpha: Double): (Column, Column) => Column = {
    val agg = udaf(new EwmaAgg(alpha))
    (order, value) => agg(order, value)
  }

  /** Per-row EWMA (pandas `ewm(alpha).mean()`, adjust=true) as a single
    * sorted-partition streaming pass: repartition by key, sort within
    * partitions by (key, order), then one forward scan holding O(1)
    * state per group — the unbounded-series shape the buffering
    * [[EwmaAgg]] documents as its scale alternative. Appends an `ewma`
    * double column; a null value yields a null ewma and leaves the
    * recurrence state untouched.
    */
  def smoothedPerRow(
      df: org.apache.spark.sql.DataFrame,
      key: String,
      order: Seq[String],
      value: String,
      alpha: Double): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
    val outSchema = StructType(df.schema.fields :+ StructField("ewma", DoubleType))
    val keyIdx = df.schema.fieldIndex(key)
    val valIdx = df.schema.fieldIndex(value)
    val oneMinus = 1.0 - alpha
    df.repartition(col(key))
      .sortWithinPartitions((key +: order).map(col): _*)
      .mapPartitions { rows =>
        var curKey: Any = null
        var started = false
        var num = 0.0
        var den = 0.0
        rows.map { r =>
          val k = r.get(keyIdx)
          if (!started || k != curKey) {
            curKey = k; started = true; num = 0.0; den = 0.0
          }
          val out =
            if (r.isNullAt(valIdx)) null
            else {
              num = r.getDouble(valIdx) + oneMinus * num
              den = 1.0 + oneMinus * den
              Double.box(num / den)
            }
          Row.fromSeq(r.toSeq :+ out)
        }
      }(Encoders.row(outSchema))
  }
}
