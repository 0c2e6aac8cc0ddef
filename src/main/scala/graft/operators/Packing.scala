package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Greedy sequence packing — the batch-construction pass an LLM training
  * pipeline runs after tokenization: concatenate documents in a stable
  * order into fixed token-budget packs, starting a new pack whenever the
  * next document would overflow the budget (a document larger than the
  * budget gets a pack of its own). Reference scope: this is one of the
  * pipeline operators this engine adds beyond the reference's own
  * surface (the reference stops at tokenization, e.g.
  * `cpp/include/nvtext/wordpiece_tokenize.hpp:114`).
  *
  * Implemented as a single sorted-partition streaming pass (the
  * [[graft.agg.Ewma.smoothedPerRow]] shape): repartition by the stream
  * key, sort within partitions by (key, order), one forward scan with
  * O(1) state per key. 100 TB note: state never exceeds three longs per
  * partition, packing each key's stream is embarrassingly parallel
  * across keys, and the one exchange is on the compact stream key.
  * Greedy next-fit (not bin-packing FFD) is the standard streaming
  * choice: deterministic, single-pass, and order-stable so results are
  * reproducible run to run.
  */
object Packing {

  /** Appends (pack_id, pack_pos) — both per-key, 0-based — to `df`.
    *
    * @param key     stream column: packs never span keys
    * @param order   total order within the key (must be tie-free for
    *                cross-engine determinism)
    * @param sizeCol integer token/char count column (non-null)
    * @param budget  pack capacity in `sizeCol` units
    */
  def packGreedy(
      df: DataFrame,
      key: String,
      order: Seq[String],
      sizeCol: String,
      budget: Long): DataFrame = {
    import org.apache.spark.sql.Row
    val outSchema = StructType(df.schema.fields ++
      Seq(StructField("pack_id", LongType), StructField("pack_pos", LongType)))
    val keyIdx = df.schema.fieldIndex(key)
    val sizeIdx = df.schema.fieldIndex(sizeCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.repartition(col(key))
      .sortWithinPartitions((key +: order).map(col): _*)
      .mapPartitions { rows =>
        var curKey: Any = null
        var started = false
        var cum = 0L
        var packId = 0L
        var packPos = 0L
        rows.map { r =>
          val k = r.get(keyIdx)
          val sz = r.getLong(sizeIdx)
          if (!started || k != curKey) {
            curKey = k; started = true
            cum = sz; packId = 0L; packPos = 0L
          } else if (cum + sz > budget) {
            cum = sz; packId += 1L; packPos = 0L
          } else {
            cum += sz; packPos += 1L
          }
          Row.fromSeq(r.toSeq ++ Seq(packId, packPos))
        }
      }(enc)
  }
}
