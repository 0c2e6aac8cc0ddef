package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end near-duplicate resolution on top of LSH candidate pairs:
  * connected components by iterative min-label propagation (the standard
  * large-graph technique — each iteration is two shuffles on compact
  * (id, label) pairs; converges in O(log(cluster diameter)) rounds,
  * which for near-dup clusters is a handful).
  */
object Dedup {

  /** pairs(id_a, id_b) → (doc_id, keeper) where keeper is the smallest
    * doc id in the connected near-dup cluster. Singleton docs are their
    * own keeper (absent from the output; join with a default).
    */
  def resolveKeepers(pairs: DataFrame, maxIter: Int = 10): DataFrame = {
    val edges = pairs
      .select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .cache()
    var labels = edges
      .groupBy(col("src").as("id"))
      .agg(least(min(col("dst")), first(col("src"))).as("label"))
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // propagate: my new label = min(my label, labels of my neighbors)
      val neighborLabels = edges
        .join(labels.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src").as("id"))
        .agg(min(col("label")).as("nlabel"))
      val next = labels
        .join(neighborLabels, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
        .cache()
      val changed = next
        .join(labels.withColumnRenamed("label", "old"), "id")
        .filter(col("label") =!= col("old"))
        .limit(1)
        .count()
      converged = changed == 0
      labels = next
      iter += 1
    }
    labels.select(col("id").as("doc_id"), col("label").as("keeper"))
  }

  /** Full pipeline: docs + candidate pairs → deduplicated corpus
    * (keeps the keeper doc of every cluster plus all singletons).
    */
  def dedupCorpus(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val keepers = resolveKeepers(pairs)
    docs
      .join(keepers, Seq("doc_id"), "left")
      .filter(col("keeper").isNull || col("keeper") === col("doc_id"))
      .drop("keeper")
  }
}
