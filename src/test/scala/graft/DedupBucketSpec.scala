package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupBucketSpec extends AnyFunSuite {
  import TestSpark._

  test("connected-component keepers: chain and triangle resolve to min id") {
    val pairs = spark
      .createDataFrame(Seq(
        (10L, 20L), (20L, 30L), // chain 10-20-30
        (5L, 7L), (7L, 9L), (5L, 9L), // triangle
        (100L, 101L))) // simple pair
      .toDF("id_a", "id_b")
    val keepers = Dedup.resolveKeepers(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(keepers(10L) == 10L && keepers(20L) == 10L && keepers(30L) == 10L)
    assert(keepers(5L) == 5L && keepers(7L) == 5L && keepers(9L) == 5L)
    assert(keepers(100L) == 100L && keepers(101L) == 100L)
  }

  test("dedupCorpus keeps one doc per LSH cluster plus singletons") {
    val docs = Tables.documents(spark, sf)
    val pairs = SparkEntry.queries("dedup_minhash_lsh")(spark, sf)
      .select(col("id_a"), col("id_b"))
    val deduped = Dedup.dedupCorpus(docs, pairs)
    val n = docs.count()
    val d = deduped.count()
    assert(d < n, "near-dups should be removed")
    // every removed doc is in some candidate pair
    val removed = docs.select(col("doc_id"))
      .exceptAll(deduped.select(col("doc_id")))
    val inPairs = pairs.select(col("id_a").as("doc_id"))
      .union(pairs.select(col("id_b").as("doc_id"))).distinct()
    assert(removed.exceptAll(inPairs).isEmpty)
  }

  test("bucketed tables join without a shuffle exchange") {
    // uses the default local warehouse (spark-warehouse/, gitignored);
    // also clear orphan locations from any previously aborted run
    import org.apache.commons.io.FileUtils
    Seq("li_b", "o_b").foreach { t =>
      FileUtils.deleteQuietly(new java.io.File(s"spark-warehouse/$t"))
    }
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")
    Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_quantity"))
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_totalprice"))
      .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_b")
    // force the non-broadcast path so bucketing is what saves the shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_b")
        .join(spark.table("o_b"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should be shuffle-free:\n$plan")
      assert(plan.contains("Bucketed: true"), s"scan not bucketed:\n$plan")
      assert(joined.count() == Tables.lineitem(spark, sf).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
