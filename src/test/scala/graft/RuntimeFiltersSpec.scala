package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the two RUNTIME filter techniques a 100 TB deployment leans on —
  * both are Catalyst features this library gets by keeping plans
  * declarative (SURVEY §4 "let Catalyst optimize"), and both silently
  * stop working if a future operator formulation breaks the pattern,
  * which is why they're pinned here:
  *
  *  - runtime BLOOM-FILTER join pruning (Spark 3.5+): a semi-join
  *    filter built from the selective side's join keys is injected into
  *    the big side's scan, cutting shuffle input before the join;
  *  - DYNAMIC PARTITION PRUNING: a subquery filter on the fact scan's
  *    partition column derived from the dim side's filter, so only
  *    matching partitions are read at all.
  */
class RuntimeFiltersSpec extends AnyFunSuite {
  import TestSpark._

  test("runtime bloom filter injects into the big side of a selective SMJ") {
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      val li = Tables.lineitem(spark, sf)
      val selective = Tables.orders(spark, sf).filter(col("o_totalprice") > 400000)
      val j = li.join(selective, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity")).as("q"))
      val plan = j.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected an injected bloom filter in:\n$plan")
      assert(j.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    }
  }

  test("dynamic partition pruning fires on a partitioned fact scan") {
    val wh = java.nio.file.Files.createTempDirectory("graft-dpp").toString
    Tables.orders(spark, sf)
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(s"$wh/orders_part")
    spark.range(1992, 1999)
      .select(col("id").as("y"),
        when(col("id") % 2 === 0, "even").otherwise("odd").as("tag"))
      .write.mode("overwrite").parquet(s"$wh/years")
    val fact = spark.read.parquet(s"$wh/orders_part")
    val dim = spark.read.parquet(s"$wh/years").filter(col("tag") === "odd")
    val j = fact.join(dim, col("o_year") === col("y"))
      .groupBy(col("y")).agg(count(lit(1)).as("n"))
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected DPP subquery on the partitioned scan in:\n$plan")
    // and the pruned result matches the unpruned semantics
    val expected = fact.join(dim, col("o_year") === col("y"))
      .groupBy(col("y")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(j.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == expected)
    assert(expected.keySet.forall(_ % 2 == 1))
  }
}
