package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salted-join equivalence: the salted plan must compute exactly the
  * plain equi-join, while spreading each key over `salts` shuffle keys.
  */
class SkewJoinSpec extends AnyFunSuite {
  import TestSpark._

  test("saltedEquiJoin equals the plain join and widens the shuffle key") {
    val l = Tables
      .lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    val o = Tables
      .orders(spark, sf)
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val salted = operators.SkewJoin
      .saltedEquiJoin(l, o, "l_orderkey", col("l_linenumber"), salts = 4)
    val plain = l.join(o, Seq("l_orderkey"))
    assert(salted.count() == plain.count())
    // spot-check content equality via checksums over both results
    def sig(df: org.apache.spark.sql.DataFrame): Seq[org.apache.spark.sql.Row] =
      df.agg(
        sum(col("l_orderkey")), sum(col("l_linenumber")),
        sum(floor(col("o_totalprice") * 100).cast("long"))).collect().toSeq
    assert(sig(salted) == sig(plain))
    // the salt must actually reach the join key
    val plan = salted.queryExecution.optimizedPlan.toString
    assert(plan.contains("__salt"), s"salt column absent from plan:\n$plan")
  }
}
