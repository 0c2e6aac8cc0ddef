package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Skew-aware join utilities for the 100 TB path (complements AQE's
  * skew-join splitting, for cases where a single hot key exceeds what
  * one task can hold — the canonical salting pattern).
  *
  * Left side: each row gets a random-but-deterministic salt in
  * [0, buckets); right side: replicated once per salt value. The join
  * key becomes (key, salt), fanning a hot key out over `buckets` tasks.
  * Replication cost is buckets × |right|, so use with a dimension-or-
  * aggregated right side and pick buckets ≈ observed skew factor.
  */
object Skew {

  /** Deterministic salt from row identity (stable across retries —
    * unlike rand(), task retries can't produce duplicate/lost rows).
    */
  def salt(idCols: Seq[Column], buckets: Int): Column =
    pmod(hash(idCols: _*), lit(buckets)).cast(IntegerType)

  /** Salted equi-join: left big/skewed, right small enough to replicate
    * `buckets` times.
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftIdCols: Seq[String],
      buckets: Int,
      joinType: String = "inner"): DataFrame = {
    val l = left.withColumn("__salt", salt(leftIdCols.map(left(_)), buckets))
    val saltRange = explode(sequence(lit(0), lit(buckets - 1)))
    val r = right.withColumn("__salt", saltRange)
    l.join(r, l(leftKey) === r(rightKey) && l("__salt") === r("__salt"), joinType)
      .drop(r(rightKey))
      .drop("__salt")
  }
}
