package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation helpers.
  *
  * At 100 TB a handful of hot keys (one dominant event_type, one viral
  * user) can pin a single reducer. Two standard levers, both encoded
  * here:
  *
  *  1. AQE skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`) —
  *     on by default in our sessions; handles join-side skew without code
  *     changes.
  *  2. Salted two-phase aggregation — for aggregate-side skew: spread
  *     each key across `salts` sub-keys, partially aggregate, then
  *     combine. With associative+commutative aggregates (counts,
  *     decimal-exact sums — see [[Exact]]) the result is identical to the
  *     direct aggregation, verified in SkewSpec.
  */
object Skew {

  /** Two-phase salted sum/count aggregation over one key column.
    * The salt is derived from a hash of the whole row's spread column so
    * it is deterministic (no rand()): repeated runs produce identical
    * partials. */
  def saltedAgg(df: DataFrame, key: String, spread: Column, salts: Int)(
      aggs: (String, Column)*): DataFrame = {
    val salted = df.withColumn("_salt", pmod(hash(spread), lit(salts)))
    val phase1 = salted
      .groupBy(col(key), col("_salt"))
      .agg(aggs.head._2.as(aggs.head._1),
        aggs.tail.map { case (n, c) => c.as(n) }: _*)
    phase1
      .groupBy(col(key))
      .agg(sum(col(aggs.head._1)).as(aggs.head._1),
        aggs.tail.map { case (n, _) => sum(col(n)).as(n) }: _*)
  }
}
