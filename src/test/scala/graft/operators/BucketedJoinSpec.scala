package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

/** Pins r08's structural claim: with both sides bucketed on the join
  * key, the sort-merge join's distribution requirement is satisfied by
  * the SCANS — no shuffle exchange exists anywhere under the join. The
  * gate checks only values (bucketing must be invisible in results);
  * this spec checks the plan, which is the entire point of the
  * operator. */
class BucketedJoinSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  /** Full traversal including AQE wrappers: QueryStageExec nodes are
    * LEAVES whose real subtree hangs off `plan`, so a plain
    * TreeNode.collect never sees inside a materialized stage. */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    p +: kids.flatMap(allNodes)
  }

  test("bucketed join plans with zero exchanges under the sort-merge join") {
    val df = SourcesStreaming.r08.fn(spark, d)
    df.collect() // materialize so AQE's final plan is the real one
    val plan = df.queryExecution.executedPlan
    val joins = allNodes(plan).collect { case j: SortMergeJoinExec => j }
    assert(joins.nonEmpty, s"no sort-merge join in plan:\n$plan")
    val shufflesUnderJoin = allNodes(joins.head).drop(1)
      .collect { case e: ShuffleExchangeLike => e }
    assert(shufflesUnderJoin.isEmpty,
      s"bucketed join still shuffles:\n${joins.head}")
    // the whole query keeps exactly the post-join exchanges: the
    // O(|priorities|) aggregate and the final ORDER BY
    val allShuffles = allNodes(plan).collect { case e: ShuffleExchangeLike => e }
    assert(allShuffles.length <= 2,
      s"unexpected extra exchanges (${allShuffles.length}):\n$plan")
  }

  test("bucketed join result equals the plain non-bucketed join") {
    val bucketed = SourcesStreaming.r08.fn(spark, d).collect().toSeq
    val plain = graft.Tables.orders(spark, d)
      .join(graft.Tables.lineitem(spark, d),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        graft.functions.Exact.exactSum(col("l_extendedprice")).as("sum_price"))
      .orderBy(col("o_orderpriority"))
      .collect().toSeq
    assert(bucketed == plain)
  }
}
