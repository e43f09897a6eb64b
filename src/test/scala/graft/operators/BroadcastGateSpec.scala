package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.BroadcastExchangeLike
import org.apache.spark.sql.execution.joins.ShuffledHashJoinExec

/** Pins [[IndexStore.broadcastIfFits]] — the measured-bytes broadcast
  * gate shared by t32's matchable set and t06's hot/matchable sides.
  * The contract under test: the decision follows the MEASURED payload
  * vs the session's `autoBroadcastJoinThreshold` (not row counts, not
  * Catalyst's compressed-file stats), and the oversized fallback
  * ACTIVELY suppresses a planner broadcast (the SpillSmoke r13 failure
  * mode: stats said broadcastable, the in-memory hash relation was
  * not). */
class BroadcastGateSpec extends SparkSpec {

  /** Full traversal including AQE wrappers: QueryStageExec nodes are
    * LEAVES whose real subtree hangs off `plan` (the BucketedJoinSpec
    * walker), so the finalized stages are actually visible. */
  private def collectPlans(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    p +: kids.flatMap(collectPlans)
  }

  private def joinPlan(threshold: String, payloadChars: Int) = {
    import spark.implicits._
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
      val small = (1 to 50).map(i => ("k" * payloadChars) + i).toDF("shingle")
      val gated = IndexStore.broadcastIfFits(spark, small,
        octet_length(col("shingle")))(_.hint("SHUFFLE_HASH"))
      val big = (1 to 1000).map(i => ("k" * payloadChars) + (i % 60)).toDF("shingle")
      val joined = big.join(gated, Seq("shingle"), "left_semi")
      // collect() executes THIS Dataset's QueryExecution (count() would
      // build a different one), so the walked executedPlan below is the
      // finalized adaptive plan that actually ran
      joined.collect()
      collectPlans(joined.queryExecution.executedPlan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("fits under the threshold: broadcast") {
    val plans = joinPlan("1MB", payloadChars = 10)
    assert(plans.exists(_.isInstanceOf[BroadcastExchangeLike]),
      s"expected a broadcast exchange in:\n${plans.map(_.nodeName).mkString("\n")}")
  }

  test("over the threshold by BYTES (few rows, fat strings): shuffled, never broadcast") {
    // 50 rows x 40KB strings = ~2MB payload against a 1KB threshold —
    // a row-count gate would broadcast this; the byte gate must not,
    // and the SHUFFLE_HASH fallback must also keep the PLANNER from
    // broadcasting it off its own stats.
    val plans = joinPlan("1KB", payloadChars = 40000)
    assert(!plans.exists(_.isInstanceOf[BroadcastExchangeLike]),
      s"broadcast leaked past the gate in:\n${plans.map(_.nodeName).mkString("\n")}")
    assert(plans.exists(_.isInstanceOf[ShuffledHashJoinExec]),
      "fallback should plan the shuffled hash join")
  }

  test("threshold -1 disables broadcast outright") {
    val plans = joinPlan("-1", payloadChars = 10)
    assert(!plans.exists(_.isInstanceOf[BroadcastExchangeLike]))
  }

  test("empty set broadcasts (estimate 0)") {
    import spark.implicits._
    val empty = Seq.empty[String].toDF("shingle")
    val gated = IndexStore.broadcastIfFits(spark, empty,
      octet_length(col("shingle")))(_.hint("SHUFFLE_HASH"))
    // decision only — an empty broadcast is trivially safe
    val big = (1 to 10).map(_.toString).toDF("shingle")
    val joined = big.join(gated, Seq("shingle"), "left_semi")
    assert(joined.count() == 0)
  }
}
