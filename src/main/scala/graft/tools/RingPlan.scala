package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump the night-0 build's PHYSICAL plan over a deep replica corpus
  * under a chosen verify-join hint mode — which joins broadcast, which
  * shuffle — without executing it (the RingSpill k=100 diagnosis: the
  * hinted arm still OOM'd, so some OTHER join must be building an
  * unbounded hash relation).
  *
  *   sbt "runMain graft.tools.RingPlan <k> [shuffle_hash|off]"
  */
object RingPlan {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(100)
    val hint = args.drop(1).headOption.getOrElse("shuffle_hash")
    val spark = graft.Sessions.graftDefaults(SparkSession.builder())
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.graft.verifyjoin.hint", hint)
    spark.conf.set("spark.graft.bands.mode", "persisted")
    val dir = s"/tmp/graft_scale_v2_${k}x"
    val plan = graft.operators.TextDedup.PromotedPairIndex
      .night0Plan(spark, dir)
      .queryExecution.executedPlan.toString
    println(s"== night0 plan k=$k hint=$hint")
    // join nodes + their immediate size hints only — the full tree is
    // thousands of lines
    plan.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange") ||
        l.contains("Broadcast"))
      .foreach(println)
    spark.stop()
  }
}
