package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r21 diagnostic: explain + time ONE static-session CC round vs the
  * AQE-session round, on the t11 pair graph. Measurement-only. */
object CcLoopProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Sessions.graftDefaults(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val pairs = graft.operators.TextDedup.PairIndex.ensure(spark, d)
      .select(col("doc1"), col("doc2"))
    val und = pairs.select(col("doc1").as("src"), col("doc2").as("dst"))
      .unionByName(pairs.select(col("doc2").as("src"), col("doc1").as("dst")))
    val edgesParent = und.localCheckpoint()
    println(s"edges rows=${edgesParent.count()}")

    def oneRound(sess: SparkSession, hintShj: Boolean): Unit = {
      val edges = graft.operators.LoopExec.bridge(sess, edgesParent)
        .filter(col("src").isNotNull && col("dst").isNotNull)
      val lbl0 = graft.operators.LoopExec.bridge(sess,
          edges.select(col("src").as("v")).distinct()
            .withColumn("label", col("v")).localCheckpoint())
        .filter(col("v").isNotNull && col("label").isNotNull)
      val rhs = if (hintShj) lbl0.hint("SHUFFLE_HASH") else lbl0
      val prop = edges.join(rhs, edges("src") === rhs("v"))
        .select(edges("dst").as("v"), col("label"))
      val agg = lbl0.unionByName(prop)
        .groupBy(col("v")).agg(min(col("label")).as("label"))
      val lookup0 = agg.select(col("v").as("lv"), col("label").as("label2"))
      val lookup = if (hintShj) lookup0.hint("SHUFFLE_HASH") else lookup0
      val out = agg.join(lookup, col("label") === col("lv"))
        .select(col("v"), col("label2").as("label"))
      println(out.queryExecution.executedPlan.toString.take(4000))
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = out.count()
        println(f"  round count=$n dt=${(System.nanoTime() - t0) / 1e6}%.0fms")
      }
    }
    println("\n===== STATIC session (sized), SHUFFLE_HASH hints =====")
    oneRound(graft.operators.LoopExec.session(spark, 1), hintShj = true)
    println("\n===== PARENT session (AQE) =====")
    oneRound(spark, hintShj = false)
    println("\n===== full connectedComponents timing =====")
    for (i <- 1 to 3) {
      val und2 = pairs.select(col("doc1").as("src"), col("doc2").as("dst"))
        .unionByName(pairs.select(col("doc2").as("src"), col("doc1").as("dst")))
      val t0 = System.nanoTime()
      val n = graft.operators.Corpus.connectedComponents(und2).count()
      println(f"  cc labels=$n dt=${(System.nanoTime() - t0) / 1e6}%.0fms")
      graft.Lifecycle.release(spark)
    }
    spark.stop()
  }
}
