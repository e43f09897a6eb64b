package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r21/r22 diagnostic: explain + time ONE static-session CC round vs
  * the AQE-session round, on the t11 pair graph. r22 adds the
  * PRE-PARTITIONED edges variant (the production static shape): edges
  * hash-repartitioned by src once and checkpointed with partitioning
  * preserved, so the round's propagate join should plan NO exchange on
  * the edges side. Measurement-only. */
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

    def oneRound(sess: SparkSession, edges: DataFrame, hintShj: Boolean): Unit = {
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
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = out.count()
        println(f"  round count=$n dt=${(System.nanoTime() - t0) / 1e6}%.0fms")
      }
    }
    val sessS = graft.operators.LoopExec.session(spark, 1)
    println("\n===== STATIC session, PRE-PARTITIONED edges (r22 production shape) =====")
    val edgesPre = graft.operators.LoopExec.bridge(sessS, edgesParent)
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .repartition(1, col("src"))
      .localCheckpoint()
    oneRound(sessS, edgesPre, hintShj = true)
    println("\n===== STATIC session, bridged-narrow edges (r21 shape) =====")
    oneRound(sessS,
      graft.operators.LoopExec.bridge(sessS, edgesParent).coalesce(1)
        .filter(col("src").isNotNull && col("dst").isNotNull),
      hintShj = true)
    println("\n===== PARENT session (AQE) =====")
    oneRound(spark,
      edgesParent.filter(col("src").isNotNull && col("dst").isNotNull),
      hintShj = false)
    println("\n===== full connectedComponents timing =====")
    for (_ <- 1 to 3) {
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
