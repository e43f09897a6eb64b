package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level diagnosis of the hot-cell probe (r15 slate #4): prints
  * the probed-cell fan-out accounting, the physical plan and per-stage
  * task-duration spread, so a slow stage is identified by evidence, not
  * guess. Fan-out accounting rides the SHIPPED probe's own cell cut
  * ([[graft.operators.Similarity.probedCells]]) — one scoring body, so
  * the diagnosis can never disagree with the plan it diagnoses. The
  * conclusions land in PLANS.md HOTCELL. */
object HotCellDiag {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.graftDefaults(SparkSession.builder())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/tmp/graft_scale_hotcell"
    val byStage = new java.util.concurrent.ConcurrentHashMap[Int, java.util.Vector[Long]]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskInfo != null) {
          byStage.computeIfAbsent(e.stageId, _ => new java.util.Vector[Long])
            .add(e.taskInfo.duration)
        }
    })
    // fan-out accounting: which cells do the 512 queries probe, and how
    // many candidate rows does the cell join therefore produce?
    locally {
      import graft.operators.Similarity
      graft.functions.VectorExpressions.register(spark)
      val assigned = Similarity.IvfIncIndex.maintained(spark, dir)
        .withColumn("nrm", sqrt(call_function("graft_dot", col("embedding"), col("embedding"))))
      val cen = spark.read.parquet(
        s"${Similarity.IvfIncIndex.baseDirFor(dir)}/centroids")
      val probes = Similarity.probedCells(assigned, cen,
          _.filter(col("vec_id") < 512))
        .groupBy(col("cell")).count().withColumnRenamed("count", "nq")
      val sizes = assigned.groupBy(col("cell")).count().withColumnRenamed("count", "nc")
      val fan = probes.join(sizes, Seq("cell"))
        .select(col("cell"), col("nq"), col("nc"), (col("nq") * col("nc")).as("rows"))
        .orderBy(col("rows").desc)
      fan.show(20, false)
      println("total fanout rows: " +
        fan.agg(sum(col("rows"))).head().getLong(0))
      graft.Lifecycle.release(spark)
    }
    val df = graft.operators.Similarity.probeTopK(spark, dir, 512)
    df.explain("formatted")
    val t0 = System.nanoTime()
    val n = df.count()
    println(f"probe512 total ${(System.nanoTime() - t0) / 1e9}%.1fs ($n rows)")
    Thread.sleep(1000)
    import scala.jdk.CollectionConverters._
    byStage.asScala.toSeq.sortBy(_._1).foreach { case (sid, v) =>
      val ds = v.asScala.map(_.longValue()).toSeq.sorted
      if (ds.nonEmpty)
        println(f"stage $sid%4d tasks=${ds.size}%4d max=${ds.last}%7dms " +
          f"p50=${ds(ds.size / 2)}%7dms sum=${ds.sum}%8dms")
    }
    spark.stop()
  }
}
