package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level diagnosis of the hot-cell probe straggler (r15 slate #4):
  * prints the physical plan and per-stage task-duration spread so the
  * slow stage is identified by evidence, not guess. Scratch tool — the
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
      graft.functions.VectorExpressions.register(spark)
      import org.apache.spark.sql.expressions.Window
      val assigned = graft.operators.Similarity.IvfIncIndex.maintained(spark, dir)
      val cen = spark.read.parquet(
        s"${graft.operators.Similarity.IvfIncIndex.baseDirFor(dir)}/centroids")
      val q = assigned.filter(col("vec_id") < 512)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      val wP = Window.partitionBy(col("query_id")).orderBy(col("score"), col("cell"))
      val probes = q.crossJoin(broadcast(cen))
        .withColumn("score", call_function("graft_dot", col("center"), col("center"))
          - lit(2.0) * call_function("graft_dot", col("qe"), col("center")))
        .withColumn("crank", row_number().over(wP)).filter(col("crank") <= 4)
        .groupBy(col("cell")).count().withColumnRenamed("count", "nq")
      val sizes = assigned.groupBy(col("cell")).count().withColumnRenamed("count", "nc")
      val fan = probes.join(sizes, Seq("cell"))
        .select(col("cell"), col("nq"), col("nc"), (col("nq") * col("nc")).as("rows"))
        .orderBy(col("rows").desc)
      fan.show(20, false)
      println("total fanout rows: " +
        fan.agg(sum(col("rows"))).head().getLong(0))
      println("query OWN-cell histogram (assignment of the 512 queries):")
      assigned.filter(col("vec_id") < 512).groupBy(col("cell")).count()
        .orderBy(col("count").desc).show(20, false)
      println("rank-1 probe == own cell? (must be 512 true)")
      val own = assigned.filter(col("vec_id") < 512)
        .select(col("vec_id").as("query_id"), col("cell").as("own"))
      q.crossJoin(broadcast(cen))
        .withColumn("score", call_function("graft_dot", col("center"), col("center"))
          - lit(2.0) * call_function("graft_dot", col("qe"), col("center")))
        .withColumn("crank", row_number().over(wP)).filter(col("crank") === 1)
        .join(own, Seq("query_id"))
        .groupBy((col("cell") === col("own")).as("ownFirst")).count().show()
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
