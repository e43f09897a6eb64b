package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-query job profile — the round-21 "measure first" loop (guide §1).
  *
  * Bench reports one wall number per catalog entry; for entries built
  * from many sequential Spark jobs (CC rounds, soak-ring nights,
  * bounded stream drains, published-index ensures) that number hides
  * WHERE the time goes. This main runs named queries under the same
  * session shape as Bench (env cpus / sf dir, AQE on, shuffle
  * partitions = cpus), warms each once, then on the timed run records
  * per-job wall time + description/call-site and per-stage task-time
  * sums via a listener, plus the fn-build vs action split.
  *
  * Reading the output: `jobs=N` is the per-entry fixed-floor signal
  * (every job pays scheduler + DAG + first-task latency even on empty
  * data); a job list dominated by many ~50-100 ms rows is floor-bound,
  * one dominated by a single fat row is kernel-bound.
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.tools.QueryProf mm11_phash_chain_clusters ..."
  * (no args = the BENCH_r20 top-12.) */
object QueryProf {
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
    val names = if (args.nonEmpty) args.toSeq
      else Seq("mm11_phash_chain_clusters", "c10_trimodal_near_capstone",
        "mm09_media_ring_soak", "c08_ring_soak", "st11_stream_media_near_filter",
        "c09_trimodal_capstone", "st13_stream_wide_media_filter",
        "st09_stream_join_subkeyed", "mm12_phash64_chain_clusters",
        "t32_span_dedup", "st04_stream_stream_join", "s19_ann_retract_gen2_probe")
    val qs = graft.SparkEntry.queries

    final case class JobRow(id: Int, ms: Long, stages: Int, taskMs: Long, desc: String)

    names.foreach { n =>
      qs.get(n) match {
        case None => println(s"!! unknown query $n")
        case Some(fn) =>
          // warm: fixture ensures + codegen land here, as in Bench pass 1
          try { fn(spark, d).count(); () } catch { case e: Throwable =>
            println(s"!! $n warmup FAILED: ${e.getMessage}") }
          graft.Lifecycle.release(spark)

          val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Int)]()
          val rows = new java.util.concurrent.ConcurrentLinkedQueue[JobRow]()
          val stageTaskMs = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
          val stageNames = new java.util.concurrent.ConcurrentHashMap[Int, (String, Int, Long)]()
          val listener = new SparkListener {
            override def onJobStart(e: SparkListenerJobStart): Unit = {
              val desc = Option(e.properties)
                .flatMap(p => Option(p.getProperty("spark.job.description")))
                .orElse(Option(e.properties)
                  .flatMap(p => Option(p.getProperty("callSite.short"))))
                .getOrElse("?")
              starts.put(e.jobId, (e.time, desc, e.stageIds.size))
            }
            override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
              val info = e.stageInfo
              // executorRunTime lives in the stage's task metrics sum
              stageTaskMs.put(info.stageId,
                Option(info.taskMetrics).map(_.executorRunTime).getOrElse(0L))
              // the AQE materialization future hides the call site in
              // `name`; the first graft frame in `details` names the
              // operator that built the subplan, and the stage's RDD
              // scopes name its physical operators (scan files, codegen
              // units) when no graft frame exists
              val site = Option(info.details).toSeq
                .flatMap(_.split('\n'))
                .find(l => l.contains("graft.") && !l.contains("QueryProf"))
                .getOrElse {
                  info.rddInfos.map(r =>
                    r.scope.map(_.name).getOrElse(r.name)).distinct
                    .mkString("[", ",", "]")
                }.trim
              stageNames.put(info.stageId,
                (info.name.takeWhile(_ != '\n') + " | " + site, info.numTasks,
                  (info.completionTime.getOrElse(0L) -
                    info.submissionTime.getOrElse(0L))))
            }
            override def onJobEnd(e: SparkListenerJobEnd): Unit = {
              Option(starts.remove(e.jobId)).foreach { case (t0, desc, nStages) =>
                rows.add(JobRow(e.jobId, e.time - t0, nStages, 0L, desc))
              }
            }
          }
          spark.sparkContext.addSparkListener(listener)
          val t0 = System.nanoTime()
          val (df, buildErr) =
            try (fn(spark, d), Option.empty[String])
            catch { case e: Throwable => (null, Some(e.getMessage)) }
          val t1 = System.nanoTime()
          val cnt = if (df != null) {
            try df.count() catch { case e: Throwable =>
              println(s"!! $n count FAILED: ${e.getMessage}"); -1L }
          } else -1L
          val t2 = System.nanoTime()
          org.apache.spark.GraftListenerBus.drain(spark.sparkContext, 30000L)
          spark.sparkContext.removeSparkListener(listener)
          graft.Lifecycle.release(spark)

          // bounded-drain phase split for the st* entries (plan build /
          // stream start / await-termination) — the driver-side floor
          // the job rows can't see
          if (graft.streaming.Drain.lastPhases.nonEmpty) {
            println(s"   drain: ${graft.streaming.Drain.lastPhases}")
            graft.streaming.Drain.lastPhases = ""
          }
          val jr = rows.toArray(Array.empty[JobRow]).sortBy(-_.ms)
          val totalJobMs = jr.map(_.ms).sum
          val totalTaskMs = stageTaskMs.values().toArray(Array.empty[java.lang.Long])
            .map(_.longValue()).sum
          println(f"\n== $n rows=$cnt fn-build=${(t1 - t0) / 1e6}%.0fms " +
            f"action=${(t2 - t1) / 1e6}%.0fms jobs=${jr.length} " +
            f"jobWallSum=${totalJobMs}ms taskTimeSum=${totalTaskMs}ms" +
            buildErr.map(e => s" BUILD-FAILED: $e").getOrElse(""))
          jr.take(25).foreach { r =>
            println(f"   job ${r.id}%4d ${r.ms}%6dms stages=${r.stages}%2d  ${r.desc.take(110)}")
          }
          // top stages by wall, with names (call sites) — the attribution
          // the job rows alone can't give
          import scala.jdk.CollectionConverters._
          val st = stageNames.asScala.toSeq.sortBy(-_._2._3).take(20)
          st.foreach { case (sid, (nm, nt, wall)) =>
            val run = stageTaskMs.getOrDefault(sid, 0L)
            println(f"   stage $sid%4d wall=${wall}%6dms tasks=$nt%3d run=${run}%6dms  ${nm.take(100)}")
          }
      }
    }
    spark.stop()
  }
}
