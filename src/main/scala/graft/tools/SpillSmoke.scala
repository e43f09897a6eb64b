package graft.tools

import org.apache.spark.sql.SparkSession

/** Memory-pressure smoke: run the catalog's heaviest shuffle queries
  * under a DELIBERATELY starved heap and record completion + spill
  * metrics — the graceful-degradation axis of the 100 TB story (growth
  * curves and plan shapes show the work is bounded; this shows that when
  * a partition's working set outgrows execution memory anyway, the
  * operators SPILL and finish rather than OOM).
  *
  * Usage:
  *   SPARK_DRIVER_MEM=3g SPARK_GRAFT_MEM_FRACTION=0.2 \
  *     sbt "runMain graft.tools.SpillSmoke [sfDir|/tmp/graft_scale_12x] [names...]"
  *
  * The heap comes from the fork JVM (build.sbt reads SPARK_DRIVER_MEM);
  * `spark.memory.fraction` shrinks the unified execution+storage region
  * inside it, which is what actually forces Tungsten's
  * spill-to-disk paths (UnsafeExternalSorter / ExternalAppendOnlyMap) at
  * small data scales. Hash parity under starvation is checked separately:
  * run graft.Verify with the same env + tools/oracle_check.py.
  *
  * Output, one line per query:
  *   SPILL <name> heap=<MB> wall=<s> rows=<n> memSpill=<MB> diskSpill=<MB>
  *     maxTask=<ms> p50Task=<ms>
  */
object SpillSmoke {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("t06_jaccard_pairs", "t32_span_dedup", "t23_canonical_docs",
        "s01_cosine_pairs")
    val fraction = sys.env.getOrElse("SPARK_GRAFT_MEM_FRACTION", "0.2")
    // The partition count is the 100 TB memory lever: per-task working
    // sets (hash-join builds, aggregate maps) are sized by
    // occurrences/partitions, so a starved heap with DEFAULT partitions
    // models a MIS-SIZED cluster — raise partitions to model the sized
    // one (the same data point, done right).
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32")
    val spark = graft.Sessions.graftDefaults(SparkSession.builder())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.memory.fraction", fraction)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val heapMb = Runtime.getRuntime.maxMemory() / (1024 * 1024)
    println(s"SPILLSMOKE sfDir=$sfDir heapMb=$heapMb memoryFraction=$fraction " +
      s"shufflePartitions=$parts")

    val catalog = graft.SparkEntry.queries
    names.foreach { name =>
      val fn = catalog.getOrElse(name, sys.error(s"unknown query: $name"))
      val memSpill = new java.util.concurrent.atomic.LongAdder
      val diskSpill = new java.util.concurrent.atomic.LongAdder
      val taskMs = new java.util.concurrent.ConcurrentLinkedQueue[Long]
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          if (e.taskMetrics != null) {
            memSpill.add(e.taskMetrics.memoryBytesSpilled)
            diskSpill.add(e.taskMetrics.diskBytesSpilled)
          }
          if (e.taskInfo != null) taskMs.add(e.taskInfo.duration)
        }
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        val t0 = System.nanoTime()
        val rows = fn(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        graft.Lifecycle.release(spark)
        Thread.sleep(500) // listener bus drains asynchronously
        val ds = taskMs.toArray(Array.empty[java.lang.Long])
          .map(_.longValue()).sorted
        val p50 = if (ds.isEmpty) 0L else ds(ds.length / 2)
        val mx = if (ds.isEmpty) 0L else ds.last
        println(f"SPILL $name heap=${heapMb}m wall=$dt%.2f rows=$rows " +
          f"memSpill=${memSpill.sum() / 1048576}m diskSpill=${diskSpill.sum() / 1048576}m " +
          s"maxTask=${mx}ms p50Task=${p50}ms")
      } catch {
        case e: Throwable =>
          println(s"SPILL $name FAILED: ${e.getClass.getSimpleName} ${e.getMessage}")
      } finally {
        // release in finally: a query that DIES under starvation must
        // not leak its cached/checkpointed blocks into the next
        // query's already-starved measurement
        try graft.Lifecycle.release(spark)
        catch { case _: Throwable => () }
        spark.sparkContext.removeSparkListener(listener)
      }
    }
    spark.stop()
  }
}
