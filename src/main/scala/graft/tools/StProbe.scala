package graft.tools

import org.apache.spark.sql.SparkSession

/** Repeated-drain probe for the st* floor work: runs one st query N
  * times on a fresh session, printing wall time per run plus the drain
  * session's micro-batch progress (batch count, durationMs breakdown) —
  * the diagnosis loop for commit/state-store overhead. */
object StProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("st01_stream_hourly_agg")
    val n = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, d).count()
      val dt = (System.nanoTime() - t0) / 1e9
      // look up the SAME memoized child the drain used: toTable honors
      // GRAFT_DRAIN_PARTS, so the probe must too or it inspects an idle
      // sibling session and always reports zero active queries
      val parts = sys.env.get("GRAFT_DRAIN_PARTS").map(_.toInt).getOrElse(4)
      val s2 = graft.streaming.Drain.session(spark, parts)
      println(f"RUN $i dt=${dt}%5.2fs activeQueries=${s2.streams.active.length}")
      Option(graft.streaming.Drain.lastQuery).foreach { q =>
        q.recentProgress.foreach(p => println(s"  batch ${p.batchId} rows=${p.numInputRows} " +
          s"durationMs=${p.durationMs}"))
      }
      graft.Lifecycle.release(spark)
    }
    spark.stop()
  }
}
