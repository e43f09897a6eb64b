package graft.tools

import org.apache.spark.sql.SparkSession

/** Repeated-drain probe for the st* floor work: runs one st query N
  * times on a fresh session, printing wall time per run plus the drain
  * session's micro-batch progress (batch count, durationMs breakdown) —
  * the diagnosis loop for commit/state-store overhead. */
object StProbe {
  def main(args: Array[String]): Unit = {
    // "all" = every st* catalog entry, each N times (one JVM, shared
    // warmup) — the per-query floor breakdown in a single run
    val name = args.headOption.getOrElse("st01_stream_hourly_agg")
    val n = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    val names =
      if (name == "all") graft.SparkEntry.queries.keys.filter(_.startsWith("st")).toSeq.sorted
      else Seq(name)
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.graftDefaults(SparkSession.builder())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val mins = scala.collection.mutable.Map.empty[String, Double]
    names.foreach { qn =>
      val fn = graft.SparkEntry.queries(qn)
      (1 to n).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, d).count()
        val dt = (System.nanoTime() - t0) / 1e9
        mins(qn) = math.min(mins.getOrElse(qn, Double.MaxValue), dt)
        // look up the SAME memoized child the drain used: toTable honors
        // GRAFT_DRAIN_PARTS, so the probe must too or it inspects an idle
        // sibling session and always reports zero active queries
        val parts = sys.env.get("GRAFT_DRAIN_PARTS").map(_.toInt).getOrElse(4)
        val s2 = graft.streaming.Drain.session(spark, parts)
        println(f"$qn RUN $i dt=${dt}%5.2fs activeQueries=${s2.streams.active.length} " +
          graft.streaming.Drain.lastPhases)
        Option(graft.streaming.Drain.lastQuery).foreach { q =>
          q.recentProgress.foreach(p => println(s"  batch ${p.batchId} rows=${p.numInputRows} " +
            s"durationMs=${p.durationMs}"))
        }
        graft.Lifecycle.release(spark)
      }
    }
    println("MIN per query: " + names.map(qn => f"$qn=${mins(qn)}%.2f").mkString(" ") +
      f" TOTAL=${names.map(mins).sum}%.2f")
    spark.stop()
  }
}
