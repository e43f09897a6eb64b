package graft.tools

import graft.Lifecycle
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev-only A/B harness for plan variants, timed the way Bench times
  * (min of two cold runs after a warmup, Lifecycle.release outside the
  * clock). Superseded rounds' experiments live in git history — each
  * round rewrites this file with the variants under decision, keeping
  * the losing production form as a re-runnable baseline.
  *
  * r22: pick `spark.graft.kernel.bytesPerTask` (the [[graft.operators.Fanout]]
  * divisor) for the kernel fan-outs that replaced the core-count
  * repartitions. bytesPerTask=1 reproduces the legacy width (cap =
  * defaultParallelism); large values drive the width toward 1. Each
  * variant runs the PRODUCTION query body — only the conf moves.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.Tune [entrySubstr]"
  */
object Tune {
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
    val only = args.headOption

    def timeMin(name: String)(f: => DataFrame): Double = {
      def once: Double = {
        val t0 = System.nanoTime()
        val n = f.count()
        val dt = (System.nanoTime() - t0) / 1e9
        Lifecycle.release(spark)
        if (n < 0) -1 else dt
      }
      once // warmup
      val dt = math.min(once, once)
      println(f"TUNE $name%-34s $dt%7.3fs")
      dt
    }

    val entries = Seq(
      "t33_oov_novelty", "v03_source_divergence", "sk03_bloom_decon",
      "t32_span_dedup", "t06_jaccard_pairs", "sk05_hll_by_source",
      "sk01_cms_topk", "t34_pair_index_delta", "t26_chunk_dedup",
      "t10_tfidf_topterms", "t08_simhash_pairs", "v02_pmi_bigrams")
      .filter(n => only.forall(n.contains))
    val qs = graft.SparkEntry.queries

    // widths at sf0.1 (~600 KB documents): 1 B/task -> 32 (legacy),
    // 16k -> 32+, 64k -> ~9, 150k -> 4, 300k -> 2, 1 MB -> 1
    val divisors = Seq(128L << 10, 150L << 10, 200L << 10)
    val totals = scala.collection.mutable.Map.empty[Long, Double].withDefaultValue(0.0)
    entries.foreach { n =>
      val fn = qs(n)
      divisors.foreach { bpt =>
        spark.conf.set("spark.graft.kernel.bytesPerTask", bpt.toString)
        totals(bpt) += timeMin(s"$n bpt=$bpt")(fn(spark, d))
      }
      spark.conf.unset("spark.graft.kernel.bytesPerTask")
    }
    println("\nTOTALS per bytesPerTask:")
    divisors.foreach(bpt => println(f"  bpt=$bpt%8d  ${totals(bpt)}%7.3fs"))
    spark.stop()
  }
}
