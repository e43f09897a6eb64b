package graft.tools

import graft.Lifecycle
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only A/B harness for plan variants, timed the way Bench times
  * (min of two cold runs after a warmup, Lifecycle.release outside the
  * clock). Superseded rounds' experiments live in git history — each
  * round rewrites this file with the variants under decision, keeping
  * the losing production form as a re-runnable baseline.
  *
  * r22 experiment 2 (experiment 1 — the kernel bytesPerTask divisor —
  * is in git history at commit 31f35de): width of the 16-bit banded
  * hamming verify's per-hash pin (the r21 §7 repartition that
  * un-coalesces the KB-scale aggregate so the broadcast band join's
  * stream side parallelizes). QueryProf shows the verify stage at 32
  * tasks × ~570 ms executor time in st11/c10 — the same
  * inflated-per-task signature the kernel fan-outs had. This times the
  * verify in isolation per width.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.Tune"
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

    args.headOption match {
      case Some("verify16") =>
        // r22 experiment 2: width of the 16-bit banded verify's per-hash
        // pin. RESULT (sf0.1/c32): w1 0.752s, w2 0.597s, w4 0.518s,
        // w8 0.744s, w16 1.044s, w32 0.542s — flat within host noise;
        // the pin width moves task-time sums (3-18s) but not wall. Left
        // at defaultParallelism (r21 §7's setting).
        import graft.operators.Multimodal.MediaIndex
        val state = MediaIndex.maintained(spark, d)
        val hashes = state.select(col("phash")).distinct().count()
        println(s"distinct hashes: $hashes")
        Lifecycle.release(spark)
        Seq(1, 2, 4, 8, 16, 32).foreach { w =>
          timeMin(s"verify16_pin_w$w") {
            val perHash = MediaIndex.maintained(spark, d)
              .groupBy(col("phash")).agg(min(col("id")).as("min_id"))
              .repartition(w)
              .localCheckpoint()
            MediaIndex.nearDupKeepersFrom(perHash)
          }
        }
      case _ =>
        // r22 experiment 3: AQE coalescePartitions.parallelismFirst —
        // Spark's docs recommend false in production (coalesce to the
        // advisory size, not to the core count). A/B over shuffle-heavy
        // catalog entries; the conf is runtime-settable.
        val entries = Seq(
          "t06_jaccard_pairs", "q12_window_topk", "q25_window_suite",
          "e01_sessionization", "s01_cosine_pairs", "t10_tfidf_topterms",
          "q14_pricing_summary", "v02_pmi_bigrams", "t32_span_dedup",
          "mm11_phash_chain_clusters", "st05_stream_cms",
          "st09_stream_join_subkeyed")
        val qs = graft.SparkEntry.queries
        val totals = scala.collection.mutable.Map.empty[String, Double]
          .withDefaultValue(0.0)
        entries.foreach { n =>
          val fn = qs(n)
          Seq("true", "false").foreach { pf =>
            spark.conf.set(
              "spark.sql.adaptive.coalescePartitions.parallelismFirst", pf)
            totals(pf) += timeMin(s"$n pfirst=$pf")(fn(spark, d))
          }
          spark.conf.unset(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst")
        }
        println(f"\nTOTALS: pfirst=true ${totals("true")}%.3f  " +
          f"pfirst=false ${totals("false")}%.3f")
    }
    spark.stop()
  }
}
