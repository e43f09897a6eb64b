package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Warm-pass decomposition of the two generation-serving gates (r18
  * VERDICT nit 1: the r17 "cap s13 ≤ ~1.0s" target was missed — the
  * monitor persistence landed but bought 0.12s — and the round's notes
  * did not say where the remaining 1.65s actually goes; this tool
  * answers that BEFORE anyone optimizes blind, and prices s19's
  * per-serve publish audit after the digest rework). Times, min-of-3
  * on a warm store: each servedGeneration arm (the monitor costs), each
  * probe plan, the s19 tombstone publish audit, and the full gate fns.
  * Numbers land in PLANS.md. */
object S13Profile {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.Sessions.graftDefaults(SparkSession.builder())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorExpressions.register(spark)
    import graft.operators.Similarity
    import Similarity.IvfIncIndex

    def time(label: String)(f: => Any): Double = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f
        val dt = (System.nanoTime() - t0) / 1e9
        graft.Lifecycle.release(spark); dt
      }
      val best = runs.min
      println(f"S13PROF $label%-46s min=${best}%6.3fs  runs=${runs.map(r => f"$r%5.3f").mkString(" ")}")
      best
    }

    // warm every publish-once artifact + JIT before measuring
    Similarity.s13.fn(spark, d).count(); graft.Lifecycle.release(spark)
    Similarity.s19.fn(spark, d).count(); graft.Lifecycle.release(spark)

    val full13 = time("s13 full (fn + count)") {
      Similarity.s13.fn(spark, d).count()
    }
    val quiet = time("  servedGeneration quiet arm (ring monitor)") {
      IvfIncIndex.servedGeneration(spark, d, None, "s13")
    }
    val drift = time("  servedGeneration drift arm (persisted mon)") {
      IvfIncIndex.servedGeneration(spark, d, Some(Similarity.shiftedEmb(spark, d)), "s13")
    }
    val probe1 = time("  probe over gen-1 maintained (count)") {
      val (qa, qc) = IvfIncIndex.servedGeneration(spark, d, None, "s13")
      Similarity.ivfProbeOn(qa, qc, _.filter(col("vec_id") < 10)).count()
    }
    val probe2 = time("  probe over gen-2 (count)") {
      val (da, dc) = IvfIncIndex.servedGeneration(spark, d,
        Some(Similarity.shiftedEmb(spark, d)), "s13")
      Similarity.ivfProbeOn(da, dc, _.filter(col("vec_id") < 10)).count()
    }
    println(f"S13PROF decomposition: monitors=${quiet + drift}%5.3fs " +
      f"probes(incl their monitor re-run)=${probe1 + probe2}%5.3fs " +
      f"full=${full13}%5.3fs")

    val full19 = time("s19 full (fn + count)") {
      Similarity.s19.fn(spark, d).count()
    }
    val audit = time("  s19 publish audit (digest agg + file read)") {
      IvfIncIndex.publishTombstones(spark, d, "s19",
        graft.Tables.embeddings(spark, d)
          .filter(col("vec_id") % 23 === 5).select(col("vec_id")))
    }
    println(f"S13PROF s19: audit=${audit}%5.3fs of full=${full19}%5.3fs")
    spark.stop()
  }
}
