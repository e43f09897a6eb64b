package graft.tools

import org.apache.spark.sql.SparkSession

/** Controlled A/B for the night-0 anomaly: warmup first, then composed
  * night0 vs resident vs night0 again, one JVM, Lifecycle-released. */
object Night0Diag2 {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.graftDefaults(SparkSession.builder())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/tmp/graft_scale_25x"
    spark.conf.set("spark.graft.bands.mode", "persisted")
    import graft.operators.TextDedup
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$tag%-24s ${(System.nanoTime() - t0) / 1e9}%7.1fs ($n rows)")
      graft.Lifecycle.release(spark)
    }
    // warmup: the whole pipeline shape at sf0.1 (kernels, codegen, JIT)
    TextDedup.t07.fn(spark, "/root/testdata/sf0.1").count()
    graft.Lifecycle.release(spark)
    time("night0 composed #1")(
      TextDedup.PromotedPairIndex.night0Plan(spark, dir).count())
    time("resident composed")(TextDedup.residentPlan(spark, dir).count())
    time("night0 composed #2")(
      TextDedup.PromotedPairIndex.night0Plan(spark, dir).count())
    spark.stop()
  }
}
