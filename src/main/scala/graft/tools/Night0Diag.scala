package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch decomposition of the ring's night-0 build (r15): times the
  * candidate stage and the verify stage separately for the night-0
  * filter vs the resident filter, so the slow stage is identified by
  * measurement. */
object Night0Diag {
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
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val v = f
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%7.1fs")
      graft.Lifecycle.release(spark); v
    }
    def cand(pred: org.apache.spark.sql.Column): org.apache.spark.sql.DataFrame = {
      val bands = TextDedup.corpusBands(spark, dir).filter(pred)
      val x = bands.select(col("doc_id").as("doc1"), col("band_idx"), col("band_hash"))
      val y = bands.select(col("doc_id").as("doc2"),
        col("band_idx").as("bi2"), col("band_hash").as("bh2"))
      x.join(y, x("band_idx") === y("bi2") && x("band_hash") === y("bh2") &&
          col("doc1") < col("doc2"))
        .select(col("doc1"), col("doc2")).distinct()
    }
    val present0 = col("doc_id") % 10 =!= 3 && col("doc_id") % 10 =!= 7
    val resident = col("doc_id") % 10 =!= 7
    val c0 = time("night0 candidates")(cand(present0).count())
    val cR = time("resident candidates")(cand(resident).count())
    println(s"candidates: night0=$c0 resident=$cR")
    // verify stage alone, same candidate sets, docs filtered vs not
    val n0 = time("night0 verify (docs filtered)")(
      TextDedup.verifyJaccardOf(
        graft.Tables.documents(spark, dir).filter(present0), cand(present0)).count())
    val nR = time("resident verify (docs full)")(
      TextDedup.verifyJaccardOf(
        graft.Tables.documents(spark, dir), cand(resident)).count())
    // the cross: night0 candidates, UNfiltered docs on the verify side
    val nX = time("night0 cand + docs full")(
      TextDedup.verifyJaccardOf(
        graft.Tables.documents(spark, dir), cand(present0)).count())
    println(s"pairs: night0=$n0 resident=$nR cross=$nX")
    spark.stop()
  }
}
