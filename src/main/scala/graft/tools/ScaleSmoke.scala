package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-growth experiment: synthesize K x the documents table into /tmp
  * and time the exact inverted-index Jaccard (t06) against MinHash+LSH
  * (t07) as N grows. The point being demonstrated: the exact all-pairs
  * structure grows super-linearly (every shared shingle contributes a
  * pair row), while LSH candidate generation stays ~linear — the reason
  * t07 is the 100 TB path. Results recorded in PLANS.md. */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = graft.Tables.documents(spark, "/root/testdata/sf0.1")
    val n0 = base.count()
    Seq(1, 4, 12).foreach { k =>
      val dir = s"/tmp/graft_scale_${k}x"
      // K copies; copies beyond the first get the replica id appended to
      // every token so they are distinct-but-similar documents.
      val copies = (0 until k).map { i =>
        if (i == 0) base
        else base.select(
          (col("doc_id") + lit(i.toLong * 1000000L)).as("doc_id"),
          concat(col("text"), lit(s" replica$i")).as("text"),
          col("lang"), col("source"), col("n_chars"))
      }
      copies.reduce(_ unionAll _).write.mode("overwrite")
        .parquet(s"$dir/documents.parquet")
      // warm the file cache / JIT on first use
      graft.operators.TextDedup.t05.fn(spark, dir).count()
      def time(f: => Long): (Double, Long) = {
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val (tExact, nExact) = time(graft.operators.TextDedup.t06.fn(spark, dir).count())
      val (tLsh, nLsh) = time(graft.operators.TextDedup.t07.fn(spark, dir).count())
      println(f"SCALE docs=${n0 * k}%7d exact=${tExact}%6.1fs ($nExact pairs)  lsh=${tLsh}%6.1fs ($nLsh pairs)")
    }
    spark.stop()
  }
}
