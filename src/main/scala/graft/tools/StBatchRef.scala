package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.Exact._

/** Batch-plan reference for the st* floor work: the same hourly
  * aggregate st01 drains, run as a plain batch query on the same
  * session layout — the irreducible compute below the streaming tax. */
object StBatchRef {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.graftDefaults(SparkSession.builder())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    (1 to 6).foreach { i =>
      val t0 = System.nanoTime()
      val n = graft.Tables.events(spark, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), exactSum(col("value")).as("sum_value"))
        .count()
      println(f"BATCHREF $i dt=${(System.nanoTime()-t0)/1e9}%5.2fs rows=$n")
    }
    spark.stop()
  }
}
