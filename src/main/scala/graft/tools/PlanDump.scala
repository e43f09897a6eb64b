package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: dump the formatted physical plan of one catalog query. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.graftDefaults(SparkSession.builder())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val name = args.headOption.getOrElse("t06_jaccard_pairs")
    val fn = graft.SparkEntry.queries(name)
    fn(spark, d).explain("formatted")
    spark.stop()
  }
}
