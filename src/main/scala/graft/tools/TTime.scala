package graft.tools
import org.apache.spark.sql.SparkSession
/** Dev-only ad-hoc timer for one catalog query (min-of-3 at sf0.1). */
object TTime {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("t06_jaccard_pairs")
    val spark = graft.Sessions.graftDefaults(SparkSession.builder())
      .master("local[32]").config("spark.sql.shuffle.partitions","32")
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    fn(spark, "/root/testdata/sf0.001").count(); graft.Lifecycle.release(spark)
    val ts = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, "/root/testdata/sf0.1").count()
      val dt = (System.nanoTime()-t0)/1e9
      graft.Lifecycle.release(spark); dt
    }
    println(f"TTIME $name min=${ts.min}%.2f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    spark.stop()
  }
}
