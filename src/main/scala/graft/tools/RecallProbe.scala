package graft.tools
import org.apache.spark.sql.functions._
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.graftDefaults(org.apache.spark.sql.SparkSession.builder())
      .master("local[8]").config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select(col("query_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val emb = graft.Tables.embeddings(spark, d)
    val exact = pairs(graft.operators.Similarity.annTopK(
      emb, "vec_id", "embedding", emb.filter(col("vec_id") < 10), 3))
    val s09 = pairs(graft.operators.Similarity.s09.fn(spark, d))
    val s12 = pairs(graft.operators.Similarity.s12.fn(spark, d))
    val s14 = pairs(graft.operators.Similarity.s14.fn(spark, d))
    def r(a: Set[(Long,Long)], b: Set[(Long,Long)]) = (a & b).size.toDouble / a.size
    println(f"RECALL s09_vs_exact=${r(exact, s09)}%.4f s12_vs_exact=${r(exact, s12)}%.4f s14_vs_exact=${r(exact, s14)}%.4f s14_vs_s09=${r(s09, s14)}%.4f")
    spark.stop()
  }
}
