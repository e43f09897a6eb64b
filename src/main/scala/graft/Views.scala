package graft

import org.apache.spark.sql.SparkSession

/** SQL API surface: registers every test table as a temp view (and the
  * graft_dot native function), so the reference's query style — SQL text
  * in, rows out (tabjolt_email.py:65-67) — works directly:
  *
  * {{{
  *   graft.Views.register(spark, sfDir)
  *   spark.sql("SELECT ... FROM lineitem JOIN orders ON ...")
  * }}}
  *
  * Views are lazy scans; registering costs nothing until a query runs.
  */
object Views {
  val names = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def register(spark: SparkSession, sfDir: String): Unit = {
    names.foreach { n =>
      val df = n match {
        case "events" => Tables.events(spark, sfDir) // nanos-ts handling
        case _        => Tables.read(spark, sfDir, n)
      }
      df.createOrReplaceTempView(n)
    }
    functions.VectorExpressions.register(spark)
  }
}
