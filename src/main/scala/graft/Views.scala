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
  * Notes:
  *  - registration reads each table's parquet footer (schema inference),
  *    so it requires all table files to exist; query EXECUTION stays lazy;
  *  - `events` normalizes both physical ts encodings the generator has
  *    shipped (see [[Tables.events]]); reading the nanosecond vintage
  *    requires `spark.sql.legacy.parquet.nanosAsLong=true` at session
  *    CREATION ([[Sessions.graftDefaults]]) — no loader ever mutates
  *    the caller session's conf.
  */
object Views {
  def names: Seq[String] = Tables.loaders.map(_._1)

  def register(spark: SparkSession, sfDir: String): Unit = {
    Tables.loaders.foreach { case (name, load) =>
      load(spark, sfDir).createOrReplaceTempView(name)
    }
    functions.VectorExpressions.register(spark)
  }
}
