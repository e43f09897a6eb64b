package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Scale notes (100 TB design): every loader returns a lazy parquet scan —
  * no caching, no collect. Catalyst pushes filters and prunes columns into
  * the `FileSourceScanExec` (verify via `.explain("formatted")`:
  * `PushedFilters` / `ReadSchema`). At cluster scale the same reads become
  * multi-file partitioned scans; nothing here assumes a single file.
  */
object Tables {
  def read(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = read(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = read(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = read(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = read(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = read(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = read(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = read(s, d, "lineitem")
  /** events.ts is a nanosecond-precision parquet timestamp, which Spark
    * has no native type for. Read it as raw nanos (legacy long mode) and
    * floor-divide to micros — exactly what DuckDB does when it coerces
    * TIMESTAMP_NS to its microsecond TIMESTAMP, so both engines see
    * identical values. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    read(s, d, "events").withColumn("ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")

  /** Name -> loader for every test table, the single source of truth for
    * per-table special handling (events' nanos timestamps). Consumers
    * that need "all tables" (e.g. [[graft.Views]]) iterate this instead
    * of re-listing names. */
  val loaders: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "region" -> (region _), "nation" -> (nation _), "customer" -> (customer _),
    "supplier" -> (supplier _), "part" -> (part _), "orders" -> (orders _),
    "lineitem" -> (lineitem _), "events" -> (events _),
    "documents" -> (documents _), "embeddings" -> (embeddings _))
}
