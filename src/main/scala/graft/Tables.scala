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
  /** Memoized scan plans, keyed by (session identity, dir, table).
    *
    * `spark.read.parquet` eagerly lists files and reads parquet footers
    * for schema inference on EVERY call — ~10-40ms of driver-side work
    * per table reference. A DataFrame is an immutable logical plan, so
    * reusing one across queries is safe and removes that cost from each
    * of the catalog's ~86 gate queries (most reference 1-3 tables; the
    * bench pays the listing once per table instead of ~200 times). Keyed
    * by the session object (identity) so a plan is only ever served to
    * the session whose analyzer resolved it — tests and the mains use
    * separate sessions, and a cross-session plan is a correctness bug.
    *
    * Retention, stated honestly: although the outer map is a
    * WeakHashMap, entries are effectively PINNED for the JVM lifetime —
    * each cached DataFrame strongly references its SparkSession
    * (`Dataset.sparkSession`), so the value keeps the weak key
    * reachable and the entry can never be collected (the classic
    * value-refers-to-key WeakHashMap pitfall). That is acceptable here:
    * the process creates a bounded handful of sessions (the mains'
    * root + memoized children, one per test suite), and each entry is
    * a logical plan, not data. A session whose plans should be dropped
    * eagerly (e.g. a deployment that cycles sessions) calls [[evict]]
    * at teardown. */
  private val scans =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[(String, String), DataFrame]]()

  /** Drop all memoized scan plans for `spark`. Call at session teardown
    * if the session is being discarded before JVM exit — the WeakHashMap
    * cannot collect the entry on its own (see retention note above). */
  def evict(spark: SparkSession): Unit =
    scans.synchronized { scans.remove(spark); () }

  /** Memoization applies only to IMMUTABLE corpus roots (the driver's
    * read-only testdata; a deployment's snapshot dirs). A cached plan
    * pins its file listing, so a directory whose file set can change
    * between reads — scratch dirs that specs rewrite, index build
    * areas — must take a fresh scan every time or later reads see
    * deleted part-files. */
  private val ImmutableRoots = Seq("/root/testdata/")

  def read(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (ImmutableRoots.exists(sfDir.startsWith)) {
      // Global lock only for the cheap per-session map lookup/insert; the
      // parquet listing + footer read (10-40ms) runs OUTSIDE it on the
      // lock-free per-session TrieMap, so concurrent sessions' first-time
      // loads proceed in parallel. TrieMap.getOrElseUpdate may race two
      // threads into building the same plan, but only one wins the insert
      // and a duplicate `spark.read.parquet` is just a redundant listing
      // of an immutable dir — equivalent plans, no correctness hazard.
      val perSession = scans.synchronized {
        scans.computeIfAbsent(spark,
          _ => scala.collection.concurrent.TrieMap.empty[(String, String), DataFrame])
      }
      perSession.getOrElseUpdate((sfDir, name),
        spark.read.parquet(s"$sfDir/$name.parquet"))
    } else spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = read(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = read(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = read(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = read(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = read(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = read(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = read(s, d, "lineitem")
  /** events.ts arrives as one of two physical encodings depending on the
    * generator vintage, normalized here to session-zoned TimestampType so
    * every downstream plan sees one type:
    *
    *  - nanosecond parquet timestamp (no native Spark type): read as raw
    *    nanos (legacy long mode) and floor-divide to micros — exactly
    *    what DuckDB does when it coerces TIMESTAMP_NS to its microsecond
    *    TIMESTAMP, so both engines see identical values;
    *  - microsecond parquet timestamp without UTC adjustment: Spark reads
    *    TIMESTAMP_NTZ; cast to TimestampType — value-preserving under the
    *    pinned UTC session zone (build.sbt), and DuckDB reads the same
    *    file as its (naive) TIMESTAMP, so values again agree.
    *
    * The ns encoding is only READABLE under
    * `spark.sql.legacy.parquet.nanosAsLong=true`, which must be set at
    * session CREATION ([[Sessions.graftDefaults]] — every graft entry
    * point does) — this loader never mutates the caller's conf. A
    * caller-session `conf.set` here would be a session-global mutation,
    * the exact landmine class the r07 INT96 near-miss came from. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val raw = read(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
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
