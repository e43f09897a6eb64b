package graft.tabjolt

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Delimited bulk load with rejected-row capture — the Spark re-expression
  * of Vertica `COPY ... FROM LOCAL ... REJECTED DATA 'rejected.txt'`
  * (tabjolt_email.py:33-56): malformed rows are diverted, not fatal; the
  * load succeeds for the good rows.
  *
  * Mechanics: PERMISSIVE mode + `columnNameOfCorruptRecord` lands any row
  * that fails arity/quoting in the `_rejected` column; good rows flow on.
  * `multiLine=true` is required because JTL `rm` fields carry embedded
  * newlines inside quoted fields (rejected.txt:509-516, SURVEY.md §1.4).
  *
  * Dirty-data equivalence note (SURVEY.md §7.4): Vertica rejects rows that
  * fail DDL type coercion; we read as strings so only arity/quote errors
  * reject at load time — the numeric screening happens in the queries'
  * regexp guards, exactly as the reference's SQL does it.
  *
  * Scale: the read is a plain distributed file scan; the rejected sink is
  * an ordinary partitioned text write (no collect). `skipHeader` mirrors
  * the loader's SKIP 1 option (tabjolt_email.py:35) — note the reference
  * always passes skip_header=False in production (tabjolt_email.py:370).
  */
object Ingest {

  /** `parsed` is cached: Spark disallows queries whose only referenced
    * column from a raw CSV is the corrupt-record column (SPARK-38523) —
    * and that includes pruned plans like `good.count()`, whose sole
    * reference is the corrupt-null filter. The cache must therefore live
    * as long as EITHER frame is queried; call [[LoadResult.cleanup]] when
    * done with both, or the cache pins the table for the session. */
  final case class LoadResult(good: DataFrame, rejected: DataFrame,
                              private val parsed: DataFrame) {
    def rejectedCount: Long = rejected.count()
    def cleanup(): Unit = parsed.unpersist()
  }

  /** An empty table with `schema` — what a load resolves to when its
    * source is missing and the caller tolerates it (the reference skips
    * absent files and runs on what loaded, tabjolt_email.py:371-375). */
  def emptyLoad(spark: SparkSession, schema: StructType): LoadResult = {
    val good = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    val rejected = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      new StructType().add(Schemas.Rejected, org.apache.spark.sql.types.StringType))
    LoadResult(good, rejected, good) // unpersist on a non-cached frame is a no-op
  }

  /** Raw schema'd delimited read; rows that fail parse land in
    * [[Schemas.Rejected]]. */
  def read(spark: SparkSession, path: String, schema: StructType,
           delimiter: String, skipHeader: Boolean = false): DataFrame = {
    val df = spark.read
      .schema(schema)
      .option("delimiter", delimiter)
      .option("header", skipHeader)
      .option("multiLine", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", Schemas.Rejected)
      .csv(path)
    // A corrupt-record column can't be filtered straight off the reader
    // (SPARK-38523) — materialize the parse first.
    df
  }

  /** Split a schema'd read into good rows (parse columns only) and
    * rejected raw lines. */
  def load(spark: SparkSession, path: String, schema: StructType,
           delimiter: String, skipHeader: Boolean = false): LoadResult = {
    val parsed = read(spark, path, schema, delimiter, skipHeader).cache()
    val good = parsed.filter(col(Schemas.Rejected).isNull)
      .drop(Schemas.Rejected)
    val rejected = parsed.filter(col(Schemas.Rejected).isNotNull)
      .select(col(Schemas.Rejected))
    LoadResult(good, rejected, parsed)
  }

  /** Full COPY-equivalent: rejected raw rows appended to the side file
    * (the `rejected.txt` analog), the LoadResult returned so the caller
    * can query `good` and release the cache via cleanup() when done. */
  def loadWithRejectedSink(spark: SparkSession, path: String,
                           schema: StructType, delimiter: String,
                           rejectedPath: String,
                           skipHeader: Boolean = false): LoadResult = {
    val r = load(spark, path, schema, delimiter, skipHeader)
    // A sink failure (e.g. unwritable rejectedPath) must not orphan the
    // parse cache: callers that catch-and-substitute an empty load never
    // see this LoadResult, so its cleanup handle would be lost for the
    // session. Release before rethrowing.
    try r.rejected.write.mode("append").text(rejectedPath)
    catch { case e: Throwable => r.cleanup(); throw e }
    r
  }
}
