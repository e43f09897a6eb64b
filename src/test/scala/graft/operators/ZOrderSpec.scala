package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Pins the r11 claim the value-level oracle can't see: the Z-ordered
  * layout row-group-skips predicates on EITHER clustered dimension,
  * while the linear ts-sorted layout (r07) skips only time — its files
  * all span the full user range. */
class ZOrderSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  /** Rows the parquet reader actually emitted (post row-group pruning,
    * pre Spark-side filter) — same technique as CompactionSpec. */
  private def scanOutputRows(df: DataFrame): Long = {
    df.collect()
    val executed = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    executed.collectLeaves().collect {
      case s: FileSourceScanExec => s.metrics("numOutputRows").value
    }.sum
  }

  test("z-order skips on both dimensions; linear ts sort cannot skip on user") {
    SourcesStreaming.r11.fn(spark, sf).collect() // materialize z-ordered copy
    SourcesStreaming.r07.fn(spark, sf).collect() // materialize ts-sorted copy
    val zdir = s"${SourcesStreaming.zorderDir(sf)}/data"
    val ldir = s"${SourcesStreaming.clusterDir(sf)}/data"
    val total = graft.Tables.events(spark, sf).count()

    // ~10% slices of each dimension (150 users / 30 days at this SF)
    def userScan(dir: String) =
      spark.read.parquet(dir).filter(col("user_id") < 15)
    def tsScan(dir: String) =
      spark.read.parquet(dir)
        .filter(col("ts") >= lit(java.sql.Timestamp.valueOf("2024-01-10 00:00:00")) &&
          col("ts") < lit(java.sql.Timestamp.valueOf("2024-01-13 00:00:00")))

    // results agree regardless of layout (sanity before reading metrics)
    assert(userScan(zdir).count() == userScan(ldir).count())
    assert(tsScan(zdir).count() == tsScan(ldir).count())

    val zUser = scanOutputRows(userScan(zdir))
    val lUser = scanOutputRows(userScan(ldir))
    val zTs = scanOutputRows(tsScan(zdir))
    val lTs = scanOutputRows(tsScan(ldir))

    // the linear ts-sorted layout decodes EVERY row for a user filter:
    // each of its files spans the full user range
    assert(lUser == total, s"ts-sorted layout unexpectedly skipped: $lUser vs $total")
    // the z-ordered layout skips on user...
    assert(zUser < (total * 0.7).toLong, s"z layout did not skip on user: $zUser vs $total")
    // ...and still skips on time (both layouts must)
    assert(zTs < (total * 0.7).toLong, s"z layout did not skip on ts: $zTs vs $total")
    assert(lTs < (total * 0.7).toLong, s"ts-sorted layout did not skip on ts: $lTs vs $total")
  }
}
