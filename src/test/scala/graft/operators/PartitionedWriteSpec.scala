package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Partitioned sink + partition pruning: the write side of the 100 TB
  * story. Events written partitioned by date are read back with a date
  * filter that prunes at the DIRECTORY level — the scan never lists the
  * other partitions' files. */
class PartitionedWriteSpec extends SparkSpec {

  test("date-partitioned write prunes partitions on read") {
    val sf = "/root/testdata/sf0.001"
    val out = java.nio.file.Files.createTempDirectory("graft-part").toString + "/events_by_day"
    Tables.events(spark, sf)
      .withColumn("day", col("ts").cast("date"))
      .write.mode("overwrite").partitionBy("day").parquet(out)

    val read = spark.read.parquet(out)
      .filter(col("day") === "2024-01-15")
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("2024-01-15"),
      s"expected partition filter in:\n$plan")
    // pruned scan reads exactly the one day
    val expected = Tables.events(spark, sf)
      .filter(col("ts").cast("date") === "2024-01-15").count()
    assert(read.count() == expected)
    assert(expected > 0)
  }

  test("r04 gate query prunes the lang partitions it filters") {
    val sf = "/root/testdata/sf0.001"
    val df = SourcesStreaming.r04.fn(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("en"),
      s"expected lang partition filter in:\n$plan")
    assert(df.count() ==
      Tables.documents(spark, sf).filter(col("lang") === "en").count())
  }
}
