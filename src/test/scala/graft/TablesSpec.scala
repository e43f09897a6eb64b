package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins [[Tables.events]]' dual-encoding normalization. The driver's
  * generator has shipped events.ts as a nanosecond INT64 timestamp (read
  * as long under nanosAsLong) in earlier vintages and as a microsecond
  * TIMESTAMP_NTZ in later ones; a loader assuming one encoding fails
  * analysis on every ts-dependent catalog query when the other arrives
  * (the round-10 regeneration broke 18 suites this way). Both encodings
  * must surface as session-zoned TimestampType with identical values. */
class TablesSpec extends SparkSpec {

  private def scratch(): String =
    java.nio.file.Files.createTempDirectory("graft-tables-spec").toString

  // 2024-01-15 12:34:56.789 UTC, expressed in epoch micros
  private val micros = 1705322096789000L

  test("events loader normalizes raw-long nanos ts to TimestampType") {
    val dir = scratch()
    import spark.implicits._
    // a bare INT64 column named ts models the nanosAsLong read of the
    // ns-vintage file (loader dispatches on the arrived LongType)
    Seq((1L, micros * 1000L, 7L, "click", 1.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Tables.events(spark, dir)
    assert(got.schema("ts").dataType == TimestampType)
    assert(got.select(unix_micros(col("ts"))).as[Long].head() == micros)
  }

  test("events loader normalizes TIMESTAMP_NTZ ts to TimestampType") {
    val dir = scratch()
    import spark.implicits._
    Seq((1L, micros, 7L, "click", 1.5, "{}"))
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("us")).cast(TimestampNTZType))
      .drop("us")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // confirm the fixture really persisted the NTZ encoding before
    // asserting the loader's normalization of it
    assert(spark.read.parquet(s"$dir/events.parquet")
      .schema("ts").dataType == TimestampNTZType)
    val got = Tables.events(spark, dir)
    assert(got.schema("ts").dataType == TimestampType)
    assert(got.select(unix_micros(col("ts"))).as[Long].head() == micros)
  }

  test("events loader passes session-zoned TimestampType through untouched") {
    val dir = scratch()
    import spark.implicits._
    Seq((1L, micros, 7L, "click", 1.5, "{}"))
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Tables.events(spark, dir)
    assert(got.schema("ts").dataType == TimestampType)
    assert(got.select(unix_micros(col("ts"))).as[Long].head() == micros)
  }

  test("streaming source matches the batch loader under the NTZ encoding") {
    // the real corpus is on the NTZ vintage today: drive the actual
    // streaming source over it and compare values against Tables.events
    val sf = "/root/testdata/sf0.001"
    val (_, drained) = streaming.Drain.toTable(spark, "tables_spec_src",
      org.apache.spark.sql.streaming.OutputMode.Append()) { s2 =>
      streaming.EventsStream.source(s2, sf)
        .select("event_id", "ts")
    }
    val batch = Tables.events(spark, sf).select("event_id", "ts")
    assert(drained.schema("ts").dataType == TimestampType)
    val a = drained.orderBy("event_id").collect().toSeq
    val b = batch.orderBy("event_id").collect().toSeq
    assert(a == b)
  }
}
