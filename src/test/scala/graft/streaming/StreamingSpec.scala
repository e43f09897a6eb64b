package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

class StreamingSpec extends SparkSpec {

  import EventsStream.{Event, Session}

  private def ts(minute: Int) = new java.sql.Timestamp(minute * 60000L)

  test("sessionize splits on the 30-minute gap and aggregates within sessions") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(
      Event(1, ts(0), 7, "click", 1.0),
      Event(2, ts(10), 7, "view", 2.0),
      Event(3, ts(100), 7, "click", 5.0),   // 90-min gap -> new session
      Event(4, ts(5), 9, "view", 3.0))
    val q = EventsStream.sessionize(mem.toDS())
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val sessions = spark.table("sessions").as[Session].collect()
      .sortBy(s => (s.user_id, s.start.getTime))
    assert(sessions.length == 3)
    val first = sessions(0)
    assert(first.user_id == 7 && first.n_events == 2 && first.sum_value == 3.0)
    assert(first.start == ts(0) && first.end == ts(10))
    assert(sessions(1).n_events == 1 && sessions(1).sum_value == 5.0)
    assert(sessions(2).user_id == 9)
  }

  test("streaming hourly agg equals the batch groupBy on the same data") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val streamed = EventsStream.hourlyAgg(spark, sf).collect()
    val batch = graft.Tables.events(spark, sf)
      .groupBy(window(col("ts"), "1 hour").getField("start").as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        graft.functions.Exact.exactSum(col("value")).as("sum_value"))
      .orderBy(col("hour"), col("event_type"))
      .collect()
    assert(streamed.toSeq == batch.toSeq)
  }
}
