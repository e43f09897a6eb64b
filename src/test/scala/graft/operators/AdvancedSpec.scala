package graft.operators

import graft.SparkSpec

class AdvancedSpec extends SparkSpec {

  test("batch sessionization equals streaming flatMapGroupsWithState sessionize") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val batch = Advanced.e01.fn(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(2), r.getTimestamp(3), r.getLong(4)))
      .toSet
    val events = graft.Tables.events(spark, sf)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[graft.streaming.EventsStream.Event]
    val streaming = graft.streaming.EventsStream.sessionize(events, gapMinutes = 30)
      .collect()
      .map(s => (s.user_id, s.start, s.end, s.n_events))
      .toSet
    assert(batch == streaming)
  }

  test("curation keeps a nontrivial subset") {
    val sf = "/root/testdata/sf0.001"
    val total = graft.Tables.documents(spark, sf).count()
    val kept = Advanced.c01.fn(spark, sf).count()
    assert(kept > 0 && kept < total, s"kept=$kept of $total")
  }

  test("embedding dedup keepers are always lower ids") {
    val sf = "/root/testdata/sf0.001"
    val rows = Advanced.t09.fn(spark, sf).collect()
    assert(rows.forall(r => r.getLong(1) < r.getLong(0)))
  }
}
