package graft.tabjolt

import java.time.LocalDate
import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Q1-Q8b semantics against the FIXTURES.md §A scenarios, pinned
  * runDate = 2024-07-30 (UTC). */
class QueriesSpec extends SparkSpec {

  private val runDate = LocalDate.of(2024, 7, 30)
  // epoch millis, UTC
  private val Midnight = 1722297600000L          // 2024-07-30 00:00:00
  private val Today = Midnight + 10 * 3600 * 1000L
  private val Yesterday = Midnight - 14 * 3600 * 1000L
  private val TenDaysAgo = Midnight - 10 * 24 * 3600 * 1000L

  private def summaryDf: DataFrame = {
    import spark.implicits._
    Seq(
      ("Avg", "12661", "2024-07-30"),
      ("Min", "12661", "2024-07-30"),
      ("Max", "12661", "2024-07-30"),
      ("Err", "0 0.00%", "2024-07-30"), // non-numeric on purpose
      ("Avg", "10000", "2024-07-29"))
      .toDF("summary_metrix", "summary_value", "summary_timestamp")
  }

  private val V1 = "Site: a; Workbook: w; View: v1;" // regression view
  private val V2 = "Site: a; Workbook: w; View: v2;" // improvement view
  private val VNull = "Site: a; Workbook: w; View: null;" // excluded

  private def row(elapsed: String, ts: String, rm: String) =
    (elapsed, "0", ts, "true", "Interact Viz Test", "200", rm,
      "T 1-1", "", "1000", "1", "5", rm)

  private def samplesDf: DataFrame = {
    import spark.implicits._
    Seq(
      // JTL header loaded as data — must be screened by the guards
      row("t", "ts", "rm"),
      // v1: historical 100,100 + today's 200 => avg 133.33, pct +50
      row("100", TenDaysAgo.toString, V1),
      row("100", TenDaysAgo.toString, V1),
      row("200", Today.toString, V1),
      // v2: historical 1000,1000 + 300 yesterday (inside 3-day window,
      // outside today) => Q8b only, pct -60.87
      row("1000", TenDaysAgo.toString, V2),
      row("1000", TenDaysAgo.toString, V2),
      row("300", Yesterday.toString, V2),
      // null view excluded everywhere
      row("999", Today.toString, VNull),
      // sub-second after midnight — float division must keep it "today"
      row("50", (Midnight + 500).toString, V1))
      .toDF(Schemas.performanceSamples.fieldNames.filterNot(_ == Schemas.Rejected): _*)
  }

  test("Q1-Q3 daily metric picks the run date and metric") {
    val avg = Queries.dailyMetric(summaryDf, runDate, "Avg").collect()
    assert(avg.map(_.getString(0)).toSeq == Seq("12661"))
    val err = Queries.dailyMetric(summaryDf, runDate, "Err").collect()
    assert(err.map(_.getString(0)).toSeq == Seq("0 0.00%"))
    assert(Queries.dailyMetric(summaryDf, LocalDate.of(2020, 1, 1), "Avg").isEmpty)
  }

  test("Q5 historic average rounds half-up like Vertica's int cast") {
    // (12661 + 10000) / 2 = 11330.5 -> 11331
    val v = Queries.historicAvg(summaryDf).collect()(0).getInt(0)
    assert(v == 11331)
  }

  test("Q6 trend series is date-ordered ints, Avg only") {
    val pts = Queries.trendSeries(summaryDf).collect()
    assert(pts.map(_.getInt(1)).toSeq == Seq(10000, 12661))
    assert(pts.map(_.getDate(0).toString).toSeq == Seq("2024-07-29", "2024-07-30"))
  }

  test("Q7 screens the header row, null views, and pre-midnight rows; sorts desc") {
    val got = Queries.todaysSamples(samplesDf, runDate).collect()
    // today's rows: v1 200, v1 50 (the +500ms one); header/null/old excluded
    assert(got.map(_.getInt(0)).toSeq == Seq(200, 50))
    assert(got.forall(r => r.getString(4).contains("Site")))
  }

  test("Q7 sorts a NULL elapsed_time first, like Vertica DESC") {
    // reference Q7 guards only the timestamp cast (tabjolt_email.py:383):
    // a row with numeric timestamp but non-numeric elapsed_time_ms
    // reaches the sort as NULL and Vertica's DESC puts NULLs first
    import spark.implicits._
    val withBadElapsed = samplesDf.union(Seq(
      row("fast", Today.toString, V1)).toDF(samplesDf.columns: _*))
    val got = Queries.todaysSamples(withBadElapsed, runDate).collect()
    assert(got.head.isNullAt(0), "NULL elapsed_time must sort first")
    assert(got.tail.map(_.getInt(0)).toSeq == Seq(200, 50))
  }

  test("Q8a regression pct-diff and ordering") {
    val got = Queries.regressions(samplesDf, runDate).collect()
    // v1 has avg (100+100+200+50)/4 = 112.5; currents today: 200 (+77.78%)
    // kept, 50 dropped by avg<current
    assert(got.length == 1)
    val r = got(0)
    assert(r.getString(2) == V1)
    assert(math.abs(r.getDouble(3) - ((200 - 112.5) / 112.5 * 100.0)) < 1e-9)
  }

  test("Q8b improvements respect the 3-day window and -40 threshold") {
    val got = Queries.improvements(samplesDf, runDate).collect()
    // v2: avg (1000+1000+300)/3 = 766.67; current window (>= 7/27) has 300
    // pct = -60.87 < -40 kept. v1's 50-today row: avg 112.5 -> -55.56 kept.
    assert(got.map(_.getString(2)).toSet == Set(V1, V2))
    assert(got.forall(_.getDouble(3) < -40.0))
  }

  test("alert flag is null-safe") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq((Some(25.0)), (Some(10.0)), (None: Option[Double]))
      .toDF("percentage_difference")
    val flags = Queries.withAlertFlag(df).select(col("is_alert"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(flags == Seq(true, false, false))
  }

  test("Q4 latest execution is the max timestamp") {
    import spark.implicits._
    val wc = Seq(
      ("1", "H", "Memory", "c", "", "0", "2024-07-30 15:30:13"),
      ("2", "H", "Memory", "c", "", "0", "2024-07-30 16:45:00"))
      .toDF(Schemas.winCounter.fieldNames.filterNot(_ == Schemas.Rejected): _*)
    val ts = Queries.latestExecution(wc).collect()(0).getTimestamp(0)
    assert(ts.toString == "2024-07-30 16:45:00.0")
  }
}
