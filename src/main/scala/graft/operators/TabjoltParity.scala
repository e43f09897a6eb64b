package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gate parity for the reference's Q1–Q7 (tabjolt_email.py:375-383):
  * each entry routes the REAL `graft.tabjolt.Queries` code — not a
  * re-implementation — through the DuckDB hash gate, the same way
  * tj01/tj02/tj03 already prove Q8a/Q8b. Inputs are reference-shaped
  * stringly frames derived deterministically from the `events` table, so
  * the oracle can rebuild them in SQL.
  *
  * Scale: Q1–Q6 are scans with scalar/tiny aggregates — partial
  * aggregation makes every shuffle a handful of rows regardless of input
  * size. Q7 is a filter + projection whose only full pass is the output
  * sort (a TopK in any real report, which bounds rows rendered).
  */
object TabjoltParity {

  private val RunDate = java.time.LocalDate.of(2024, 1, 30)

  /** events -> the reference's `tabjolt_summary_metrix` shape: one
    * stringly (summary_timestamp, summary_metrix, summary_value) row per
    * day per metric, Avg/Max/Min of the derived elapsed-ms. The unpivot
    * is a `stack` generate — per-row, no extra shuffle beyond the daily
    * aggregate. */
  private[operators] def eventsAsSummary(s: SparkSession, d: String): DataFrame = {
    val elapsed = floor(col("value") * 100).cast("int")
    Tables.events(s, d)
      .groupBy(col("ts").cast("date").as("day"))
      .agg(
        floor(avg(elapsed)).cast("int").as("avg_v"),
        max(elapsed).as("max_v"),
        min(elapsed).as("min_v"))
      .select(col("day"),
        expr("stack(3, 'Avg', avg_v, 'Max', max_v, 'Min', min_v) AS (summary_metrix, v)"))
      .select(col("day").cast("string").as("summary_timestamp"),
        col("summary_metrix"), col("v").cast("string").as("summary_value"))
  }

  /** Shared DuckDB mirror of [[eventsAsSummary]]. */
  private val SummaryCte =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day,
      |         CAST(FLOOR(AVG(CAST(FLOOR(value * 100) AS INTEGER))) AS INTEGER) AS avg_v,
      |         MAX(CAST(FLOOR(value * 100) AS INTEGER)) AS max_v,
      |         MIN(CAST(FLOOR(value * 100) AS INTEGER)) AS min_v
      |  FROM events GROUP BY 1
      |), summary AS (
      |  SELECT CAST(day AS VARCHAR) AS summary_timestamp, summary_metrix,
      |         CAST(v AS VARCHAR) AS summary_value
      |  FROM (SELECT day, 'Avg' AS summary_metrix, avg_v AS v FROM daily
      |        UNION ALL SELECT day, 'Max', max_v FROM daily
      |        UNION ALL SELECT day, 'Min', min_v FROM daily)
      |)""".stripMargin

  /** Q1/Q2/Q3 — today's Avg/Max/Min summary value, the three
    * `dailyMetric` calls the reference email makes, unioned with a metric
    * tag so one gate entry covers all three (tabjolt_email.py:375-377). */
  val tj04 = QueryDef(
    "tj04_reference_daily_metric",
    (s, d) => {
      // The REAL report code (Queries.dailyMetrics), one summary pass
      // for all three metric tags — unioning three per-metric frames
      // planned as a 3-branch Union each re-scanning + re-aggregating
      // events. dailyMetric (the per-scalar form the report path calls)
      // delegates to the same code, so the gate covers both.
      graft.tabjolt.Queries
        .dailyMetrics(eventsAsSummary(s, d), RunDate, Seq("Avg", "Max", "Min"))
        .orderBy(col("metric"))
    },
    Some(SummaryCte + """
      |SELECT summary_value, summary_metrix AS metric
      |FROM summary
      |WHERE TRY_CAST(summary_timestamp AS DATE) = DATE '2024-01-30'
      |  AND summary_metrix IN ('Avg', 'Max', 'Min')
      |ORDER BY metric""".stripMargin))

  /** Q4 — latest test execution: MAX over the cast timestamp
    * (tabjolt_email.py:378; the reference reads `tabjolt_win_counter`,
    * same stringly summary_timestamp column). */
  val tj05 = QueryDef(
    "tj05_reference_latest_execution",
    (s, d) => graft.tabjolt.Queries.latestExecution(eventsAsSummary(s, d)),
    Some(SummaryCte + """
      |SELECT MAX(TRY_CAST(summary_timestamp AS TIMESTAMP)) AS max_ts
      |FROM summary""".stripMargin))

  /** Q5 — historic average of the daily Avg with the reference's
    * CAST(AVG(x) AS INTEGER) pinned to Vertica's half-up rounding
    * (tabjolt_email.py:379). */
  val tj06 = QueryDef(
    "tj06_reference_historic_avg",
    (s, d) => graft.tabjolt.Queries.historicAvg(eventsAsSummary(s, d)),
    Some(SummaryCte + """
      |SELECT CAST(ROUND(AVG(TRY_CAST(summary_value AS DOUBLE)), 0) AS INTEGER)
      |         AS average_summary_value
      |FROM summary WHERE summary_metrix = 'Avg'""".stripMargin))

  /** Q6 — day-wise Avg trend series feeding the chart
    * (tabjolt_email.py:86). One row per day, so the date is already a
    * total order. */
  val tj07 = QueryDef(
    "tj07_reference_trend_series",
    (s, d) => graft.tabjolt.Queries.trendSeries(eventsAsSummary(s, d)),
    Some(SummaryCte + """
      |SELECT TRY_CAST(summary_timestamp AS DATE) AS summary_timestamp,
      |       TRY_CAST(summary_value AS INTEGER) AS summary_value
      |FROM summary WHERE summary_metrix = 'Avg'
      |ORDER BY summary_timestamp""".stripMargin))

  /** Q7's NULL-first edge needs dirty rows: corrupt every sample whose
    * elapsed ends in 3 to the reference's real-world failure shape (a
    * non-numeric field in the JTL). Q7 guards only the TIMESTAMP cast
    * (tabjolt_email.py:383), so these rows survive the filter, try_cast
    * to NULL elapsed, and must sort BEFORE the slowest real sample
    * (Vertica DESC = NULLS FIRST). */
  private[operators] def eventsAsSamplesDirty(s: SparkSession, d: String): DataFrame =
    Advanced.eventsAsSamples(s, d)
      .withColumn("elapsed_time_ms",
        when(col("elapsed_time_ms").try_cast("int") % 10 === 3, lit("n/a"))
          .otherwise(col("elapsed_time_ms")))

  /** Q7 — today's per-request samples, site views only, slowest first,
    * through the REAL `todaysSamples` code over the dirty frame. The
    * parity code orders by elapsed only; the gate adds deterministic
    * tiebreaks on top (tj01 pattern). */
  val tj08 = QueryDef(
    "tj08_reference_todays_samples",
    (s, d) =>
      graft.tabjolt.Queries.todaysSamples(eventsAsSamplesDirty(s, d), RunDate)
        .orderBy(col("elapsed_time").desc_nulls_first,
          col("request_label"), col("response_message")),
    Some("""WITH samples AS (
      |  SELECT CASE WHEN CAST(FLOOR(value * 100) AS INTEGER) % 10 = 3 THEN 'n/a'
      |              ELSE CAST(CAST(FLOOR(value * 100) AS INTEGER) AS VARCHAR) END
      |           AS elapsed_time_ms,
      |         '0' AS latency_time_ms,
      |         CAST(epoch_ms(ts) AS VARCHAR) AS timestamp_ms,
      |         'true' AS success_indicator,
      |         event_type AS request_label,
      |         'Site: g; View: ' || event_type AS response_message
      |  FROM events
      |)
      |SELECT TRY_CAST(elapsed_time_ms AS INTEGER) AS elapsed_time,
      |       latency_time_ms, success_indicator, request_label, response_message
      |FROM samples
      |WHERE regexp_matches(timestamp_ms, '^[0-9]+$')
      |  AND to_timestamp(CAST(timestamp_ms AS BIGINT) / 1000) >= TIMESTAMP '2024-01-30 00:00:00'
      |  AND response_message ILIKE '%site%' AND response_message NOT ILIKE '%null%'
      |ORDER BY elapsed_time DESC NULLS FIRST, request_label, response_message""".stripMargin))

  val catalog: Seq[QueryDef] = Seq(tj04, tj05, tj06, tj07, tj08)
}
