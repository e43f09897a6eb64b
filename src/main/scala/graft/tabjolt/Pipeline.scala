package graft.tabjolt

import java.time.LocalDate
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pipeline configuration — the shape of the reference's config.json
  * (S3 source locations, SMTP endpoint; config.json:1-24). JDBC/Vertica
  * connection config has no analog: tables live wherever Spark reads
  * them. */
final case class PipelineConfig(
    summaryLinePath: String,
    winCounterPath: String,
    performanceSamplesPath: String,
    threadDetailsPath: String,
    rejectedPath: String,
    emailFrom: String = "graft@localhost",
    emailTo: Seq[String] = Seq("team@localhost"),
    emailSubject: String = "Tabjolt Daily Run Summary")

object PipelineConfig {
  import com.fasterxml.jackson.databind.JsonNode
  import scala.jdk.CollectionConverters._

  /** Load from a config.json (SURVEY.md §2.1 S2). Shape:
    * {"paths": {"summary_line": ..., "wincounter": ..., "performance_samples": ...,
    *            "thread_details": ..., "rejected": ...},
    *  "email": {"from": ..., "to": [...], "subject": ...}}
    * Paths may be any Hadoop-readable URI (file://, s3a://, hdfs://). */
  def fromJson(path: String): PipelineConfig = {
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(new java.io.File(path))
    def req(node: JsonNode, field: String): JsonNode = {
      val n = node.get(field)
      require(n != null, s"config: missing field '$field'")
      n
    }
    val p = req(root, "paths")
    val email = Option(root.get("email"))
    PipelineConfig(
      summaryLinePath = req(p, "summary_line").asText,
      winCounterPath = req(p, "wincounter").asText,
      performanceSamplesPath = req(p, "performance_samples").asText,
      threadDetailsPath = req(p, "thread_details").asText,
      rejectedPath = req(p, "rejected").asText,
      emailFrom = email.flatMap(e => Option(e.get("from"))).map(_.asText)
        .getOrElse("graft@localhost"),
      emailTo = email.flatMap(e => Option(e.get("to")))
        .map(_.elements.asScala.map(_.asText).toSeq)
        .getOrElse(Seq("team@localhost")),
      emailSubject = email.flatMap(e => Option(e.get("subject"))).map(_.asText)
        .getOrElse("Tabjolt Daily Run Summary"))
  }
}

/** End-to-end daily-report pipeline — the Spark re-expression of the
  * reference's __main__ (tabjolt_email.py:345-394): load the four tables
  * (rejected rows to the side sink), run the nine queries, render the
  * trend chart + HTML report, hand to the email sink.
  *
  * The S3 download step (tabjolt_email.py:351-359) has no separate
  * analog: Spark reads `s3a://` URIs in the *Path fields directly when a
  * Hadoop S3 filesystem is on the classpath — pulling objects to local
  * disk first would serialize the whole load through the driver.
  */
object Pipeline {

  final case class TabjoltTables(summaryLine: DataFrame, winCounter: DataFrame,
                                 performanceSamples: DataFrame, threadDetails: DataFrame,
                                 loads: Seq[Ingest.LoadResult]) {
    /** Release the ingest caches (call when done querying the tables). */
    def cleanup(): Unit = loads.foreach(_.cleanup())
  }

  def ingest(spark: SparkSession, cfg: PipelineConfig): TabjoltTables = {
    def one(path: String, schema: org.apache.spark.sql.types.StructType,
            delim: String): Ingest.LoadResult =
      Ingest.loadWithRejectedSink(spark, path, schema, delim, cfg.rejectedPath)
    val sl = one(cfg.summaryLinePath, Schemas.summaryLine, ",")
    val wc = one(cfg.winCounterPath, Schemas.winCounter, "\t")
    val ps = one(cfg.performanceSamplesPath, Schemas.performanceSamples, ",")
    val td = one(cfg.threadDetailsPath, Schemas.threadDetails, "\t")
    TabjoltTables(sl.good, wc.good, ps.good, td.good, Seq(sl, wc, ps, td))
  }

  /** Runs the full report for `runDate` and sends it through `sink`.
    * Returns the rendered HTML for inspection. */
  def runDaily(spark: SparkSession, cfg: PipelineConfig, runDate: LocalDate,
               sink: EmailSink): String = {
    val t = ingest(spark, cfg)
    try {

    def scalarString(df: DataFrame): String =
      df.collect().headOption.map(r => Option(r.get(0)).map(_.toString).getOrElse("")).getOrElse("No results found")

    val metrics = Seq(
      "Average time taken for tabjolt run (values are in ms):" ->
        scalarString(Queries.dailyMetric(t.summaryLine, runDate, "Avg")),
      "Maximum time taken for tabjolt run (values are in ms):" ->
        scalarString(Queries.dailyMetric(t.summaryLine, runDate, "Max")),
      "Minimum time taken for tabjolt run (values are in ms):" ->
        scalarString(Queries.dailyMetric(t.summaryLine, runDate, "Min")),
      "Tabjolt test cases executed at " ->
        scalarString(Queries.latestExecution(t.winCounter)),
      "Average Historic time taken for tabjolt run (values are in ms):" ->
        scalarString(Queries.historicAvg(t.summaryLine)))

    val chart = Report.trendChartSvg(
      Report.trendPoints(Queries.trendSeries(t.summaryLine)))
    // Collects are bounded: per-view aggregates are small by construction,
    // but todaysSamples is one row PER REQUEST SAMPLE — on a heavy test
    // day that is unbounded, so the render keeps the top maxRenderRows
    // slowest (the query is already sorted slowest-first).
    val maxRenderRows = 10000
    val htmlBody = Report.html(
      metrics,
      Queries.todaysSamples(t.performanceSamples, runDate).limit(maxRenderRows).collect().toSeq,
      Queries.regressions(t.performanceSamples, runDate).limit(maxRenderRows).collect().toSeq,
      Queries.improvements(t.performanceSamples, runDate).limit(maxRenderRows).collect().toSeq)

    sink.send(MimeMessage(cfg.emailFrom, cfg.emailTo, cfg.emailSubject,
      htmlBody, chart.getBytes("UTF-8"), "graph_cid"))
    htmlBody
    } finally t.cleanup() // release ingest caches on every path
  }
}
