package graft.tabjolt

import java.nio.file.Files
import java.time.LocalDate
import org.apache.spark.sql.SparkSession

/** Runnable end-to-end demo of the daily-report pipeline over
  * reference-shaped fixture files: ingest (with a deliberately malformed
  * row diverted to the rejected sink) -> nine queries -> chart + HTML ->
  * capture email sink. Prints the MIME envelope head and where artifacts
  * landed. */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.graftDefaults(SparkSession.builder())
      .master("local[4]")
      .appName("graft-tabjolt-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = Files.createTempDirectory("tabjolt-demo")
    def write(name: String, content: String): String = {
      val f = dir.resolve(name); Files.writeString(f, content); f.toString
    }
    val cfg = PipelineConfig(
      summaryLinePath = write("summary_line.csv",
        """Avg,12661,2024-07-30
          |Min,12661,2024-07-30
          |Max,12661,2024-07-30
          |Err,0 0.00%,2024-07-30
          |Avg,9800,2024-07-29
          |Avg,11000,2024-07-28
          |this,row,is,malformed,beyond,the,schema,arity
          |""".stripMargin),
      winCounterPath = write("wincounter.tsv",
        Seq("1722333527860", "LOCALHOST", "Memory", "% Committed Bytes In Use", "", "61.72", "2024-07-30 15:30:13").mkString("\t") + "\n"),
      performanceSamplesPath = write("modified_workbook.csv",
        """t,lt,ts,s,lb,rc,rm,tn,dt,by,ng,na,
          |12661,0,1722333530042,true,Interact Viz Test,200,Site: genral; Workbook: wb; View: v1;,T 1-1,,1572926,1,5,x
          |772,0,1722333530999,true,Bootstrap request,200,Site: genral; Workbook: wb; View: v2;,T 1-1,,2048,1,5,x
          |9000,0,1722200000000,true,Interact Viz Test,200,Site: genral; Workbook: wb; View: v1;,T 1-1,,1572926,1,5,x
          |""".stripMargin),
      threadDetailsPath = write("thread_details.tsv",
        Seq("#1", "Threads: 5/5", "Samples: 1", "Latency: 10", "Resp.Time: 100", "Errors: 0").mkString("\t") + "\n"),
      rejectedPath = dir.resolve("rejected").toString)

    val sink = new CaptureEmailSink
    val html = Pipeline.runDaily(spark, cfg, LocalDate.of(2024, 7, 30), sink)

    val rejected = spark.read.text(cfg.rejectedPath).collect().map(_.getString(0))
    println(s"DEMO rejected rows captured: ${rejected.length} -> ${rejected.headOption.getOrElse("")}")
    println(s"DEMO emails sent: ${sink.sent.size}, subject: ${sink.sent.head.subject}")
    println("DEMO mime head:\n" + sink.sent.head.render.linesIterator.take(6).mkString("\n"))
    println("DEMO html excerpt:\n" + html.linesIterator.filter(_.contains("table")).take(2).mkString("\n"))
    println(s"DEMO html length: ${html.length}")
    spark.stop()
  }
}
