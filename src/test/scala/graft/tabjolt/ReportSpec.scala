package graft.tabjolt

import java.time.LocalDate
import graft.SparkSpec
import org.apache.spark.sql.Row

/** Local filesystem that claims the `graftmock://` scheme — exists so the
  * fetch test below can prove scheme dispatch goes through the Hadoop
  * conf's `fs.<scheme>.impl` lookup (the mechanism that binds `s3a://`
  * to S3AFileSystem on a deployment classpath). */
class GraftMockFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("graftmock:///")
}

class ReportSpec extends SparkSpec {

  test("SVG chart renders one marker and label per point with 1000ms grid") {
    val pts = Seq(
      Report.TrendPoint(LocalDate.of(2024, 7, 29), 10000),
      Report.TrendPoint(LocalDate.of(2024, 7, 30), 12661))
    val svg = Report.trendChartSvg(pts)
    assert(svg.contains("<circle") && svg.split("<circle").length == 3)
    assert(svg.contains(">12661<") && svg.contains(">10000<"))
    assert(svg.contains(">13000<")) // y-axis headroom tick at next 1000
  }

  test("empty series renders the reference's 'No results found'") {
    assert(Report.trendChartSvg(Nil).contains("No results found"))
  }

  test("PNG chart decodes at 1000x600 with the marker pixel in line-blue") {
    val pts = Seq(
      Report.TrendPoint(LocalDate.of(2024, 7, 29), 10000),
      Report.TrendPoint(LocalDate.of(2024, 7, 30), 12661))
    val png = Report.trendChartPng(pts)
    // PNG magic
    assert((png(0) & 0xff) == 0x89 && new String(png.slice(1, 4)) == "PNG")
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img.getWidth == 1000 && img.getHeight == 600)
    // background
    assert((img.getRGB(5, 5) & 0xffffff) == 0xffffff)
    // last point's marker center: x = mL + (w-mL-mR) = 970;
    // yMax = 13000, y = (600-110) - 12661/13000*(600-110-40) ≈ 51.7
    val cy = math.round((600 - 110) - 12661.0 / 13000 * (600 - 110 - 40)).toInt
    assert((img.getRGB(970, cy) & 0xffffff) == 0x1f77b4,
      f"marker pixel was 0x${img.getRGB(970, cy) & 0xffffff}%06x")
    // empty series still encodes a valid image with the fallback text
    val empty = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Report.trendChartPng(Nil)))
    assert(empty.getWidth == 1000 && empty.getHeight == 600)
  }

  test("regression cells go red above +20% and never on NULL pct") {
    val rows = Seq(
      Row(100.0, 200, "Site: v1;", 100.0),  // alert
      Row(100.0, 110, "Site: v2;", 10.0),   // no alert
      Row(0.0, 5, "Site: v0;", null))       // NULL pct: no alert, no crash
    val html = Report.html(Seq("m" -> "1"), Nil, rows, Nil)
    assert(html.split("color:red").length - 1 == 4) // one row of 4 cells
    assert(html.contains("100.00%"))
  }

  test("MIME message carries html + inline image with the graph cid") {
    val m = MimeMessage("a@x", Seq("b@y"), "subj", "<html>Hi</html>",
      "<svg/>".getBytes, "graph_cid")
    val s = m.render
    assert(s.contains("Content-ID: <graph_cid>"))
    assert(s.contains("multipart/related"))
    assert(s.contains("<html>Hi</html>"))
    val capture = new CaptureEmailSink
    capture.send(m)
    assert(capture.sent.size == 1)
  }

  test("fetch stage copies what it can and logs-and-continues on failure") {
    import java.nio.file.Files
    val src = Files.createTempFile("fetch-src", ".csv")
    Files.writeString(src, "a,b\n")
    val destDir = Files.createTempDirectory("fetch-dest")
    val results = Fetch.fetchAll(spark, Seq(
      (src.toString, s"$destDir/ok.csv"),
      ("/nonexistent/missing.csv", s"$destDir/missing.csv")))
    assert(results.map(_.ok) == Seq(true, false))
    assert(Files.readString(java.nio.file.Path.of(s"$destDir/ok.csv")) == "a,b\n")
    assert(results(1).error.nonEmpty)
  }

  test("fetch dispatches filesystems by URI scheme through conf, not special-casing") {
    // Register an alias scheme whose impl comes from the SAME conf lookup
    // (fs.<scheme>.impl) that binds s3a:// to S3AFileSystem when
    // hadoop-aws is on a deployment's classpath. Fetch copying through
    // it proves the path is scheme-agnostic: nothing in Fetch or the
    // pipeline inspects the scheme itself.
    import java.nio.file.Files
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.graftmock.impl", classOf[GraftMockFileSystem].getName)
    val src = Files.createTempFile("fetch-scheme-src", ".csv")
    Files.writeString(src, "x,y\n")
    val destDir = Files.createTempDirectory("fetch-scheme-dest")
    val results = Fetch.fetchAll(spark, Seq(
      (s"graftmock://$src", s"$destDir/via-scheme.csv")))
    assert(results.map(_.ok) == Seq(true))
    assert(Files.readString(java.nio.file.Path.of(s"$destDir/via-scheme.csv")) == "x,y\n")
  }

  // The former conditional "s3a binds when hadoop-aws is present" test
  // (always canceled in this offline container) is superseded by
  // ObjectStoreFetchSpec: an ALWAYS-EXECUTED end-to-end of the S1 path
  // against an in-JVM object store bound through the identical
  // fs.<scheme>.impl mechanism, on the reference's actual sample bytes.

  test("a missing source yields an empty table and the report still sends") {
    import java.nio.file.Files
    def write(name: String, content: String): String = {
      val f = Files.createTempFile(name, ".txt"); Files.writeString(f, content); f.toString
    }
    val cfg = PipelineConfig(
      summaryLinePath = write("summary", "Avg,12661,2024-07-30\n"),
      winCounterPath = "/nonexistent/wincounter.tsv", // fetch failed upstream
      performanceSamplesPath = write("samples",
        "t,lt,ts,s,lb,rc,rm,tn,dt,by,ng,na,\n" +
          "12661,0,1722333530042,true,Interact Viz Test,200,Site: a; View: v;,T,,99,1,5,x\n"),
      threadDetailsPath = write("threads", "#1\tThreads: 5/5\tSamples: 1\tLatency: 10\tResp.Time: 100\tErrors: 0\n"),
      rejectedPath = Files.createTempDirectory("rej").toString + "/rejected")
    val sink = new CaptureEmailSink
    val html = Pipeline.runDaily(spark, cfg, LocalDate.of(2024, 7, 30), sink)
    assert(sink.sent.size == 1, "report must send despite the missing source")
    assert(html.contains("12661"))
    // the wincounter-driven metric falls back to the reference's empty text
    assert(html.contains("No results found"))
  }

  test("pipeline end-to-end on fixture files (capture sink)") {
    import java.nio.file.Files
    def write(name: String, content: String): String = {
      val f = Files.createTempFile(name, ".txt"); Files.writeString(f, content); f.toString
    }
    val cfg = PipelineConfig(
      summaryLinePath = write("summary", "Avg,12661,2024-07-30\nMax,12661,2024-07-30\nMin,12661,2024-07-30\nErr,0 0.00%,2024-07-30\n"),
      winCounterPath = write("wincounter", "1722333527860\tH\tMemory\tc\t\t0\t2024-07-30 15:30:13\n"),
      performanceSamplesPath = write("samples",
        "t,lt,ts,s,lb,rc,rm,tn,dt,by,ng,na,\n" +
          "12661,0,1722333530042,true,Interact Viz Test,200,Site: a; View: v;,T,,99,1,5,x\n"),
      threadDetailsPath = write("threads", "#1\tThreads: 5/5\tSamples: 1\tLatency: 10\tResp.Time: 100\tErrors: 0\n"),
      rejectedPath = Files.createTempDirectory("rej").toString + "/rejected")
    val sink = new CaptureEmailSink
    val html = Pipeline.runDaily(spark, cfg, LocalDate.of(2024, 7, 30), sink)
    assert(sink.sent.size == 1)
    assert(html.contains("12661"))
    assert(html.contains("Site: a; View: v;"))
    // the inline chart goes out as PNG, like the reference's matplotlib part
    assert(sink.sent.head.imageMime == "image/png")
    assert(sink.sent.head.render.contains("Content-Type: image/png"))
  }
}
