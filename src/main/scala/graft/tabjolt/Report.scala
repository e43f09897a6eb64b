package graft.tabjolt

import java.time.LocalDate
import org.apache.spark.sql.{DataFrame, Row}

/** Rendering boundary — the only place rows are collected to the driver
  * (mirrors the reference's fetchall-at-render, SURVEY.md §3.3). Every
  * upstream query returns bounded output (scalars, per-view aggregates,
  * one day of samples), so the collect is safe at any input scale.
  */
object Report {

  /** Q6's (date, value) series for the trend chart
    * (tabjolt_email.py:89-94). */
  final case class TrendPoint(date: LocalDate, value: Int)

  /** Rows whose date or value failed the try_cast (dirty summary rows —
    * tolerated by design, SURVEY.md §1.3) are skipped, not crashed on. */
  def trendPoints(series: DataFrame): Seq[TrendPoint] =
    series.collect().toSeq
      .filter(r => !r.isNullAt(0) && !r.isNullAt(1))
      .map(r => TrendPoint(r.getDate(0).toLocalDate, r.getInt(1)))

  /** Shared chart geometry for the SVG and PNG renderers: 1000×600
    * canvas, 1000-ms y grid (capped at ~20 lines), evenly spaced x.
    * Long arithmetic so an Int-overflowing value can't invert the axis. */
  private final case class ChartGeom(points: Seq[TrendPoint]) {
    val w = 1000; val h = 600; val mL = 80; val mB = 110; val mT = 40; val mR = 30
    val yMax: Long = (points.map(_.value).max.toLong / 1000L + 1L) * 1000L
    val step: Long = math.max(1000L, (yMax / 20L / 1000L) * 1000L)
    val xs: Seq[Double] = points.indices.map(i =>
      mL + (if (points.size == 1) 0.0 else i.toDouble * (w - mL - mR) / (points.size - 1)))
    def y(v: Long): Double = (h - mB) - v.toDouble / yMax * (h - mB - mT)
  }

  /** Dependency-free SVG line chart standing in for the matplotlib PNG
    * (tabjolt_email.py:92-112): circle markers, per-point value labels,
    * 45-degree date ticks, 1000-ms y grid. */
  def trendChartSvg(points: Seq[TrendPoint], title: String = "Average Time Taken (Milliseconds)"): String = {
    val g0 = ChartGeom(if (points.isEmpty) Seq(TrendPoint(LocalDate.EPOCH, 0)) else points)
    val w = g0.w; val h = g0.h; val mL = g0.mL; val mB = g0.mB; val mR = g0.mR
    if (points.isEmpty) return s"""<svg xmlns="http://www.w3.org/2000/svg" width="$w" height="$h"><text x="40" y="40">No results found</text></svg>"""
    val yMax = g0.yMax
    val step = g0.step
    val xs = g0.xs
    def y(v: Long): Double = g0.y(v)
    val grid = (0L to yMax by step).map { v =>
      f"""<line x1="$mL" y1="${y(v)}%.1f" x2="${w - mR}" y2="${y(v)}%.1f" stroke="#ddd"/><text x="${mL - 8}" y="${y(v) + 4}%.1f" text-anchor="end" font-size="11">$v</text>"""
    }.mkString("\n")
    val path = xs.zip(points).map { case (x, p) => f"$x%.1f,${y(p.value)}%.1f" }.mkString(" ")
    val marks = xs.zip(points).map { case (x, p) =>
      f"""<circle cx="$x%.1f" cy="${y(p.value)}%.1f" r="4" fill="#1f77b4"/>
         |<text x="$x%.1f" y="${y(p.value) - 8}%.1f" text-anchor="middle" font-size="11">${p.value}</text>
         |<text x="$x%.1f" y="${h - mB + 14}" font-size="11" transform="rotate(45 ${x}%.1f ${h - mB + 14})">${p.date}</text>""".stripMargin
    }.mkString("\n")
    s"""<svg xmlns="http://www.w3.org/2000/svg" width="$w" height="$h">
       |<text x="${w / 2}" y="20" text-anchor="middle" font-size="15">$title</text>
       |$grid
       |<polyline points="$path" fill="none" stroke="#1f77b4" stroke-width="2"/>
       |$marks
       |</svg>""".stripMargin
  }

  /** Matplotlib's default line blue (`C0`), which the reference chart
    * uses implicitly (tabjolt_email.py:95 plots with no color arg). */
  private val LineBlue = new java.awt.Color(0x1f, 0x77, 0xb4)

  /** In-JVM PNG rasterization of the same chart — exact parity with the
    * reference's matplotlib PNG sink (tabjolt_email.py:92-112): circle
    * markers, per-point value labels, 45-degree date ticks, 1000-ms y
    * grid, encoded with `javax.imageio` (zero external deps, headless
    * safe). Geometry is [[ChartGeom]], identical to the SVG. */
  def trendChartPng(points: Seq[TrendPoint], title: String = "Average Time Taken (Milliseconds)"): Array[Byte] = {
    import java.awt.{BasicStroke, Color, Font, RenderingHints}
    import java.awt.image.BufferedImage
    val geom = ChartGeom(if (points.isEmpty) Seq(TrendPoint(LocalDate.EPOCH, 0)) else points)
    import geom.{w, h, mL, mB, mR, yMax, step, xs, y}
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try {
      g.setRenderingHint(RenderingHints.KEY_ANTIALIASING, RenderingHints.VALUE_ANTIALIAS_ON)
      g.setRenderingHint(RenderingHints.KEY_TEXT_ANTIALIASING, RenderingHints.VALUE_TEXT_ANTIALIAS_ON)
      g.setColor(Color.WHITE); g.fillRect(0, 0, w, h)
      val small = new Font(Font.SANS_SERIF, Font.PLAIN, 11)
      g.setFont(small)
      val fm = g.getFontMetrics
      if (points.isEmpty) {
        g.setColor(Color.BLACK)
        g.drawString("No results found", 40, 40)
      } else {
        // y grid + right-aligned tick labels
        (0L to yMax by step).foreach { v =>
          val yy = y(v)
          g.setColor(new Color(0xdd, 0xdd, 0xdd))
          g.drawLine(mL, yy.round.toInt, w - mR, yy.round.toInt)
          g.setColor(Color.BLACK)
          val label = v.toString
          g.drawString(label, mL - 8 - fm.stringWidth(label), (yy + 4).round.toInt)
        }
        // trend line
        g.setColor(LineBlue)
        g.setStroke(new BasicStroke(2f))
        xs.zip(points).sliding(2).foreach {
          case Seq((x1, p1), (x2, p2)) =>
            g.drawLine(x1.round.toInt, y(p1.value).round.toInt,
              x2.round.toInt, y(p2.value).round.toInt)
          case _ =>
        }
        // markers + value labels + rotated date ticks
        xs.zip(points).foreach { case (x, p) =>
          val cx = x.round.toInt; val cy = y(p.value).round.toInt
          g.setColor(LineBlue)
          g.fillOval(cx - 4, cy - 4, 9, 9)
          g.setColor(Color.BLACK)
          val vLabel = p.value.toString
          g.drawString(vLabel, cx - fm.stringWidth(vLabel) / 2, cy - 8)
          val old = g.getTransform
          g.rotate(math.toRadians(45), x, (h - mB + 14).toDouble)
          g.drawString(p.date.toString, cx, h - mB + 14)
          g.setTransform(old)
        }
        // centered title
        g.setFont(new Font(Font.SANS_SERIF, Font.PLAIN, 15))
        val tw = g.getFontMetrics.stringWidth(title)
        g.drawString(title, (w - tw) / 2, 20)
      }
    } finally g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def table(headers: Seq[String], rows: Seq[Seq[(String, Boolean)]]): String = {
    val head = headers.map(h => s"<th>${esc(h)}</th>").mkString
    val body = rows.map { cells =>
      "<tr>" + cells.map { case (v, alert) =>
        val style = if (alert) """ style="color:red"""" else ""
        s"<td$style>${esc(v)}</td>"
      }.mkString + "</tr>"
    }.mkString("\n")
    s"""<table border="1" cellpadding="4" cellspacing="0"><tr>$head</tr>\n$body</table>"""
  }

  /** The four report tables in the reference's order and structure
    * (tabjolt_email.py:137-321): summary metrics, today's samples,
    * regressions (red when pct > 20, null-safe), improvements. Table
    * content and order reproduced; the reference's triple `</body></html>`
    * malformation is not (SURVEY.md §3.4). */
  def html(metrics: Seq[(String, String)],
           todaySamples: Seq[Row],
           regressions: Seq[Row],
           improvements: Seq[Row],
           chartCid: String = "graph_cid"): String = {
    def fmtPct(r: Row, i: Int): String =
      if (r.isNullAt(i)) "" else f"${r.getDouble(i)}%.2f%%"
    def pctTable(rows: Seq[Row], alertAbove: Option[Double]) =
      table(Seq("Average Elapsed Time (ms)", "Current Elapsed Time (ms)",
        "View", "Percentage Difference"),
        rows.map { r =>
          val alert = alertAbove.exists(t => !r.isNullAt(3) && r.getDouble(3) > t)
          Seq((if (r.isNullAt(0)) "" else f"${r.getDouble(0)}%.2f", alert),
            (if (r.isNullAt(1)) "" else r.getInt(1).toString, alert),
            (Option(r.getString(2)).getOrElse(""), alert),
            (fmtPct(r, 3), alert))
        })
    val metricsTable = table(Seq("Metric", "Value"),
      metrics.map { case (k, v) => Seq((k, false), (v, false)) })
    val samplesTable = table(
      Seq("Elapsed Time (ms)", "Latency (ms)", "Success", "Request Label", "View"),
      todaySamples.map(r => (0 until 5).map(i =>
        (Option(r.get(i)).map(_.toString).getOrElse(""), false))))
    s"""<html><body>
       |<h3>Tabjolt Daily Run Summary</h3>
       |$metricsTable
       |<img src="cid:$chartCid"/>
       |<h3>Today's Samples (slowest first)</h3>
       |$samplesTable
       |<h3>Views taking more time than average (red: &gt;20%)</h3>
       |${pctTable(regressions, Some(20.0))}
       |<h3>Views taking less time than average</h3>
       |${pctTable(improvements, None)}
       |</body></html>""".stripMargin
  }
}
