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

  /** Dependency-free SVG line chart standing in for the matplotlib PNG
    * (tabjolt_email.py:92-112): circle markers, per-point value labels,
    * 45-degree date ticks, 1000-ms y grid. */
  def trendChartSvg(points: Seq[TrendPoint], title: String = "Average Time Taken (Milliseconds)"): String = {
    val w = 1000; val h = 600; val mL = 80; val mB = 110; val mT = 40; val mR = 30
    if (points.isEmpty) return s"""<svg xmlns="http://www.w3.org/2000/svg" width="$w" height="$h"><text x="40" y="40">No results found</text></svg>"""
    val maxV = points.map(_.value).max
    // Long arithmetic (an Int-overflowing value would invert the axis) and
    // a grid step that caps the line count at ~20 regardless of magnitude
    // — an absurd value must not render a million grid lines.
    val yMax = (maxV.toLong / 1000L + 1L) * 1000L
    val step = math.max(1000L, (yMax / 20L / 1000L) * 1000L)
    val xs = points.indices.map(i =>
      mL + (if (points.size == 1) 0.0 else i.toDouble * (w - mL - mR) / (points.size - 1)))
    def y(v: Long): Double = (h - mB) - v.toDouble / yMax * (h - mB - mT)
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
