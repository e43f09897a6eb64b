package graft.tabjolt

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.InetSocketAddress
import java.util.Base64

/** SMTP email sink (reference: SMTP_SSL + MIME multipart with an inline
  * image, tabjolt_email.py:124-135, 327-343).
  *
  * Behind a trait so the pipeline and tests capture instead of send
  * (SURVEY.md §2.1 S9). The MIME assembly is dependency-free; the socket
  * client speaks just enough RFC 5321 for a login+send. Tests exercise
  * [[MimeMessage]], [[CaptureEmailSink]], and the socket dialogue against
  * an in-process fake server (SmtpSpec) — the container has zero egress.
  */
trait EmailSink {
  def send(message: MimeMessage): Unit
}

final case class MimeMessage(from: String, to: Seq[String], subject: String,
                             htmlBody: String, inlineImage: Array[Byte],
                             imageCid: String, imageMime: String = "image/svg+xml") {
  private val boundary = "----graft-boundary-7d33a816d302b6"

  /** RFC 2045 multipart/related: HTML part + inline image with
    * Content-ID, the structure the reference builds
    * (tabjolt_email.py:327-333). Every line is CRLF-terminated — the body
    * (which may carry bare \n from table cells with embedded newlines) is
    * normalized, so RFC 5321 DATA rules and dot-stuffing hold on every
    * line. */
  def render: String = {
    val b64 = Base64.getMimeEncoder(76, "\r\n".getBytes)
      .encodeToString(inlineImage)
    val headerAndBody = Seq(
      s"From: $from",
      s"To: ${to.mkString(", ")}",
      s"Subject: $subject",
      "MIME-Version: 1.0",
      s"""Content-Type: multipart/related; boundary="$boundary"""",
      "",
      s"--$boundary",
      "Content-Type: text/html; charset=utf-8",
      "",
      htmlBody,
      s"--$boundary",
      s"Content-Type: $imageMime",
      "Content-Transfer-Encoding: base64",
      s"Content-ID: <$imageCid>",
      "Content-Disposition: inline",
      "",
      b64,
      s"--$boundary--",
      "")
    // normalize ALL line endings (incl. \n and lone \r inside
    // htmlBody — multiLine-ingested cells can carry either) to CRLF
    headerAndBody.mkString("\n").replace("\r\n", "\n").replace('\r', '\n')
      .split("\n", -1).mkString("\r\n")
  }

  /** The DATA payload with RFC 5321 dot-stuffing applied per line. */
  def renderForData: String =
    render.split("\r\n", -1)
      .map(l => if (l.startsWith(".")) "." + l else l)
      .mkString("\r\n")
}

/** Test/capture sink — records messages instead of sending. */
final class CaptureEmailSink extends EmailSink {
  val sent = scala.collection.mutable.ArrayBuffer.empty[MimeMessage]
  override def send(message: MimeMessage): Unit = sent += message
}

/** Plain-socket SMTP client. SSL connections enable HTTPS-style endpoint
  * identification (hostname verification) — a raw SSLSocket validates the
  * chain but not the peer identity by default. Connect and read timeouts
  * bound a stalled server. */
final class SmtpEmailSink(host: String, port: Int,
                          user: Option[String], password: Option[String],
                          useSsl: Boolean = true,
                          timeoutMs: Int = 30000) extends EmailSink {
  override def send(message: MimeMessage): Unit = {
    // connect with a timeout FIRST (the SSL factory's (host, port)
    // overload connects without one), then layer TLS on top
    val plain = new java.net.Socket()
    plain.connect(new InetSocketAddress(host, port), timeoutMs)
    val socket =
      if (useSsl) {
        val s = javax.net.ssl.SSLSocketFactory.getDefault
          .asInstanceOf[javax.net.ssl.SSLSocketFactory]
          .createSocket(plain, host, port, true)
          .asInstanceOf[javax.net.ssl.SSLSocket]
        val params = s.getSSLParameters
        params.setEndpointIdentificationAlgorithm("HTTPS")
        s.setSSLParameters(params)
        s
      } else plain
    socket.setSoTimeout(timeoutMs)
    try {
      val in = new BufferedReader(new InputStreamReader(socket.getInputStream))
      val out = new PrintWriter(socket.getOutputStream, true)
      def expect(code: String): Unit = {
        var line = in.readLine()
        while (line != null && line.length >= 4 && line.charAt(3) == '-') line = in.readLine()
        require(line != null && line.startsWith(code), s"SMTP: expected $code, got $line")
      }
      def cmd(c: String, code: String): Unit = { out.print(c + "\r\n"); out.flush(); expect(code) }
      expect("220")
      cmd(s"EHLO graft", "250")
      (user, password) match {
        case (Some(u), Some(p)) =>
          cmd("AUTH LOGIN", "334")
          cmd(Base64.getEncoder.encodeToString(u.getBytes), "334")
          cmd(Base64.getEncoder.encodeToString(p.getBytes), "235")
        case _ =>
      }
      cmd(s"MAIL FROM:<${message.from}>", "250")
      message.to.foreach(r => cmd(s"RCPT TO:<$r>", "250"))
      cmd("DATA", "354")
      out.print(message.renderForData)
      cmd("\r\n.", "250")
      cmd("QUIT", "221")
    } finally socket.close()
  }
}
