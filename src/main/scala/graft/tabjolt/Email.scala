package graft.tabjolt

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.util.Base64

/** SMTP email sink (reference: SMTP_SSL + MIME multipart with an inline
  * image, tabjolt_email.py:124-135, 327-343).
  *
  * Behind a trait so the pipeline and tests capture instead of send
  * (SURVEY.md §2.1 S9). The MIME assembly is dependency-free; the socket
  * client speaks just enough RFC 5321 for a login+send — the container
  * has no mail jars and zero egress, so tests exercise [[MimeMessage]]
  * and [[CaptureEmailSink]] only.
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
    * (tabjolt_email.py:327-333). */
  def render: String = {
    val b64 = Base64.getMimeEncoder(76, "\r\n".getBytes)
      .encodeToString(inlineImage)
    s"""From: $from\r
       |To: ${to.mkString(", ")}\r
       |Subject: $subject\r
       |MIME-Version: 1.0\r
       |Content-Type: multipart/related; boundary="$boundary"\r
       |\r
       |--$boundary\r
       |Content-Type: text/html; charset=utf-8\r
       |\r
       |$htmlBody\r
       |--$boundary\r
       |Content-Type: $imageMime\r
       |Content-Transfer-Encoding: base64\r
       |Content-ID: <$imageCid>\r
       |Content-Disposition: inline\r
       |\r
       |$b64\r
       |--$boundary--\r
       |""".stripMargin
  }
}

/** Test/capture sink — records messages instead of sending. */
final class CaptureEmailSink extends EmailSink {
  val sent = scala.collection.mutable.ArrayBuffer.empty[MimeMessage]
  override def send(message: MimeMessage): Unit = sent += message
}

/** Plain-socket SMTP client (STARTTLS-less; for an SSL endpoint wrap with
  * SSLSocketFactory). Untested in this container (zero egress) — kept
  * minimal and isolated behind the trait. */
final class SmtpEmailSink(host: String, port: Int,
                          user: Option[String], password: Option[String],
                          useSsl: Boolean = true) extends EmailSink {
  override def send(message: MimeMessage): Unit = {
    val socket =
      if (useSsl)
        javax.net.ssl.SSLSocketFactory.getDefault.createSocket(host, port)
      else new java.net.Socket(host, port)
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
      out.print(message.render.replace("\r\n.", "\r\n.."))
      cmd("\r\n.", "250")
      cmd("QUIT", "221")
    } finally socket.close()
  }
}
