package graft.tabjolt

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.ServerSocket
import org.scalatest.funsuite.AnyFunSuite

/** Exercises the socket SMTP client against an in-process fake server —
  * the zero-egress container can't reach a real one. */
class SmtpSpec extends AnyFunSuite {

  test("socket SMTP sink completes the dialogue and delivers the MIME body") {
    val server = new ServerSocket(0)
    val received = new java.lang.StringBuilder
    val thread = new Thread(() => {
      val sock = server.accept()
      val in = new BufferedReader(new InputStreamReader(sock.getInputStream))
      val out = new PrintWriter(sock.getOutputStream, true)
      def reply(s: String): Unit = { out.print(s + "\r\n"); out.flush() }
      reply("220 fake.local SMTP")
      var line = in.readLine()
      while (line != null) {
        val cmd = line.toUpperCase
        if (cmd.startsWith("EHLO")) reply("250 fake.local")
        else if (cmd.startsWith("MAIL FROM") || cmd.startsWith("RCPT TO")) reply("250 ok")
        else if (cmd.startsWith("DATA")) {
          reply("354 go ahead")
          var l = in.readLine()
          while (l != null && l != ".") {
            received.append(l).append("\n")
            l = in.readLine()
          }
          reply("250 accepted")
        } else if (cmd.startsWith("QUIT")) { reply("221 bye"); sock.close(); line = null }
        if (line != null) line = in.readLine()
      }
    })
    thread.setDaemon(true)
    thread.start()

    val msg = MimeMessage("etl@local", Seq("team@local"), "Daily",
      "<html>report</html>", "<svg/>".getBytes, "graph_cid")
    new SmtpEmailSink("127.0.0.1", server.getLocalPort, None, None, useSsl = false)
      .send(msg)
    thread.join(5000)
    val body = received.toString
    assert(body.contains("Subject: Daily"))
    assert(body.contains("Content-ID: <graph_cid>"))
    assert(body.contains("<html>report</html>"))
    server.close()
  }
}
