package graft.tabjolt

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

class ConfigSpec extends AnyFunSuite {

  test("config.json round-trips paths and email settings") {
    val f = Files.createTempFile("graft-config", ".json")
    Files.writeString(f,
      """{"paths": {"summary_line": "/d/s.csv", "wincounter": "s3a://b/w.tsv",
        |           "performance_samples": "/d/p.csv", "thread_details": "/d/t.tsv",
        |           "rejected": "/d/rejected"},
        | "email": {"from": "etl@corp", "to": ["a@corp", "b@corp"], "subject": "Daily"}}""".stripMargin)
    val cfg = PipelineConfig.fromJson(f.toString)
    assert(cfg.summaryLinePath == "/d/s.csv")
    assert(cfg.winCounterPath == "s3a://b/w.tsv")
    assert(cfg.emailTo == Seq("a@corp", "b@corp"))
    assert(cfg.emailSubject == "Daily")
  }

  test("email section is optional with sensible defaults") {
    val f = Files.createTempFile("graft-config", ".json")
    Files.writeString(f,
      """{"paths": {"summary_line": "a", "wincounter": "b",
        |           "performance_samples": "c", "thread_details": "d", "rejected": "e"}}""".stripMargin)
    val cfg = PipelineConfig.fromJson(f.toString)
    assert(cfg.emailFrom == "graft@localhost")
  }

  test("smtp section parses the reference's field names and drives from/to") {
    val f = Files.createTempFile("graft-config", ".json")
    Files.writeString(f,
      """{"paths": {"summary_line": "a", "wincounter": "b",
        |           "performance_samples": "c", "thread_details": "d", "rejected": "e"},
        | "smtp": {"sender_email": "etl@corp", "smtp_username": "user1",
        |          "smtp_password": "pw1", "smtp_server": "mail.corp",
        |          "smtp_port": 465, "recipient_emails": ["a@corp", "b@corp"]},
        | "fetch": [{"src": "/remote/w.tsv", "dest": "/local/w.tsv"}]}""".stripMargin)
    val cfg = PipelineConfig.fromJson(f.toString)
    val smtp = cfg.smtp.get
    assert(smtp.server == "mail.corp" && smtp.port == 465)
    assert(smtp.username.contains("user1") && smtp.password.contains("pw1"))
    assert(smtp.ssl, "ssl defaults to true (reference uses SMTP_SSL)")
    // no email section: from/to fall back to the smtp sender/recipients
    assert(cfg.emailFrom == "etl@corp")
    assert(cfg.emailTo == Seq("a@corp", "b@corp"))
    assert(cfg.fetch == Seq(("/remote/w.tsv", "/local/w.tsv")))
  }

  test("smtp credentials are optional; explicit email section wins over smtp") {
    val f = Files.createTempFile("graft-config", ".json")
    Files.writeString(f,
      """{"paths": {"summary_line": "a", "wincounter": "b",
        |           "performance_samples": "c", "thread_details": "d", "rejected": "e"},
        | "email": {"from": "explicit@corp"},
        | "smtp": {"sender_email": "etl@corp", "smtp_server": "mail.corp",
        |          "smtp_port": 25, "ssl": false}}""".stripMargin)
    val cfg = PipelineConfig.fromJson(f.toString)
    assert(cfg.smtp.get.username.isEmpty && cfg.smtp.get.password.isEmpty)
    assert(!cfg.smtp.get.ssl)
    assert(cfg.emailFrom == "explicit@corp")
  }

  test("missing path fields fail loudly") {
    val f = Files.createTempFile("graft-config", ".json")
    Files.writeString(f, """{"paths": {"summary_line": "a"}}""")
    val e = intercept[IllegalArgumentException](PipelineConfig.fromJson(f.toString))
    assert(e.getMessage.contains("wincounter"))
  }
}
