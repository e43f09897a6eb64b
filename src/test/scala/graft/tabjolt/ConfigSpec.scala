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

  test("missing path fields fail loudly") {
    val f = Files.createTempFile("graft-config", ".json")
    Files.writeString(f, """{"paths": {"summary_line": "a"}}""")
    val e = intercept[IllegalArgumentException](PipelineConfig.fromJson(f.toString))
    assert(e.getMessage.contains("wincounter"))
  }
}
