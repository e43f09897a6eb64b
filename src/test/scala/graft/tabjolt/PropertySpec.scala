package graft.tabjolt

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based checks (SURVEY.md §5.4): generated inputs, one Spark
  * job per property (generate N samples up front — a job per ScalaCheck
  * case would be pathologically slow). */
class PropertySpec extends SparkSpec {

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    Gen.listOfN(n, g).apply(Gen.Parameters.default, Seed(42L)).get

  test("the numeric regexp guard admits exactly the digit-only strings") {
    import spark.implicits._
    val gen = Gen.oneOf(
      Gen.numStr.suchThat(_.nonEmpty),
      Gen.alphaNumStr,
      Gen.asciiPrintableStr,
      Gen.const(""),
      Gen.const("123.45"),
      Gen.const("-123"),
      Gen.const(" 123"))
    val values = sample(gen, 400)
    val df = values.toDF("v")
    val admitted = df.filter(col("v").rlike("^[0-9]+$")).collect().map(_.getString(0)).toSet
    val expected = values.filter(v => v.nonEmpty && v.forall(c => c >= '0' && c <= '9')).toSet
    assert(admitted == expected)
  }

  test("pct-diff sign matches current-vs-avg ordering; zero avg yields null") {
    import spark.implicits._
    val gen = for {
      avg <- Gen.chooseNum(0, 1000)
      cur <- Gen.chooseNum(0, 2000)
    } yield (avg.toDouble, cur)
    val rows = sample(gen, 300)
    val df = rows.toDF("avg_elapsed_ms", "current_elapsed_ms")
      .withColumn("pct",
        when(col("avg_elapsed_ms") === 0, lit(null))
          .otherwise((col("current_elapsed_ms") - col("avg_elapsed_ms"))
            / col("avg_elapsed_ms") * 100.0))
    df.collect().foreach { r =>
      val avg = r.getDouble(0); val cur = r.getInt(1)
      if (avg == 0.0) assert(r.isNullAt(2))
      else {
        val pct = r.getDouble(2)
        assert(math.signum(pct) == math.signum(cur - avg),
          s"avg=$avg cur=$cur pct=$pct")
        assert(math.abs(pct - (cur - avg) / avg * 100.0) < 1e-9)
      }
    }
  }

  test("desc_nulls_first is total: nulls first, then strictly descending") {
    import spark.implicits._
    val gen = Gen.option(Gen.chooseNum(-100.0, 100.0))
    val values = sample(gen, 200)
    val got = values.toDF("pct")
      .orderBy(col("pct").desc_nulls_first)
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    val (nulls, rest) = got.span(_.isEmpty)
    assert(nulls.length == values.count(_.isEmpty))
    val ds = rest.map(_.get)
    assert(ds.zip(ds.drop(1)).forall { case (a, b) => a >= b })
  }

  test("session assignment is stable under permutation of input order") {
    import spark.implicits._
    val gen = for {
      user <- Gen.chooseNum(0L, 3L)
      minute <- Gen.chooseNum(0, 5000)
    } yield (user, minute)
    val rows = sample(gen, 150).distinct.zipWithIndex
      .map { case ((u, m), i) => (i.toLong, new java.sql.Timestamp(m * 60000L), u, "click", 1.0) }
    def sessionCount(perm: Seq[(Long, java.sql.Timestamp, Long, String, Double)]): Long = {
      val ds = perm.toDF("event_id", "ts", "user_id", "event_type", "value")
        .as[graft.streaming.EventsStream.Event]
      graft.streaming.EventsStream.sessionize(ds, gapMinutes = 30).count()
    }
    val base = sessionCount(rows)
    assert(base == sessionCount(scala.util.Random.shuffle(rows)))
  }
}
