package graft.operators

import graft.SparkSpec

class AdvancedSpec extends SparkSpec {

  test("batch sessionization equals streaming flatMapGroupsWithState sessionize") {
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val batch = Advanced.e01.fn(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(2), r.getTimestamp(3), r.getLong(4)))
      .toSet
    val events = graft.Tables.events(spark, sf)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value")
      .as[graft.streaming.EventsStream.Event]
    val streaming = graft.streaming.EventsStream.sessionize(events, gapMinutes = 30)
      .collect()
      .map(s => (s.user_id, s.start, s.end, s.n_events))
      .toSet
    assert(batch == streaming)
  }

  test("e08 gap-fill scaffolds a complete hourly calendar and forward-fills gauges") {
    val sf = "/root/testdata/sf0.001"
    val rows = Advanced.e08.fn(spark, sf).collect().map(r =>
      (r.getString(0), r.getTimestamp(1), r.getLong(2), r.getBoolean(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (tpe, tr) =>
      val sorted = tr.sortBy(_._2.getTime)
      // calendar completeness: consecutive rows are exactly one hour apart
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._2.getTime - a._2.getTime == 3600000L, s"$tpe gap in scaffold")
        case _ =>
      }
      // gaps are empty, and the series has real gaps to fill at this SF
      assert(sorted.filter(_._4).forall(_._3 == 0L))
      assert(sorted.exists(_._4), s"$tpe has no gaps — grain too coarse")
      // spans start on data, so the forward-filled gauge is never null,
      // and it only changes on hours that actually observed events
      assert(!sorted.head._4 && sorted.forall(_._5.nonEmpty))
      sorted.sliding(2).foreach {
        case Array(a, b) => if (b._4) assert(b._5 == a._5, s"$tpe gap changed gauge")
        case _ =>
      }
    }
  }

  test("curation keeps a nontrivial subset") {
    val sf = "/root/testdata/sf0.001"
    val total = graft.Tables.documents(spark, sf).count()
    val kept = Advanced.c01.fn(spark, sf).count()
    assert(kept > 0 && kept < total, s"kept=$kept of $total")
  }

  test("embedding dedup keepers are always lower ids") {
    val sf = "/root/testdata/sf0.001"
    val rows = Advanced.t09.fn(spark, sf).collect()
    assert(rows.forall(r => r.getLong(1) < r.getLong(0)))
  }

  test("e03 week-0 retention equals cohort size; later offsets never exceed it") {
    val sf = "/root/testdata/sf0.001"
    val rows = Advanced.e03.fn(spark, sf).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    // every user is by definition active in their cohort week
    val week0 = rows.collect { case (c, 0L, n) => c -> n }.toMap
    assert(week0.nonEmpty)
    rows.foreach { case (c, off, n) =>
      assert(off >= 0)
      assert(n <= week0(c), s"cohort $c offset $off: $n > week0 ${week0(c)}")
    }
    // cohort sizes sum to the distinct user population
    val users = graft.Tables.events(spark, sf)
      .select(org.apache.spark.sql.functions.col("user_id")).distinct().count()
    assert(week0.values.sum == users)
  }

  test("v02 PMI ratios are positive, count-floored, and rank-ordered") {
    val sf = "/root/testdata/sf0.001"
    val rows = Advanced.v02.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty && rows.length <= 30)
    assert(rows.forall(_._3 >= 5))
    assert(rows.forall(_._4 > 0.0))
    assert(rows.map(-_._4).toSeq == rows.map(-_._4).toSeq.sorted)
  }

  test("c04's probe over the grown index equals t25 over the published one") {
    val sf = "/root/testdata/sf0.001"
    val c04Dedup = Advanced.c04.fn(spark, sf)
      .filter(org.apache.spark.sql.functions.col("stage") === "dedup")
      .collect().map(r => r.getLong(1) -> (r.getDouble(3) == 1.0)).toMap
    val t25Keep = TextDedup.t25.fn(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(c04Dedup == t25Keep)
    assert(c04Dedup.nonEmpty)
    // all three stages present: the composition exercised every member
    val stages = Advanced.c04.fn(spark, sf)
      .select("stage").distinct().collect().map(_.getString(0)).toSet
    assert(stages == Set("pairs", "dedup", "ivf"))
  }

  test("v05 BPE loop: monotone merge counts, no pair merged twice, lossless segmentation") {
    val out = Advanced.v05.fn(spark, "/root/testdata/sf0.001").collect()
    val merges = out.filter(_.getString(0) == "merge").sortBy(_.getInt(1))
    assert(merges.length == 6, s"expected 6 merge rounds, got ${merges.length}")
    // any pair existing at round k+1 has frequency bounded by round k's
    // argmax (a new pair (x, ab)'s occurrences are a subset of (x, a)'s)
    // — so the merge-count sequence must be non-increasing
    val cnts = merges.map(_.getLong(3))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b },
      s"pair frequencies must be non-increasing across rounds: ${cnts.mkString(",")}")
    // merging removes every occurrence of a pair and later merges only
    // concatenate — a repeated winning pair means the apply step missed
    // occurrences
    assert(merges.map(_.getString(2)).distinct.length == 6, "a pair was merged twice")
    val words = out.filter(_.getString(0) == "word")
    assert(words.length == 20)
    words.foreach { r =>
      val Array(w, enc) = r.getString(2).split(" -> ", 2)
      assert(enc.replace(" ", "") == w,
        s"segmentation of '$w' is not lossless: '$enc'")
    }
  }

  test("v06 corpus encode: per-doc counts bounded and consistent with the trained vocabulary") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val out = Advanced.v06.fn(spark, sf).collect()
    assert(out.nonEmpty)
    // every word encodes to >= 1 symbol, so tokens >= words per doc;
    // merges only shrink, so tokens <= the doc's total word characters
    out.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"doc ${r.getLong(0)}: fewer tokens than words")
      assert(math.abs(r.getDouble(3) -
        r.getLong(2).toDouble / r.getLong(1).toDouble) < 1e-12)
    }
    // conservation: corpus token total == freq-weighted symbol count of
    // the trainer's own final vocabulary segmentation (encoding must be
    // the same reduction, just grouped by doc instead of word)
    val (_, seqs) = Advanced.bpeTrain(spark, sf)
    val vocabTotal = seqs
      .select(sum(col("freq") * size(split(trim(col("seq")), "  "))))
      .head().getLong(0)
    assert(out.map(_.getLong(2)).sum == vocabTotal,
      "per-doc token totals diverge from the vocabulary's own accounting")
  }
}
