package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusSpec extends SparkSpec {

  test("connected components labels each vertex with its component minimum") {
    import spark.implicits._
    // two chains and a triangle: {1,2,3,4}, {10,11}, {20,21,22}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("doc1", "doc2")
    val und = pairs.select($"doc1".as("src"), $"doc2".as("dst"))
      .unionByName(pairs.select($"doc2".as("src"), $"doc1".as("dst")))
    val got = Corpus.connectedComponents(und)
      .orderBy("v").as[(Long, Long)].collect().toSeq
    assert(got == Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("connected components on an empty edge set returns empty (no NPE)") {
    import spark.implicits._
    // a corpus with no near-dup pairs: the label-sum convergence probe
    // sees SUM() = NULL on both sides and must converge on round one
    val und = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(Corpus.connectedComponents(und).count() == 0)
  }

  test("connected components converges on a long path (diameter > 2 rounds)") {
    import spark.implicits._
    val pairs = (1L until 12L).map(i => (i, i + 1)).toDF("doc1", "doc2")
    val und = pairs.select($"doc1".as("src"), $"doc2".as("dst"))
      .unionByName(pairs.select($"doc2".as("src"), $"doc1".as("dst")))
    val labels = Corpus.connectedComponents(und).as[(Long, Long)].collect()
    assert(labels.length == 12 && labels.forall(_._2 == 1L))
  }

  test("t35 incremental labels equal the t11 from-scratch clustering") {
    // the splice identity, engine vs engine (the gate proves it vs
    // DuckDB): recompute-affected + splice-unaffected must reproduce
    // the batch CC row for row, INCLUDING the cross-segment merges
    val d = "/root/testdata/sf0.001"
    def labels(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = labels(Corpus.t11.fn(spark, d))
    val inc = labels(Corpus.t35.fn(spark, d))
    graft.Lifecycle.release(spark)
    assert(inc == full)
    // the merge arm genuinely fired: at least one recomputed cluster
    // spans the batch (doc_id % 10 == 7) and the resident segment —
    // without it the test would pass on a splice that never merges
    val byCluster = inc.groupBy(_._2).values
    assert(byCluster.exists(m =>
      m.exists(_._1 % 10 == 7) && m.exists(_._1 % 10 != 7)),
      "no cluster spans batch and resident docs — the merge arm never ran")
  }

  test("t23 keeps exactly the best-quality member of every cluster") {
    val d = "/root/testdata/sf0.001"
    val rows = Corpus.t23.fn(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    // total: one row per corpus document
    assert(rows.length == graft.Tables.documents(spark, d).count())
    // exactly one keep per cluster, and it is the quality-argmax
    // (ties by lowest doc_id)
    rows.groupBy(_._2).foreach { case (cluster, members) =>
      val kept = members.filter(_._4)
      assert(kept.length == 1, s"cluster $cluster keeps ${kept.length}")
      val best = members.minBy { case (id, _, q, _) => (-q, id) }
      assert(kept.head._1 == best._1, s"cluster $cluster kept ${kept.head._1}, best ${best._1}")
    }
    // cluster ids agree with t11 for clustered docs; all other docs are
    // singletons labeled with themselves (and therefore kept)
    val t11Labels = Corpus.t11.fn(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (id, cluster, _, keep) =>
      assert(cluster == t11Labels.getOrElse(id, id))
      if (!t11Labels.contains(id)) assert(keep)
    }
    // the mask actually drops something: the corpus has near-dup clusters
    assert(rows.count(!_._4) > 0)
  }

  test("scrub replaces emails, phones, and IPs with typed placeholders") {
    import spark.implicits._
    val got = Seq(
      "write alice.b+tag@corp-mail.io today",
      "server at 10.0.42.7 port 80",
      "call +1 555-123-4567 or 555 987 6543",
      "clean text stays clean").toDF("text")
      .select(Corpus.scrub($"text")).as[String].collect().toSeq
    assert(got == Seq(
      "write <EMAIL> today",
      "server at <IP> port 80",
      "call +1 <PHONE> or <PHONE>",
      "clean text stays clean"))
  }

  test("split and scrub plans shuffle only for the output sort; quality cut once") {
    val d = "/root/testdata/sf0.001"
    def hashExchanges(df: org.apache.spark.sql.DataFrame): Int =
      "hashpartitioning".r.findAllIn(
        df.queryExecution.executedPlan.toString).length
    // t12/t14 are pure per-row compute: the ONLY exchange is the final
    // rangepartitioning sort — a hashpartitioning would mean an
    // accidental aggregate/join shuffle
    assert(hashExchanges(Corpus.t12.fn(spark, d)) == 0)
    assert(hashExchanges(Corpus.t14.fn(spark, d)) == 0)
    // t13 shuffles exactly once: the per-language window
    assert(hashExchanges(Corpus.t13.fn(spark, d)) == 1)
  }

  test("split assignment is per-row stable: a subset gets identical labels") {
    val d = "/root/testdata/sf0.001"
    val all = Corpus.t12.fn(spark, d).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    // recompute on a filtered corpus — labels must not depend on the rest
    val half = graft.Tables.documents(spark, d).filter(col("doc_id") % 2 === 0)
    val sub = half.select(col("doc_id"), Corpus.splitCol.as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(sub.nonEmpty && sub.forall { case (id, s) => all(id) == s })
    // all three splits are populated at 500 docs
    assert(all.values.toSet == Set("train", "val", "test"))
  }

  test("split is stratified: every source lands near 90/5/5, not just the corpus") {
    val d = "/root/testdata/sf0.001"
    val bySource = Corpus.t12.fn(spark, d)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("split") === "train", 1L).otherwise(0L)).as("tr"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // 20 strata of 25 docs: binomial noise is wide at n=25, but a
    // NON-stratified hash could starve a stratum outright — pin that
    // every stratum exists and none falls below 60% train
    assert(bySource.length == 20)
    assert(bySource.forall { case (_, n, tr) => n == 25 && tr >= 15 })
    // corpus-level proportions hold the 90/5/5 design within ±4pp
    val total = bySource.map(_._2).sum.toDouble
    val train = bySource.map(_._3).sum.toDouble
    assert(math.abs(train / total - 0.90) < 0.04)
  }

  test("t24 kept counts equal the integer-exact temperature targets and flatten the head") {
    val d = "/root/testdata/sf0.001"
    val langCnt = graft.Tables.documents(spark, d)
      .groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = langCnt.values.sum
    val weights = langCnt.view.mapValues(c => math.floor(math.sqrt(c.toDouble) * 1e6).toLong).toMap
    val wsum = weights.values.sum
    val target = weights.view.mapValues(w => w * (total / 2) / wsum).toMap
    val kept = Corpus.t24.fn(spark, d)
      .groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // exact per-stratum sample sizes (the integer contract in the Scaladoc)
    langCnt.keys.foreach { l =>
      assert(kept.getOrElse(l, 0L) == target(l), s"lang $l: ${kept.get(l)} vs ${target(l)}")
    }
    // alpha=0.5 flattens: the dominant stratum's share of the mix is
    // strictly below its share of the corpus; the smallest stratum's is above
    val head = langCnt.maxBy(_._2)._1
    val tail = langCnt.minBy(_._2)._1
    val mixTotal = kept.values.sum.toDouble
    assert(kept(head) / mixTotal < langCnt(head).toDouble / total)
    assert(kept(tail) / mixTotal > langCnt(tail).toDouble / total)
  }

  test("t27 labels every drift class and never touches row data") {
    val rows = Corpus.t27.fn(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getString(0) ->
        (Option(r.getString(1)), Option(r.getString(2)), r.getString(3))).toMap
    assert(rows.size == 6)
    assert(rows("quality") == ((None, Some("DOUBLE"), "added")))
    assert(rows("source") == ((Some("VARCHAR"), None, "removed")))
    assert(rows("n_chars") == ((Some("BIGINT"), Some("INTEGER"), "type_changed")))
    Seq("doc_id", "text", "lang").foreach(c => assert(rows(c)._3 == "unchanged"))
    // the v2 projection's schema is inspected, not executed: drift is
    // O(columns) metadata regardless of table size
    assert(rows("doc_id") == ((Some("BIGINT"), Some("BIGINT"), "unchanged")))
  }
}
