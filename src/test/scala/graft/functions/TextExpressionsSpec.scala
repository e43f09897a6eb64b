package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextExpressionsSpec extends SparkSpec {

  test("graft_shingles equals shingles3(tokens(text)) on the full corpus") {
    TextExpressions.register(spark)
    import TextFunctions._
    // materialize toks across an exchange so the HOF reference itself is
    // evaluated the non-degenerate way (see shingleIndex)
    val both = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"), tokens(col("text")).as("toks"))
      .repartition(8)
      .select(col("doc_id"),
        call_function("graft_shingles", col("text")).as("native"),
        shingles3(col("toks")).as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2), s"doc ${r.getLong(0)}")
    }
  }

  test("native tokens equals the HOF chain on the full corpus + edge cases") {
    import TextFunctions._
    val both = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), tokens(col("text")).as("native"),
        tokensHof(col("text")).as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2), s"doc ${r.getLong(0)}")
    }
    val edges = Seq(null, "", "   ", "  A\t\nb  ", "x").zipWithIndex
    import spark.implicits._
    val df = edges.map { case (t, i) => (i, t) }.toDF("i", "text")
      .select(col("i"), tokens(col("text")).as("native"), tokensHof(col("text")).as("hof"))
      .collect()
    df.foreach { r =>
      assert((r.isNullAt(1) && r.isNullAt(2)) ||
        r.getSeq[String](1) == r.getSeq[String](2), s"case ${r.getInt(0)}")
    }
    // null propagates as null (not empty) exactly like the HOF form
    assert(df.find(_.getInt(0) == 0).exists(r => r.isNullAt(1) && r.isNullAt(2)))
  }

  test("textStats equals qualityScore/langId/size over tokens, corpus + edges") {
    import TextFunctions._
    def check(df: org.apache.spark.sql.DataFrame): Unit = {
      val st = textStats(col("text"))
      val rows = df
        .select(col("text"), tokensHof(col("text")).as("toks"))
        .repartition(8) // materialize toks for the HOF reference forms
        .select(
          st.getField("n_tokens").as("nt_n"), size(col("toks")).as("nt_h"),
          st.getField("quality").as("q_n"), qualityScore(col("toks")).as("q_h"),
          st.getField("pred_lang").as("l_n"), langId(col("text"), col("toks")).as("l_h"))
        .collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert((r.isNullAt(0) && r.isNullAt(1)) || r.getInt(0) == r.getInt(1), s"n: $r")
        assert((r.isNullAt(2) && r.isNullAt(3)) || r.getDouble(2) == r.getDouble(3), s"q: $r")
        assert(r.getString(4) == r.getString(5), s"lang: $r")
      }
    }
    check(graft.Tables.documents(spark, "/root/testdata/sf0.001"))
    import spark.implicits._
    check(Seq(null, "", "   ", "the the the", "der und ist", "x 中 y",
      "le la les", "el y es", "one").toDF("text"))
  }

  test("graft_shingles_n carries the exact distinct count per element") {
    TextExpressions.register(spark)
    val rows = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"),
        call_function("graft_shingles", col("text")).as("plain"),
        call_function("graft_shingles_n", col("text")).as("withN"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val plain = r.getSeq[String](1)
      val withN = r.getSeq[org.apache.spark.sql.Row](2)
      assert(withN.map(_.getString(0)) == plain, s"doc ${r.getLong(0)}")
      assert(withN.forall(_.getInt(1) == plain.size), s"doc ${r.getLong(0)}")
    }
  }

  test("minhash band kernel equals the xxhash64 aggregate formulation") {
    TextExpressions.register(spark)
    val d = "/root/testdata/sf0.001"
    // aggregate formulation: 64 min-aggregates over per-permutation
    // rehashes, banded pairwise — the shape t07 used before the kernel
    val sig = graft.operators.TextDedup.minHashSignature(spark, d)
    val bandCols = (0 until 32).map { b =>
      xxhash64((b * 2 until (b + 1) * 2).map(j => col(s"mh$j")): _*)
    }
    val agg = sig.select(col("doc_id"), array(bandCols: _*).as("bands")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val kernel = graft.Tables.documents(spark, d)
      .select(col("doc_id"), call_function("graft_minhash_bands", col("text")).as("bands"))
      .filter(col("bands").isNotNull)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(kernel.keySet == agg.keySet && kernel.nonEmpty)
    kernel.foreach { case (id, bands) => assert(bands == agg(id), s"doc $id") }
  }

  test("simhash kernel equals the vote-aggregate formulation") {
    TextExpressions.register(spark)
    val d = "/root/testdata/sf0.001"
    val sh = graft.operators.TextDedup.shingleIndex(spark, d)
      .withColumn("h", graft.operators.TextDedup.shingleHash60(col("shingle")))
    val bitVotes = (0 until 60).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1)).as(s"v$i")
    }
    val agg = sh.groupBy(col("doc_id"))
      .agg(bitVotes.head, bitVotes.tail: _*)
      .select(col("doc_id"),
        (0 until 60).map(i =>
          when(col(s"v$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L)))
          .reduce(_.bitwiseOR(_)).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val kernel = graft.Tables.documents(spark, d)
      .select(col("doc_id"), call_function("graft_simhash60", col("text")).as("sig"))
      .filter(col("sig").isNotNull)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kernel.keySet == agg.keySet && kernel.nonEmpty)
    kernel.foreach { case (id, s) => assert(s == agg(id), s"doc $id") }
  }

  test("graft_term_counts equals explode + groupBy(doc, term), corpus + edges") {
    TextExpressions.register(spark)
    import TextFunctions._
    val d = "/root/testdata/sf0.001"
    val kernel = graft.Tables.documents(spark, d)
      .select(col("doc_id"),
        explode(call_function("graft_term_counts", col("text"))).as("tc"))
      .select(col("doc_id"), col("tc.term").as("term"), col("tc.tf").as("tf"))
    val ref = graft.Tables.documents(spark, d)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .repartition(8) // materialize toks (see graft_shingles parity test)
      .select(col("doc_id"), explode(col("toks")).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    assert(kernel.count() > 0)
    assert(kernel.exceptAll(ref).count() == 0 && ref.exceptAll(kernel).count() == 0)
    // edge cases: null/empty/whitespace text -> empty array (no rows
    // after an explode, like the token chain it replaces); repeats count
    val rows = spark.sql("""
      SELECT graft_term_counts(CAST(NULL AS STRING)) AS a,
             graft_term_counts('') AS b,
             graft_term_counts('  A  b\ta  ') AS c
    """).collect()(0)
    assert(rows.getSeq[Any](0).isEmpty && rows.getSeq[Any](1).isEmpty)
    val c = rows.getSeq[org.apache.spark.sql.Row](2)
    assert(c.map(r => (r.getString(0), r.getLong(1))) == Seq(("a", 2L), ("b", 1L)))
  }

  test("graft_shingles edge cases: null, empty, short, messy whitespace, dups") {
    TextExpressions.register(spark)
    val rows = spark.sql("""
      SELECT graft_shingles(CAST(NULL AS STRING)) AS a,
             graft_shingles('') AS b,
             graft_shingles('one two') AS c,
             graft_shingles('  A  b\tC   ') AS d,
             graft_shingles('x y x y x y x') AS e
    """).collect()(0)
    assert(rows.getSeq[String](0) == Seq.empty)
    assert(rows.getSeq[String](1) == Seq.empty)
    assert(rows.getSeq[String](2) == Seq.empty)
    assert(rows.getSeq[String](3) == Seq("a b c"))
    // duplicates collapse to first occurrence order
    assert(rows.getSeq[String](4) == Seq("x y x", "y x y"))
  }

  test("graft_pos_shingles: positional order, dups kept, distinct = graft_shingles") {
    TextExpressions.register(spark)
    val rows = spark.sql("""
      SELECT graft_pos_shingles(CAST(NULL AS STRING)) AS a,
             graft_pos_shingles('one two') AS b,
             graft_pos_shingles('  A  b\tC d ') AS c,
             graft_pos_shingles('x y x y x') AS d
    """).collect()(0)
    assert(rows.getSeq[String](0) == Seq.empty)
    assert(rows.getSeq[String](1) == Seq.empty)
    // element i = shingle starting at token i
    assert(rows.getSeq[String](2) == Seq("a b c", "b c d"))
    // duplicates preserved at their positions (the point of the kernel)
    assert(rows.getSeq[String](3) == Seq("x y x", "y x y", "x y x"))
    // corpus contract: array_distinct(pos) == graft_shingles, and pos i
    // reproduces the token triple at i (the property t32's island
    // arithmetic rests on)
    val corpus = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .selectExpr("doc_id",
        "array_distinct(graft_pos_shingles(text)) AS pd",
        "graft_shingles(text) AS sd")
      .collect()
    assert(corpus.nonEmpty)
    corpus.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2), s"doc ${r.getLong(0)}")
    }
  }
}
