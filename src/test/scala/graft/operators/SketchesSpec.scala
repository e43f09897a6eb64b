package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("CMS never underestimates; overshoot bounded by e/w x total") {
    val out = Sketches.cmsTopK(spark, sf).collect()
    assert(out.length == 20)
    val total = Sketches.tokenStream(spark, graft.Tables.documents(spark, sf)).count()
    // the classical CMS guarantee: est <= exact + (e/w) * total with
    // probability 1 - e^-d; with fixed hashes on a fixed corpus the
    // realized error is deterministic, so the bound is assertable flat
    val bound = math.ceil(math.E / 1024.0 * total).toLong
    out.foreach { r =>
      val exact = r.getAs[Long]("exact_cnt")
      val est = r.getAs[Long]("cms_est")
      assert(est >= exact, s"CMS underestimated ${r.getAs[String]("token")}: $est < $exact")
      assert(est - exact <= bound, s"${r.getAs[String]("token")}: overshoot ${est - exact} > $bound")
    }
  }

  test("CMS counters merge by sum across disjoint corpus slices") {
    val docs = graft.Tables.documents(spark, sf)
    def counters(df: org.apache.spark.sql.DataFrame) =
      Sketches.cmsCounters(Sketches.tokenStream(spark, df))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val full = counters(docs)
    val merged = Sketches.cmsCounters(Sketches.tokenStream(spark, docs.filter(col("doc_id") % 2 === 0)))
      .union(Sketches.cmsCounters(Sketches.tokenStream(spark, docs.filter(col("doc_id") % 2 === 1))))
      .groupBy(col("rw"), col("bucket")).agg(sum(col("c")).as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(merged == full && full.nonEmpty)
  }

  test("gate-query estimates equal min over the raw-stream counters (linearity)") {
    // the gate query derives counters from the vocab aggregate; this
    // pins that the derivation equals the production sketch built from
    // the raw occurrence stream, with the md5 bucket recomputed
    // independently on the JVM side
    def bucket(i: Int, tok: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$i:$tok".getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16) % 1024
    }
    val docs = graft.Tables.documents(spark, sf)
    val counters = Sketches.cmsCounters(Sketches.tokenStream(spark, docs))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val out = Sketches.cmsTopK(spark, sf).collect()
    out.foreach { r =>
      val tok = r.getAs[String]("token")
      val expected = (0 until 4).map(i => counters((i, bucket(i, tok)))).min
      assert(r.getAs[Long]("cms_est") == expected, tok)
    }
  }

  test("HLL estimate lands in the m=256 standard-error envelope at two SFs") {
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { d =>
      val r = Sketches.hllDistinctShingles(spark, d).collect()(0)
      val est = r.getAs[Double]("hll_estimate")
      val exact = r.getAs[Long]("exact_distinct")
      // 1.04/sqrt(256) = 6.5% standard error; 15% is a comfortable
      // deterministic envelope for these corpora (measured -5.9%/-7.3%)
      assert(math.abs(est - exact) / exact < 0.15, s"$d: est $est vs exact $exact")
      assert(r.getAs[Int]("m") == 256)
    }
  }

  test("length histogram merges by sum; quantile estimate brackets the truth") {
    val docs = graft.Tables.documents(spark, sf)
    // mergeability: (lang, bin) counts from disjoint halves sum to the
    // full-corpus histogram — sketches combine without rescanning
    def hist(df: org.apache.spark.sql.DataFrame) =
      Sketches.lengthHistogram(df)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val full = hist(docs)
    val merged = Sketches.lengthHistogram(docs.filter(col("doc_id") % 2 === 0))
      .union(Sketches.lengthHistogram(docs.filter(col("doc_id") % 2 === 1)))
      .groupBy(col("lang"), col("bin")).agg(sum(col("cnt")).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(merged == full && full.nonEmpty)
    // accuracy: the bin containing the rank-target holds the exact
    // quantile, so est_hi bounds it from above within one bin width
    val out = Sketches.lengthQuantiles(spark, sf).collect()
    assert(out.length >= 3)
    out.foreach { r =>
      val (estHi, exact) = (r.getAs[Long]("est_hi"), r.getAs[Long]("exact"))
      assert(exact <= estHi && exact > estHi - 64,
        s"${r.getString(0)} p${r.getInt(1)}: exact $exact outside (${estHi - 64}, $estHi]")
    }
  }

  test("histogram-guided exact selection equals the full-sort quantiles") {
    // the 100 TB form: ranks only candidate-bin rows, never a per-key
    // total sort — must be row-identical to the sort-based gate query
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { d =>
      val sorted = Sketches.lengthQuantiles(spark, d).collect().map(_.toSeq).toSeq
      val guided = Sketches.lengthQuantilesGuided(spark, d).collect().map(_.toSeq).toSeq
      assert(guided == sorted && sorted.nonEmpty, d)
    }
  }

  test("drained streaming CMS counters equal the batch sketch") {
    val streamed = SourcesStreaming.st05.fn(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    val batch = Sketches.cmsCounters(
      Sketches.tokenStream(spark, graft.Tables.documents(spark, sf)))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == batch && batch.nonEmpty)
  }

  test("Bloom-prefiltered decontamination is row-identical to exact t15") {
    // structural claim: no false negatives (every true benchmark shingle
    // passes its own filter), false positives die in the exact verify —
    // so sk03 must equal t15 row for row at any scale
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { d =>
      val exact = TextDedup.t15.fn(spark, d).collect().map(_.toSeq).toSeq
      val bloom = Sketches.bloomDecontaminate(spark, d).collect().map(_.toSeq).toSeq
      assert(bloom == exact, d)
      assert(exact.nonEmpty || d.endsWith("sf0.001"), s"no contamination rows at $d")
    }
  }

  test("grouped HLL: per-source registers merge by max; estimates land in envelope") {
    import graft.Tables
    val docs = Tables.documents(spark, sf)
    def srcShingles(df: org.apache.spark.sql.DataFrame) = {
      graft.functions.TextExpressions.register(spark)
      df.select(col("source"),
        explode(call_function("graft_shingles", col("text"))).as("shingle"))
    }
    def regs(df: org.apache.spark.sql.DataFrame) =
      Sketches.hllRegistersBy(srcShingles(df), "source",
          TextDedup.shingleHash60(col("shingle")))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val full = regs(docs)
    val merged = Sketches.hllRegistersBy(
        srcShingles(docs.filter(col("doc_id") % 2 === 0)), "source",
        TextDedup.shingleHash60(col("shingle")))
      .union(Sketches.hllRegistersBy(
        srcShingles(docs.filter(col("doc_id") % 2 === 1)), "source",
        TextDedup.shingleHash60(col("shingle"))))
      .groupBy(col("source"), col("bucket")).agg(max(col("m_j")).as("m_j"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(merged == full && full.nonEmpty)
    // every per-source estimate lands within a loose multiple of the
    // m=256 standard error (1.04/sqrt(m) ~ 6.5%) of its exact count
    Sketches.hllDistinctBySource(spark, sf).collect().foreach { r =>
      val est = r.getAs[Double]("hll_estimate")
      val exact = r.getAs[Long]("exact_distinct").toDouble
      assert(math.abs(est - exact) / exact < 0.26,
        s"${r.getString(0)}: est $est vs exact $exact")
    }
  }

  test("HLL registers merge by max across disjoint corpus slices") {
    val idx = TextDedup.shingleIndex(spark, sf)
    def regs(df: org.apache.spark.sql.DataFrame) =
      Sketches.hllRegisters(df)
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val full = regs(idx)
    val merged = Sketches.hllRegisters(idx.filter(col("doc_id") % 2 === 0))
      .union(Sketches.hllRegisters(idx.filter(col("doc_id") % 2 === 1)))
      .groupBy(col("bucket")).agg(max(col("m_j")).as("m_j"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(merged == full && full.nonEmpty)
  }
}
