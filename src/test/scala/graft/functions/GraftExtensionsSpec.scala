package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.SparkSession

/** Pins the embedding story: a session CREATED with
  * `withExtensions(new GraftExtensions)` resolves the whole native
  * kernel family from pure SQL (no register() calls) and runs the
  * kernel-fusion optimizer rule. */
class GraftExtensionsSpec extends SparkSpec {

  /** A session with the extension applied, sharing the suite's
    * SparkContext. getOrCreate returns an EXISTING session if one is
    * active/default (silently dropping the extensions), so both slots
    * are cleared first and restored after. */
  private def withExtSession[A](f: SparkSession => A): A = {
    val base = spark // force the shared session (and its context) alive
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val ext = graft.Sessions.graftDefaults(SparkSession.builder())
        .master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      f(ext)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  test("extension-built session resolves every native function from pure SQL") {
    withExtSession { ext =>
      val r = ext.sql("""
        SELECT graft_shingles('a b c d') AS sh,
               graft_pos_shingles('x y x y x') AS psh,
               graft_tokens('  A b ') AS tk,
               graft_textstats('one two three').n_tokens AS nt,
               size(graft_term_counts('a b a')) AS tc,
               graft_simhash60('p q r s') AS sim,
               size(graft_minhash_bands('p q r s')) AS bands,
               graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dot
      """).collect()(0)
      assert(r.getSeq[String](0) == Seq("a b c", "b c d"))
      assert(r.getSeq[String](1) == Seq("x y x", "y x y", "x y x"))
      assert(r.getSeq[String](2) == Seq("a", "b"))
      assert(r.getInt(3) == 3)
      assert(r.getInt(4) == 2)
      assert(!r.isNullAt(5))
      assert(r.getInt(6) == 32)
      assert(r.getDouble(7) == 11.0)
    }
  }

  test("optimizer rule fuses array_distinct(graft_pos_shingles) into graft_shingles") {
    withExtSession { ext =>
      // non-literal input: a literal argument is constant-folded into the
      // plan before any structure is observable
      val df = graft.Tables.documents(ext, "/root/testdata/sf0.001")
        .selectExpr("array_distinct(graft_pos_shingles(text)) AS s")
      val optimized = df.queryExecution.optimizedPlan
      val exprs = optimized.expressions.flatMap(_.collect {
        case s: ShingleSet => s
        case d: org.apache.spark.sql.catalyst.expressions.ArrayDistinct => d
      })
      assert(exprs.exists(_.isInstanceOf[ShingleSet]), s"not fused: $optimized")
      assert(!exprs.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.ArrayDistinct]),
        s"array_distinct survived: $optimized")
      // the folded literal form agrees with the fused semantics too
      assert(ext.sql("SELECT array_distinct(graft_pos_shingles('x y x y x')) AS s")
        .collect()(0).getSeq[String](0) == Seq("x y x", "y x y"))
      // and on the corpus, fused == the direct kernel, row for row
      val corpus = graft.Tables.documents(ext, "/root/testdata/sf0.001")
        .selectExpr("doc_id",
          "array_distinct(graft_pos_shingles(text)) AS fused",
          "graft_shingles(text) AS direct")
        .collect()
      assert(corpus.nonEmpty)
      corpus.foreach { r =>
        assert(r.getSeq[String](1) == r.getSeq[String](2), s"doc ${r.getLong(0)}")
      }
    }
  }
}
