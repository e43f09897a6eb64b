package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The r21 static-loop executor must be a pure PHYSICAL optimization:
  * both placements of an iterative loop (static child session under the
  * byte gate vs the caller's AQE session above it) must produce
  * identical results. These tests force each path via the gate conf and
  * compare row for row. */
class LoopExecSpec extends SparkSpec {

  private def withStaticGate[T](bytes: String)(body: => T): T = {
    val key = "spark.graft.loop.staticMaxBytes"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, bytes)
    try body finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("CC labels are identical on the static and AQE loop paths") {
    import spark.implicits._
    // a 40-deep chain (shortcut rounds > 1) plus a triangle and a
    // disjoint pair — exercises propagate, shortcut and convergence
    val pairs = ((1L until 40L).map(i => (i, i + 1)) ++
      Seq((100L, 101L), (101L, 102L), (100L, 102L), (200L, 201L)))
      .toDF("doc1", "doc2")
    def und = pairs.select($"doc1".as("src"), $"doc2".as("dst"))
      .unionByName(pairs.select($"doc2".as("src"), $"doc1".as("dst")))
    def run(): Map[Long, Long] =
      Corpus.connectedComponents(und).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val static = run()
    assert(Corpus.lastStatic, "tiny edge set must take the static path")
    val aqe = withStaticGate("0")(run())
    assert(!Corpus.lastStatic, "gate 0 must keep the loop on the caller")
    assert(static == aqe)
    // and both are the component minima
    assert(static(40L) == 1L && static(102L) == 100L && static(201L) == 200L)
    graft.Lifecycle.release(spark)
  }

  test("BPE merge table and final segmentation are identical on both paths") {
    val d = "/root/testdata/sf0.001"
    def run(): (Seq[(Int, String, Long)], Seq[(String, String)]) = {
      val (merges, seqs) = Advanced.bpeTrain(spark, d)
      val segs = seqs.orderBy(col("w")).collect()
        .map(r => (r.getString(0), r.getString(2))).toSeq
      (merges, segs)
    }
    val (mStatic, sStatic) = run()
    val (mAqe, sAqe) = withStaticGate("0")(run())
    assert(mStatic == mAqe)
    assert(sStatic == sAqe)
    assert(mStatic.nonEmpty)
    graft.Lifecycle.release(spark)
  }

  test("loop partition count derives from state bytes, capped at the parent") {
    // parent test session runs 4 shuffle partitions
    assert(LoopExec.partitionsFor(spark, 0L) == 1)
    assert(LoopExec.partitionsFor(spark, 8L << 20) == 1)
    assert(LoopExec.partitionsFor(spark, (8L << 20) + 1) == 2)
    assert(LoopExec.partitionsFor(spark, 25L << 20) == 4)
    assert(LoopExec.partitionsFor(spark, 10L << 30) == 4) // parent cap
    val s2 = LoopExec.session(spark, 2)
    assert(s2.conf.get("spark.sql.adaptive.enabled") == "false")
    assert(s2.conf.get("spark.sql.shuffle.partitions") == "2")
    // memoized per (parent, partitions)
    assert(LoopExec.session(spark, 2) eq s2)
    assert(!(LoopExec.session(spark, 1) eq s2))
  }
}
