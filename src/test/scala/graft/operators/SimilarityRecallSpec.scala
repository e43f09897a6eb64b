package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins ANN recall as an ASSERTED gate, not a ScaleSmoke print: the
  * sign-LSH banding (T tables × P planes) is a recall/cost dial, and a
  * future re-tune of T/P/seed or a bug in the bucketing join could
  * silently destroy recall while every hash-gate stays green (the gate
  * only checks the LSH result matches its own DuckDB re-execution, not
  * that the candidates cover the true neighbors). The tuned config the
  * scale experiments validated (T=16 × P=8, cos ≥ 0.9 — recall 1.0 in
  * ScaleSmoke's replicated-corpus runs, PLANS.md) must keep ≥ 0.95 of
  * the exact all-pairs result.
  *
  * The real corpus is near-random (zero pairs at cos ≥ 0.9 — measured),
  * so the fixture is ScaleSmoke's validated construction: the sf0.001
  * corpus unioned with a component-shifted replica of itself, putting
  * each (original, replica) pair near cos = 1 but NOT identical — the
  * shift flips some plane signs, so banding actually gets exercised
  * rather than trivially colliding identical vectors. */
class SimilarityRecallSpec extends SparkSpec {

  private lazy val fixtureDir: String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-recall-fixture").toString
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val replica = emb.select(
      (col("vec_id") + lit(1000000L)).as("vec_id"),
      transform(col("embedding"), (x, idx) =>
        when(idx === 0, (x + lit(0.05)).cast("float")).otherwise(x))
        .as("embedding"),
      col("label"))
    emb.unionAll(replica).coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("tuned sign-LSH (T16 x P8) recall >= 0.95 vs exact pairs at cos >= 0.9") {
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("id1"), col("id2")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.s01.fn(spark, fixtureDir).filter(col("cos") >= 0.9))
    val planes = Similarity.makePlanes(16, 8, seed = 23)
    val lsh = pairs(Similarity.lshPairsTuned(spark, fixtureDir, 0.9, planes, 16, 8))
    graft.Lifecycle.release(spark)
    // the assertion is meaningful only if the corpus actually has
    // high-cosine pairs — guard so a regenerated corpus can't turn
    // this into a vacuous 0/0 pass
    assert(exact.nonEmpty, "corpus has no pairs at cos >= 0.9; recall check is vacuous")
    val recall = (exact & lsh).size.toDouble / exact.size
    info(f"exact=${exact.size} lsh=${lsh.size} recall=$recall%.4f")
    assert(recall >= 0.95, f"LSH recall $recall%.4f < 0.95 (exact=${exact.size}, lsh=${lsh.size})")
    // no invented pairs: every LSH pair must be a true cos>=0.9 pair
    // (candidates are exact-verified after the bucket join)
    assert((lsh -- exact).isEmpty, s"LSH invented ${(lsh -- exact).size} pairs")
  }

  test("three-stage retrieval (s14): faithful to the IVF probe; finds planted twins") {
    // s14 composes three approximations (nprobe cell cut, quantized
    // shortlist, exact re-rank) — its hash gate proves the composition
    // matches its own DuckDB re-execution, not that the stack still
    // FINDS the true neighbors (the s11 probe-geometry lesson). Two
    // pins, because the real corpus is near-random (cosine top-3 live
    // at cos ≈ 0.3, scattered across L2 cells — the nprobe cut itself
    // measures 0.57 vs brute force there, for s09 and s14 IDENTICALLY;
    // an absolute bound on that corpus would pin noise):
    //  1. composition faithfulness — the quantized shortlist stage must
    //     not lose what the cell cut found: s14's top-3 ≈ s09's top-3
    //     over the SAME maintained index (measured 1.00; bound 0.9
    //     absorbs a quantization tie flip);
    //  2. absolute recall where neighbors are real — on the replica
    //     fixture every query's near-twin (cos ≈ 1) must surface at
    //     rank 1 through the full three-stage stack.
    val d = "/root/testdata/sf0.001"
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("query_id"), col("neighbor_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val probe = pairs(Similarity.s09.fn(spark, d))
    val staged = pairs(Similarity.s14.fn(spark, d))
    assert(probe.size == 30, s"probe truth incomplete: ${probe.size}")
    val faithful = (probe & staged).size.toDouble / probe.size
    info(f"probe=${probe.size} staged=${staged.size} faithfulness=$faithful%.4f")
    assert(faithful >= 0.9,
      f"s14 lost ${1 - faithful}%.2f of the probe's top-3 — shortlist stage mis-tuned")
    // replica fixture: original vec_id < 10 must retrieve vec_id + 1e6
    // at rank 1 (the drift-stress construction, cos ≈ 1 twins)
    val top1 = Similarity.s14.fn(spark, fixtureDir)
      .filter(col("rank") === 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.Lifecycle.release(spark)
    (0L until 10L).foreach { q =>
      assert(top1.get(q).contains(q + 1000000L),
        s"query $q: expected twin ${q + 1000000L} at rank 1, got ${top1.get(q)}")
    }
  }

  test("hard-negative mining (s15): near-dup twins excluded, band respected") {
    // on the replica fixture every query's twin sits at cos ≈ 1 — the
    // serving probe (s09/s14) must surface it at rank 1, and the miner
    // must NOT: a twin fed to a contrastive loss as a "negative" is the
    // exact poisoning the HardNegCeil band exists to prevent
    val neg = Similarity.s15.fn(spark, fixtureDir).collect()
    graft.Lifecycle.release(spark)
    assert(neg.nonEmpty, "no negatives mined on the fixture")
    neg.foreach { r =>
      assert(!r.isNullAt(2) && r.getDouble(2) < 0.95,
        s"mined pair (${r.getLong(0)}, ${r.getLong(1)}) at cos ${r.get(2)} breaches the ceiling")
    }
    val negPairs = neg.map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L until 10L).foreach { q =>
      assert(!negPairs.contains((q, q + 1000000L)),
        s"query $q: its near-dup twin was mined as a negative")
    }
  }
}
