package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the incremental-IVF maintenance contract (s08) as CI
  * assertions, independent of the DuckDB gate:
  *
  *  1. segment partition: base ∪ delta covers every corpus vector
  *     exactly once (a missed or doubled vector in the segment split is
  *     the classic incremental-maintenance bug);
  *  2. delta locality: the delta segment contains ONLY the new crawl
  *     slice — the growth step never touches (so never rewrites) base
  *     rows, which is the whole cost claim;
  *  3. frozen-centroid equivalence: the incremental union equals a
  *     from-scratch deterministic assignment of the whole corpus
  *     against the persisted frozen centroids, cell for cell. This is
  *     the property that lets a deployment trust delta publication
  *     instead of periodic full rebuilds.
  */
class IvfIncSpec extends SparkSpec {

  private val d = "/root/testdata/sf0.001"

  test("incremental IVF: segments partition the corpus; delta is new-slice only") {
    val (base, delta) = Similarity.IvfIncIndex.ensure(spark, d)
    val n = graft.Tables.embeddings(spark, d).count()
    val ids = base.select("vec_id").unionAll(delta.select("vec_id"))
    assert(ids.count() == n, "base+delta row count != corpus")
    assert(ids.distinct().count() == n, "a vector appears in both segments")
    val mod = Similarity.IvfIncIndex.NewSliceMod
    val rem = Similarity.IvfIncIndex.NewSliceRem
    assert(delta.filter(col("vec_id") % mod =!= rem).count() == 0,
      "delta segment contains base-slice vectors")
    assert(base.filter(col("vec_id") % mod === rem).count() == 0,
      "base segment contains new-slice vectors")
    // non-vacuousness: the new slice is genuinely populated
    assert(delta.count() > 0, "empty delta — the growth step tested nothing")
  }

  test("incremental IVF: base ∪ delta == from-scratch assign under frozen centroids") {
    graft.functions.VectorExpressions.register(spark)
    val (base, delta) = Similarity.IvfIncIndex.ensure(spark, d)
    val incremental = base.unionByName(delta)
      .select(col("vec_id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val centroids = spark.read.parquet(
      s"${Similarity.IvfIncIndex.baseDirFor(d)}/centroids")
    val all = graft.Tables.embeddings(spark, d)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
    val scratch = Similarity.IvfIncIndex.assign(all, centroids)
      .select(col("vec_id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(incremental == scratch,
      "incremental segment union diverged from from-scratch assignment")
  }

  test("streaming growth: foreachBatch delta publication equals batch assignment") {
    // The production wiring for continuous index maintenance: new
    // vectors ARRIVE AS A STREAM, and each micro-batch is assigned
    // against the frozen quantizer inside foreachBatch and appended as
    // an immutable segment — the streaming face of ensureDelta. Run as
    // two drains over one checkpoint (a restart boundary in the
    // middle), so the test also pins that maintenance survives process
    // cycling: offsets replay, nothing is re-assigned, and the final
    // segment store equals the one-shot batch assignment of the whole
    // slice, cell for cell.
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    graft.functions.VectorExpressions.register(spark)
    val bd = Similarity.IvfIncIndex.ensureBase(spark, d)
    val centroids = spark.read.parquet(s"$bd/centroids")
    val mod = Similarity.IvfIncIndex.NewSliceMod
    val rem = Similarity.IvfIncIndex.NewSliceRem
    val newVecs = graft.Tables.embeddings(spark, d)
      .filter(col("vec_id") % mod === rem)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
    val arrivals = newVecs.as[(Long, Seq[Double])].collect()
    assert(arrivals.length >= 2, "slice too small to split into batches")
    val (wave1, wave2) = arrivals.splitAt(arrivals.length / 2)
    val root = java.nio.file.Files.createTempDirectory("graft-ivf-stream").toString
    val srcDir = s"$root/arrivals"; val segDir = s"$root/segments"; val ckpt = s"$root/ckpt"
    new java.io.File(srcDir).mkdirs()
    // file source, not MemoryStream: its offsets are replayable across
    // restarts (MemoryStream's are not — a fresh stream would restart
    // its offset counter and the checkpoint would mask the new data)
    val arrivalSchema = newVecs.schema
    def drainWave(wave: Seq[(Long, Seq[Double])]): Unit = {
      wave.toDF("vec_id", "embedding")
        .coalesce(1).write.mode("append").parquet(srcDir)
      val q = spark.readStream.schema(arrivalSchema).parquet(srcDir)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          Similarity.IvfIncIndex.assign(batch, centroids)
            .write.mode("append").parquet(segDir)
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drainWave(wave1)
    drainWave(wave2) // fresh query over the SAME checkpoint: a restart
    val streamed = spark.read.parquet(segDir)
      .select(col("vec_id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val batch = Similarity.IvfIncIndex.assign(newVecs, centroids)
      .select(col("vec_id"), col("cell"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(streamed.size == arrivals.length,
      s"segment store holds ${streamed.size} of ${arrivals.length} vectors " +
        "(a lost or doubled micro-batch)")
    assert(streamed == batch,
      "streaming per-batch assignment diverged from the batch path")
  }

  test("incremental sig-LSH: base ∪ delta == from-scratch signature index") {
    def sigs(df: org.apache.spark.sql.DataFrame): Set[(Long, Int, Int)] =
      df.select(col("vec_id"), col("tbl"), col("bucket"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val scratch = sigs(Similarity.SigIndex.ensure(spark, d))
    val (base, delta) = Similarity.SigIndex.ensureSegments(spark, d)
    assert(sigs(base) ++ sigs(delta) == scratch,
      "segment union diverged from the from-scratch signature index")
    assert(sigs(delta).nonEmpty && (sigs(base) & sigs(delta)).isEmpty,
      "delta empty or overlapping base")
  }

  test("compaction folds the segments without changing a row or a centroid") {
    def cells(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), col("cell"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val (base, delta) = Similarity.IvfIncIndex.ensure(spark, d)
    val union = cells(base.unionByName(delta))
    // the fixture's 1-in-5 slice must trip the 0.2 ratio policy…
    assert(Similarity.IvfIncIndex.compactionDue(spark, d),
      "fixture delta (25% of base) did not trip the 0.2 compaction ratio")
    // …so the maintained reader serves the compacted single segment
    val maintained = cells(Similarity.IvfIncIndex.maintained(spark, d))
    assert(maintained == union, "compaction changed the assignment rows")
    val cdir = Similarity.IvfIncIndex.compactedDirFor(d)
    assert(new java.io.File(s"$cdir/assigned/_SUCCESS").exists(),
      "maintained() did not publish the compacted segment")
    // frozen-quantizer contract: centroids copied bit-identically
    def cen(dir: String) = spark.read.parquet(s"$dir/centroids")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(cen(cdir) == cen(Similarity.IvfIncIndex.baseDirFor(d)),
      "compaction perturbed the frozen centroids")
    // a degraded listing (no such corpus/segments) is never "due":
    // compaction is an optimization, the segmented union stays correct
    assert(!Similarity.IvfIncIndex.compactionDue(spark, "/nonexistent/corpus"))
  }

  test("s10 compacted probe equals the s09 segmented probe row-for-row") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    val seg = rows(Similarity.s09.fn(spark, d))
    val comp = rows(Similarity.s10.fn(spark, d))
    assert(comp == seg, "probe results drifted across the compaction")
    assert(seg.nonEmpty)
  }

  test("hot-cell refinement: dominant cell split, index self-consistent, twins still found") {
    graft.functions.VectorExpressions.register(spark)
    // scratch corpus: half the vectors in one tight cluster around
    // (1,…,1) with hash-jitter ≤ 0.01 — the dominant-cell stress
    val scratch = java.nio.file.Files.createTempDirectory("hotcell").toFile
    graft.Tables.embeddings(spark, d)
      .select(col("vec_id"),
        when(col("vec_id") % 2 === 0,
          transform(col("embedding"), (_, i) =>
            lit(1.0f) + pmod(xxhash64(col("vec_id") * (i + lit(1))), lit(1000L))
              .cast("float") * lit(1e-5f)))
          .otherwise(col("embedding")).as("embedding"),
        col("label"))
      .write.mode("overwrite").parquet(s"$scratch/embeddings.parquet")
    val ds = scratch.getAbsolutePath
    val before = Similarity.IvfIncIndex.maintained(spark, ds)
      .groupBy(col("cell")).count().agg(max(col("count"))).head().getLong(0)
    val budget = 60L
    val rd = Similarity.IvfIncIndex.refineHotCells(spark, ds, budget)
    val refined = spark.read.parquet(s"$rd/assigned")
    val cen = spark.read.parquet(s"$rd/centroids")
    val after = refined.groupBy(col("cell")).count()
      .agg(max(col("count"))).head().getLong(0)
    assert(before > budget, "fixture did not produce a hot cell; test is vacuous")
    assert(after < before, s"refinement did not shrink the hot cell: $after vs $before")
    // no row lost or doubled across the rebuild
    assert(refined.count() == graft.Tables.embeddings(spark, ds).count())
    assert(refined.select("vec_id").distinct().count() == refined.count())
    // self-consistency: every row's cell is the argmin over the shipped
    // centroid table under the same score and tie rule (what
    // own-cell-first probing rests on)
    val cenArr = cen.collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
    def dotSeq(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
    refined.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("e"), col("cell"))
      .collect().foreach { r =>
        val x = r.getSeq[Double](1).toArray
        val best = cenArr.map { case (c, v) =>
          (dotSeq(v, v) - 2.0 * dotSeq(x, v), c) }.min._2
        assert(r.getInt(2) == best, s"row ${r.getLong(0)} not argmin-assigned")
      }
    // near-dup recall preserved: a hot-cluster query's top-1 through the
    // refined probe must be its nearest jittered twin by exact cosine
    val probe = Similarity.ivfProbeN(refined,
      cen, 10).filter(col("rank") === 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val truthTop1 = Similarity.annTopK(
        graft.Tables.embeddings(spark, ds), "vec_id", "embedding",
        graft.Tables.embeddings(spark, ds).filter(col("vec_id") < 10), 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hotQueries = probe.keySet.filter(_ % 2 == 0)
    assert(hotQueries.nonEmpty)
    hotQueries.foreach { q =>
      assert(probe(q) == truthTop1(q),
        s"refined probe lost query $q's true top-1: ${probe(q)} vs ${truthTop1(q)}")
    }
  }

  test("cached-assignment monitor agrees with the from-scratch monitor and flips no arm") {
    graft.functions.VectorExpressions.register(spark)
    // the quiet-arm monitor (r17): driftRatioFromAssigned reads the
    // maintained index's cells instead of re-deriving the argmin; the
    // two instruments must agree up to double-AVG fold order (the
    // stored cell IS the argmin, so the winning distance is the same
    // number per row) and — the property the policy rests on — must
    // make the same recluster decision
    val cen = spark.read.parquet(
      s"${Similarity.IvfIncIndex.ensureBase(spark, d)}/centroids")
    val fromScratch = Similarity.IvfIncIndex.driftRatio(spark, d)
    val fromIndex = Similarity.IvfIncIndex.driftRatioFromAssigned(
      Similarity.IvfIncIndex.maintained(spark, d), cen)
    assert(math.abs(fromIndex - fromScratch) <= 1e-9 * math.abs(fromScratch),
      s"monitor instruments diverged: index=$fromIndex scratch=$fromScratch")
    assert((fromIndex >= Similarity.IvfIncIndex.ReclusterRatio) ==
      (fromScratch >= Similarity.IvfIncIndex.ReclusterRatio))
  }

  test("drift monitor: same-distribution growth stays quiet, a planted shift trips recluster") {
    graft.functions.VectorExpressions.register(spark)
    // fixture slices are drawn from one distribution: the ratio must sit
    // near 1.0 and the trigger must stay quiet — a monitor that cries
    // wolf schedules full refits for nothing
    val r0 = Similarity.IvfIncIndex.driftRatio(spark, d)
    assert(r0 > 0.8 && r0 < Similarity.IvfIncIndex.ReclusterRatio,
      s"fixture drift ratio $r0 outside the quiet band")
    assert(!Similarity.IvfIncIndex.reclusterDue(spark, d))
    // scratch corpus: the delta slice shifted +0.75 per component — a
    // modest distribution change (well under one σ per dim) that frozen
    // centroids cannot follow
    val mod = Similarity.IvfIncIndex.NewSliceMod
    val rem = Similarity.IvfIncIndex.NewSliceRem
    val scratch = java.nio.file.Files.createTempDirectory("drift").toFile
    graft.Tables.embeddings(spark, d)
      .select(col("vec_id"),
        when(col("vec_id") % mod === rem,
          transform(col("embedding"), x => x + lit(0.75f)))
          .otherwise(col("embedding")).as("embedding"),
        col("label"))
      .write.mode("overwrite").parquet(s"$scratch/embeddings.parquet")
    val ds = scratch.getAbsolutePath
    val r1 = Similarity.IvfIncIndex.driftRatio(spark, ds)
    assert(r1 >= Similarity.IvfIncIndex.ReclusterRatio,
      s"planted shift not detected: ratio $r1")
    assert(Similarity.IvfIncIndex.reclusterDue(spark, ds))
    // the response adapts: under the generation-2 centroids (fresh fit
    // over the grown corpus) the shifted slice's mean squared distance
    // must drop vs the frozen generation's — reclustering actually
    // followed the distribution, it didn't just reshuffle cells
    val g2 = Similarity.IvfIncIndex.recluster(spark, ds)
    val deltaVecs = graft.Tables.embeddings(spark, ds)
      .filter(col("vec_id") % mod === rem)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
    def meanDist(cdir: String): Double =
      Similarity.IvfIncIndex.assignWithDist(
          deltaVecs, spark.read.parquet(s"$cdir/centroids"))
        .agg(avg(col("sqdist"))).head().getDouble(0)
    val frozen = meanDist(Similarity.IvfIncIndex.baseDirFor(ds))
    val refit = meanDist(g2)
    assert(refit < frozen,
      s"gen-2 centroids did not adapt: $refit vs frozen $frozen")
    // and the new generation is a complete index over the grown corpus
    val n = graft.Tables.embeddings(spark, ds).count()
    assert(spark.read.parquet(s"$g2/assigned").count() == n)
  }

  test("driftRatio fires on a shifted delta over a DEGENERATE base (zero base mean)") {
    // base slice of exactly K distinct vectors: each becomes its own
    // centroid, base mean sqdist is exactly 0 (a − 2a + a in IEEE) —
    // the old quiet-1.0 guard would mask the shifted delta forever
    // (r15 second-pass finding); infinite drift must FIRE
    import spark.implicits._
    graft.functions.VectorExpressions.register(spark)
    val k = Similarity.IvfIndex.K
    val mod = Similarity.IvfIncIndex.NewSliceMod
    val rem = Similarity.IvfIncIndex.NewSliceRem
    // ids 0..(mod*k/ (mod-1))… simpler: lay out ids so EXACTLY k ids are
    // base (id % mod != rem) and a few are delta, all vectors distinct
    val baseIds = (0L until 100L).filter(_ % mod != rem).take(k)
    val deltaIds = (0L until 100L).filter(_ % mod == rem).take(4)
    // 97 prime and 31 invertible mod 97: distinct ids give distinct
    // vectors (a mod-13 first attempt collided 16 ids onto 13 vectors
    // and k-means|| init blew up with fewer distinct centers than k)
    def vec(id: Long, shift: Float): Seq[Float] =
      (0 until 64).map(i => ((id * 31 + i * 7) % 97).toFloat / 97f + shift)
    val rows = baseIds.map(id => (id, vec(id, 0f), "b")) ++
      deltaIds.map(id => (id, vec(id, 5f), "d"))
    val scratch = java.nio.file.Files.createTempDirectory("degen").toFile
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$scratch/embeddings.parquet")
    val r = Similarity.IvfIncIndex.driftRatio(spark, scratch.getAbsolutePath)
    assert(r >= Similarity.IvfIncIndex.ReclusterRatio,
      s"degenerate-base shift masked as quiet: ratio $r")
  }

  test("nightly composite: grow + fold fire on the fixture, drift stays quiet; a shift trips gen-2") {
    graft.functions.VectorExpressions.register(spark)
    val quiet = Similarity.IvfIncIndex.nightly(spark, d).toMap
    assert(quiet.contains("base") && quiet.contains("delta"))
    assert(quiet.contains("compacted"), "fixture 25% delta should fold")
    assert(quiet("drift").contains("quiet") && !quiet.contains("gen2"),
      s"spurious recluster on same-distribution growth: $quiet")
    // shifted corpus: the same entry point must also recluster
    val mod = Similarity.IvfIncIndex.NewSliceMod
    val rem = Similarity.IvfIncIndex.NewSliceRem
    val scratch = java.nio.file.Files.createTempDirectory("nightly").toFile
    graft.Tables.embeddings(spark, d)
      .select(col("vec_id"),
        when(col("vec_id") % mod === rem,
          transform(col("embedding"), x => x + lit(0.75f)))
          .otherwise(col("embedding")).as("embedding"),
        col("label"))
      .write.mode("overwrite").parquet(s"$scratch/embeddings.parquet")
    val shifted = Similarity.IvfIncIndex.nightly(spark, scratch.getAbsolutePath).toMap
    assert(shifted.contains("gen2"),
      s"shifted slice did not trigger the recluster: $shifted")
    assert(new java.io.File(s"${shifted("gen2")}/assigned/_SUCCESS").exists())
  }

  test("probe plans BROADCAST the probed side — the hot-cell straggler tripwire") {
    // the probed frame is <= queries x nprobe rows by construction but
    // the planner cannot see that through two windows and a crossJoin:
    // without the explicit broadcast it plans a shuffle join on cell
    // and a dominant cell's whole fan-out lands on ONE task (measured
    // maxTask 94.8s at 384k vectors — PLANS.md HOTCELL). Pin the join
    // shape so a refactor can't silently revert it.
    Seq(Similarity.s04.fn(spark, d), Similarity.s09.fn(spark, d),
        Similarity.s10.fn(spark, d), Similarity.s11.fn(spark, d))
      .zip(Seq("s04", "s09", "s10", "s11")).foreach { case (df, name) =>
        val plan = df.queryExecution.executedPlan.toString
        assert(plan.contains("BroadcastHashJoin [cell"),
          s"$name: candidate join is not a broadcast hash join on cell:\n" +
            plan.linesIterator.filter(_.contains("Join")).mkString("\n"))
        assert(!plan.contains("SortMergeJoin [cell"),
          s"$name: candidate join reverted to a sort-merge join on cell")
      }
  }

  test("s09 segmented probe: complete top-3 per query, neighbors from BOTH segments") {
    val rows = Similarity.s09.fn(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    val byQ = rows.groupBy(_._1)
    assert(byQ.keySet == (0L until 10L).toSet, s"queries missing: ${byQ.keySet}")
    byQ.values.foreach(g => assert(g.map(_._3).sorted.toSeq == Seq(1, 2, 3)))
    // the reader view must actually serve the union: with queries and
    // corpus spanning both segments, at least one reported neighbor must
    // be a delta vector (vec_id % 5 == 4) and at least one a base vector
    val neigh = rows.map(_._2)
    assert(neigh.exists(_ % 5 == 4), "no delta-segment neighbor surfaced")
    assert(neigh.exists(_ % 5 != 4), "no base-segment neighbor surfaced")
  }

  test("generation serving: quiet corpus keeps gen-1; planted shift publishes and serves gen-2") {
    graft.functions.VectorExpressions.register(spark)
    import Similarity.IvfIncIndex
    def cenMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    def cellMap(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), col("cell")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // quiet arm: the ring's own corpus reads ~1.0 drift — the policy
    // must serve the frozen gen-1 centroids over the maintained index
    val (qa, qc) = IvfIncIndex.servedGeneration(spark, d, None, "spec")
    val baseCen = cenMap(spark.read.parquet(
      s"${IvfIncIndex.baseDirFor(d)}/centroids"))
    assert(cenMap(qc) == baseCen, "quiet arm must serve the frozen gen-1 centroids")
    assert(cellMap(qa) == cellMap(IvfIncIndex.maintained(spark, d)),
      "quiet arm must serve the maintained index rows")
    // fired arm: the planted-shift derivation crosses the trigger — the
    // policy must publish the SALTED gen-2 dir and serve an index that
    // is SELF-CONSISTENT (every row's cell is the argmin over the
    // centroid table it ships with — the invariant own-cell-first
    // probing rests on) and genuinely refit (centroids differ from
    // gen-1's)
    val (da, dc) = IvfIncIndex.servedGeneration(
      spark, d, Some(Similarity.shiftedEmb(spark, d)), "spec")
    assert(new java.io.File(
      s"${IvfIncIndex.gen2DirFor(d)}_spec_drv/assigned/_SUCCESS").exists(),
      "fired arm must publish the salted, arm-discriminated gen-2 dir")
    assert(cenMap(dc) != baseCen, "gen-2 centroids must be a fresh fit, not gen-1's")
    val reassigned = cellMap(IvfIncIndex.assign(
      da.select(col("vec_id"), col("embedding")), dc))
    assert(cellMap(da) == reassigned,
      "served gen-2 index is not self-consistent with its own centroids")
  }
}
