package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The library-façade contract (r13 VERDICT slate #6): the highest-reuse
  * operators must work as plain DataFrame-in/DataFrame-out APIs over
  * tables they were NOT developed against — the fixture gates then stay
  * as instantiations. profile() (ProfileSpec) and packSequences
  * (CorpusSpec) already have this shape; these tests pin dedupNearPairs
  * and snapshotDiff. */
class FacadeSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("dedupNearPairs over the documents fixture equals the t07 gate result") {
    val facade = TextDedup.dedupNearPairs(
        graft.Tables.documents(spark, sf), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val gate = TextDedup.t07.fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(facade == gate)
    assert(facade.nonEmpty)
  }

  test("dedupNearPairs finds planted twins in a second table (part)") {
    // a table the pipeline was never tuned on: part descriptions
    // (name + type + brand — ≥4 tokens, enough for 3-token shingles)
    // plus a twin copy of every row under offset keys — each original
    // must pair with its twin at jaccard 1.0, and exact verification
    // must keep every reported pair at or above the threshold
    val part = graft.Tables.part(spark, sf)
      .select(col("p_partkey").as("id"),
        concat_ws(" ", col("p_name"), col("p_type"), col("p_brand")).as("nm"))
    val twins = part.select((col("id") + 100000L).as("id"), col("nm"))
    val pairs = TextDedup.dedupNearPairs(part.unionByName(twins), "id", "nm")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val keys = part.select("id").collect().map(_.getLong(0))
    keys.foreach { k =>
      assert(pairs.get((k, k + 100000L)).contains(1.0),
        s"twin pair for part $k missing or not 1.0: ${pairs.get((k, k + 100000L))}")
    }
    assert(pairs.values.forall(_ >= 0.6))
  }

  test("dedupNearPairsDelta + resident pairs reconstruct the full pair set") {
    val part = graft.Tables.part(spark, sf)
      .select(col("p_partkey").as("id"),
        concat_ws(" ", col("p_name"), col("p_type"), col("p_brand")).as("nm"))
    val all = part.unionByName(
      part.select((col("id") + 100000L).as("id"), col("nm")))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val full = pairs(TextDedup.dedupNearPairs(all, "id", "nm"))
    val resident = pairs(TextDedup.dedupNearPairs(part, "id", "nm"))
    val delta = pairs(TextDedup.dedupNearPairsDelta(all, "id", "nm",
      col("id") >= 100000L))
    // the append invariant, at the facade entry point: resident ∪ delta
    // == full, disjoint, and delta is exactly the new-endpoint subset
    assert(resident.keySet.intersect(delta.keySet).isEmpty)
    assert(resident ++ delta == full)
    assert(delta.keySet == full.keySet.filter { case (a, b) =>
      a >= 100000L || b >= 100000L })
    assert(delta.nonEmpty && resident.keySet.subsetOf(full.keySet))
  }

  test("dedupKeepMask: resident partners dominate, earlier batch ids win ties") {
    import spark.implicits._
    // pairs: (1,2) batch-internal, (3,4) resident-vs-batch, 5 isolated;
    // the duplicated 5 must still yield ONE mask row (per-id contract)
    val pairs = Seq((1L, 2L, 1.0), (3L, 4L, 1.0)).toDF("doc1", "doc2", "jaccard")
    val batch = Seq(1L, 2L, 4L, 5L, 5L).toDF("doc_id")
    val mask0 = TextDedup.dedupKeepMask(pairs, batch).collect()
    assert(mask0.length == 4, "duplicate batch ids must collapse to one mask row")
    val mask = mask0.map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(mask == Map(
      1L -> true,  // partner 2 is batch-internal and LARGER: 1 wins
      2L -> false, // dominated by earlier batch doc 1
      4L -> false, // dominated by resident doc 3 (resident always wins)
      5L -> true)) // no near-dup at all
    // and over a real corpus: every planted twin (batch) is dominated by
    // its resident original
    val part = graft.Tables.part(spark, sf)
      .select(col("p_partkey").as("id"),
        concat_ws(" ", col("p_name"), col("p_type"), col("p_brand")).as("nm"))
    val all = part.unionByName(
      part.select((col("id") + 100000L).as("id"), col("nm")))
    val twins = part.select((col("id") + 100000L).as("doc_id"))
    val m2 = TextDedup.dedupKeepMask(
        TextDedup.dedupNearPairs(all, "id", "nm"), twins)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(m2.keySet == twins.collect().map(_.getLong(0)).toSet)
    assert(m2.values.forall(_ == false), "a twin survived its resident original")
  }

  // deterministic signed pseudo-vectors over a table the vector
  // pipeline was never tuned on: 8 components in [-1, 1) hashed from
  // the customer key
  private def custVecs = {
    val c = graft.Tables.customer(spark, sf)
    c.select(col("c_custkey").as("id"),
      array((1 to 8).map(i =>
        (pmod(xxhash64(col("c_custkey") * lit(i)), lit(2000L)).cast("float")
          - lit(1000f)) / lit(1000f)): _*).as("v"))
  }

  test("annTopK over the embeddings fixture equals the s02 gate result") {
    val q = graft.Tables.embeddings(spark, sf).filter(col("vec_id") < 10)
    val facade = Similarity.annTopK(
        graft.Tables.embeddings(spark, sf), "vec_id", "embedding", q, 5)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    val gate = Similarity.s02.fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(3)) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(facade == gate)
    assert(facade.nonEmpty)
  }

  test("annTopK finds planted twins rank-1 in a second table (customer)") {
    val base = custVecs
    val twins = base.select((col("id") + 500000L).as("id"), col("v"))
    val top1 = Similarity.annTopK(base.unionByName(twins), "id", "v", base, 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val keys = base.select("id").collect().map(_.getLong(0))
    keys.foreach { k =>
      val (nb, cos) = top1(k)
      assert(nb == k + 500000L, s"rank-1 of $k is $nb, not its twin")
      assert(math.abs(cos - 1.0) < 1e-12, s"twin cosine $cos")
    }
    assert(keys.nonEmpty)
  }

  test("ivfDelta: frozen-centroid assignment matches a brute-force argmin; flags echoed") {
    val base = custVecs
    val grown = base.unionByName(
      base.select((col("id") + 500000L).as("id"), col("v")))
    val (assigned, centroids) = Similarity.ivfDelta(
      grown, "id", "v", col("id") >= 500000L, k = 4)
    val cen = centroids.collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).sortBy(_._1)
    assert(cen.map(_._1).toSeq == Seq(0, 1, 2, 3))
    val rows = assigned.collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getBoolean(2))).toMap
    val vecs = grown.select(col("id"),
        transform(col("v"), x => x.cast("double")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    assert(rows.keySet == vecs.keySet, "a row was lost or doubled")
    // brute-force counterfactual with the SAME score and tie rule:
    // sequential-fold ‖c‖² − 2·x·c, ties to the smallest cell
    def dotSeq(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
    vecs.foreach { case (id, x) =>
      val best = cen.map { case (cell, c) =>
        (dotSeq(c, c) - 2.0 * dotSeq(x, c), cell)
      }.min._2
      assert(rows(id)._1 == best, s"id $id assigned ${rows(id)._1}, argmin $best")
      assert(rows(id)._2 == (id >= 500000L), s"id $id is_new flag wrong")
    }
    // the maintenance contract: appending the new side cannot perturb
    // the resident side — re-run with ONLY the resident rows and the
    // same k; resident assignments must be identical (frozen quantizer)
    val (resOnly, _) = Similarity.ivfDelta(base, "id", "v", lit(false), k = 4)
    val resMap = resOnly.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    vecs.keySet.filter(_ < 500000L).foreach { id =>
      assert(resMap(id) == rows(id)._1,
        s"resident $id moved cells when the delta arrived")
    }
  }

  test("ivfDelta rejects a NULL isNew flag loudly") {
    import spark.implicits._
    val df = Seq((1L, Seq(1f, 0f), Some(false)), (2L, Seq(0f, 1f), Option.empty[Boolean]))
      .toDF("id", "v", "flag")
    val e = intercept[Exception] {
      Similarity.ivfDelta(df, "id", "v", col("flag"), k = 1)._1.collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("isNew must be non-null")), e.toString)
  }

  test("publishPairs closes the facade ring: build → grow → promote → probe on a second table") {
    // the WHOLE maintenance loop through the public APIs alone, over
    // part-table text the pipeline was never tuned on: night 0 builds
    // and promotes the resident pairs; night 1 grows with the twin
    // slice's delta, promotes the union, and probes the twins
    import org.apache.spark.sql.functions.col
    val part = graft.Tables.part(spark, sf)
      .select(col("p_partkey").as("id"),
        concat_ws(" ", col("p_name"), col("p_type"), col("p_brand")).as("nm"))
    val all = part.unionByName(
      part.select((col("id") + 100000L).as("id"), col("nm")))
    val root = java.nio.file.Files.createTempDirectory("ring_api").toFile
    val night0 = TextDedup.publishPairs(
      TextDedup.dedupNearPairs(part, "id", "nm"), s"$root/n0")
    val delta = TextDedup.dedupNearPairsDelta(all, "id", "nm", col("id") >= 100000L)
    val night1 = TextDedup.publishPairs(night0.unionByName(delta), s"$root/n1")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // the promoted state equals the from-scratch full build
    assert(pairs(night1) == pairs(TextDedup.dedupNearPairs(all, "id", "nm")))
    // publish-once: re-promoting different rows into the SAME dir is a
    // no-op — the published state wins (a crashed retry can't clobber)
    val again = TextDedup.publishPairs(night0, s"$root/n1")
    assert(pairs(again) == pairs(night1), "re-publication clobbered the state")
    // and the probe over the promoted state drops every twin
    val twins = part.select((col("id") + 100000L).as("doc_id"))
    val mask = TextDedup.dedupKeepMask(night1, twins)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(mask.nonEmpty && mask.values.forall(_ == false))
  }

  test("snapshotDiff classifies a hand-built customer snapshot pair exactly") {
    val a = graft.Tables.customer(spark, sf)
    val removed = a.filter(pmod(col("c_custkey"), lit(10)) === 0)
    val changed = a.filter(pmod(col("c_custkey"), lit(10)) =!= 0 &&
      pmod(col("c_custkey"), lit(7)) === 0)
    val b = a.filter(pmod(col("c_custkey"), lit(10)) =!= 0)
      .withColumn("c_acctbal",
        when(pmod(col("c_custkey"), lit(7)) === 0, col("c_acctbal") + 5.0)
          .otherwise(col("c_acctbal")))
      .unionByName(a.limit(0)) // schema guard: unionByName would throw on drift
      .unionByName(a.filter(pmod(col("c_custkey"), lit(10)) === 1)
        .withColumn("c_custkey", col("c_custkey") + 900000L))
    val diff = Advanced.snapshotDiff(a, b, "c_custkey", "c_acctbal")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val total = a.count()
    val nRemoved = removed.count()
    val nChanged = changed.count()
    val nAdded = a.filter(pmod(col("c_custkey"), lit(10)) === 1).count()
    assert(diff("removed")._1 == nRemoved)
    assert(diff("changed")._1 == nChanged)
    assert(diff("added")._1 == nAdded)
    assert(diff("unchanged")._1 == total - nRemoved - nChanged)
    // decimal-exact deltas: +5 per changed row; removed rows subtract
    // their balance; added rows contribute theirs
    assert(diff("changed")._2 == 5.0 * nChanged)
    val removedSum = removed.agg(graft.functions.Exact.exactSum(col("c_acctbal")))
      .head().getDouble(0)
    assert(diff("removed")._2 == -removedSum)
  }

  test("dedupNearPairsDelta rejects a NULL isNew flag loudly") {
    import spark.implicits._
    // a null flag is neither resident nor new — silently picking either
    // side would corrupt the append invariant, so the facade must throw
    val df = Seq((1L, "alpha beta gamma delta", Some(true)),
      (2L, "alpha beta gamma delta", Option.empty[Boolean])).toDF("id", "nm", "flag")
    val e = intercept[Exception] {
      TextDedup.dedupNearPairsDelta(df, "id", "nm", col("flag")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("isNew must be non-null")), e.toString)
  }

  test("snapshotDiff derives delta precision from BOTH sides (finer b-side scale kept)") {
    // a schema migration can widen only the newer snapshot: a DOUBLE 'a'
    // paired with a DECIMAL(20,4) 'b' must keep b's sub-cent digits in
    // the delta — deriving from 'a' alone would round them silently at
    // the cast (r15 review finding)
    import spark.implicits._
    val a = Seq((1L, 1.0)).toDF("k", "v")
      .select(col("k"), col("v").cast("decimal(12,2)").as("v"))
    val b = Seq((1L, 1.0001)).toDF("k", "v")
      .select(col("k"), col("v").cast("decimal(20,4)").as("v"))
    val diff = Advanced.snapshotDiff(a, b, "k", "v")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(diff("changed") == 0.0001, s"sub-cent delta lost: ${diff("changed")}")
  }

  test("snapshotDiff: wide decimals stay exact (no double roundtrip), non-decimal side keeps its floor") {
    import spark.implicits._
    // 16 integer digits + a sub-cent tail: any double roundtrip zeroes
    // the .0001 (r15 second-pass finding — coalesce with a double
    // literal widened decimal+double to DOUBLE before the decimal cast)
    val a = Seq((1L, "9999999999999999.0000")).toDF("k", "v")
      .select(col("k"), col("v").cast("decimal(20,4)").as("v"))
    val b = Seq((1L, "9999999999999999.0001")).toDF("k", "v")
      .select(col("k"), col("v").cast("decimal(20,4)").as("v"))
    val wide = Advanced.snapshotDiff(a, b, "k", "v")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(wide("changed") == 0.0001, s"wide-decimal tail lost: ${wide("changed")}")
    // ONE decimal side must not strip the other side's float-borne
    // bound: a DOUBLE 10.55 diffed against DECIMAL(20,0) keeps its
    // cents (scale floored at 2), instead of rounding to 11
    val a2 = Seq((1L, 10.55)).toDF("k", "v")
    val b2 = Seq((1L, 10.0)).toDF("k", "v")
      .select(col("k"), col("v").cast("decimal(20,0)").as("v"))
    val mixed = Advanced.snapshotDiff(a2, b2, "k", "v")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(mixed("changed") == -0.55, s"double side rounded: ${mixed("changed")}")
  }

  test("snapshotDiff classifies NULL values by side presence, not value nullness") {
    // a nullable value column must not flip a both-sides row into
    // added/removed (r14 review finding): null->value and value->null
    // are CHANGES, null->null is unchanged
    import spark.implicits._
    val a = Seq((1L, Option.empty[Double]), (2L, Some(7.0)),
      (3L, Option.empty[Double]), (4L, Some(1.0))).toDF("k", "v")
    val b = Seq((1L, Some(5.0)), (2L, Option.empty[Double]),
      (3L, Option.empty[Double]), (5L, Some(2.0))).toDF("k", "v")
    val diff = Advanced.snapshotDiff(a, b, "k", "v")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(diff.getOrElse("changed", 0L) == 2)   // k=1 null->5.0, k=2 7.0->null
    assert(diff.getOrElse("unchanged", 0L) == 1) // k=3 null->null
    assert(diff.getOrElse("removed", 0L) == 1)   // k=4
    assert(diff.getOrElse("added", 0L) == 1)     // k=5
  }
}
