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
}
