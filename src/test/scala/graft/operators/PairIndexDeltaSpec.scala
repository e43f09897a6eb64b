package graft.operators

import graft.SparkSpec

/** Pins t34's maintenance contract against t07's full index WITHOUT the
  * DuckDB oracle (CI-runnable): the delta step must emit exactly the
  * pairs with at least one endpoint in the new slice — no base-internal
  * pair re-derived, no slice-involving pair missed, jaccard values
  * identical to the full build's. This is the invariant that makes
  * "append the delta to the published index" a correct maintenance
  * operation: base-internal pairs ∪ delta == the full rebuild. */
class PairIndexDeltaSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  test("delta == slice-involving subset of the full index, values identical") {
    val full = pairs(TextDedup.t07.fn(spark, sf))
    val delta = pairs(TextDedup.t34.fn(spark, sf))
    val expected = full.filter { case ((a, b), _) => a % 10 == 7 || b % 10 == 7 }
    assert(delta.keySet == expected.keySet,
      s"missing=${expected.keySet -- delta.keySet} extra=${delta.keySet -- expected.keySet}")
    delta.foreach { case (k, j) =>
      assert(j == expected(k), s"jaccard drift on $k: $j vs ${expected(k)}")
    }
    assert(delta.nonEmpty, "fixture must exercise the delta path")
    // the union property behind append-maintenance
    val baseInternal = full.view.filterKeys { case (a, b) =>
      a % 10 != 7 && b % 10 != 7
    }.toMap
    assert(baseInternal.keySet ++ delta.keySet == full.keySet)
    assert(baseInternal.keySet.intersect(delta.keySet).isEmpty)
  }

  test("persisted BandIndex path is bit-identical to the inline kernel") {
    // the size gate keeps gate-scale corpora inline; force both arms and
    // pin equality — the invariant that makes the gate a pure
    // optimization (the persisted table IS the kernel's output)
    val prev = spark.conf.getOption("spark.graft.bands.mode")
    try {
      spark.conf.set("spark.graft.bands.mode", "inline")
      val inline = pairs(TextDedup.t34.fn(spark, sf))
      spark.conf.set("spark.graft.bands.mode", "persisted")
      val persisted = pairs(TextDedup.t34.fn(spark, sf))
      assert(persisted == inline,
        s"missing=${inline.keySet -- persisted.keySet} " +
          s"extra=${persisted.keySet -- inline.keySet}")
      assert(persisted.nonEmpty)
    } finally {
      prev.fold(spark.conf.unset("spark.graft.bands.mode"))(
        spark.conf.set("spark.graft.bands.mode", _))
    }
  }

  test("resident index ∪ delta == the full published index (c04's append)") {
    val full = pairs(TextDedup.PairIndex.ensure(spark, sf)
      .orderBy(org.apache.spark.sql.functions.col("doc1")))
    val resident = pairs(TextDedup.ResidentPairIndex.ensure(spark, sf)
      .orderBy(org.apache.spark.sql.functions.col("doc1")))
    val delta = pairs(TextDedup.t34.fn(spark, sf))
    assert(resident.keySet.intersect(delta.keySet).isEmpty,
      "append would double-count a pair")
    val grown = resident ++ delta
    assert(grown == full,
      s"missing=${full.keySet -- grown.keySet} extra=${grown.keySet -- full.keySet}")
    // resident must contain NO slice endpoint — it is yesterday's state
    assert(resident.keySet.forall { case (a, b) => a % 10 != 7 && b % 10 != 7 })
  }
}
