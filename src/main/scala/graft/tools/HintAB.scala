package graft.tools

import org.apache.spark.sql.SparkSession

/** Same-window A/B for the verifyJaccardOf SHUFFLE_HASH pin (r15
  * VERDICT slate #4): r15's BENCH showed t34 0.69 → 1.24 s and c04
  * 0.99 → 1.28 s in a round that BOTH pinned the hint and ran on a
  * host whose quiet windows inflated untouched queries 1.5–1.9× —
  * this separates the two. Both queries run the hinted verify join in
  * their timed path (pairDelta exact-verifies candidates live; only
  * the band/resident indexes are persisted), so timing them at sf0.1
  * with the hint pinned vs planner-stats (`off`), interleaved
  * per-pass in ONE JVM, charges host noise to both arms equally.
  * Min-of-3 per arm, the PLANS.md deep-timing protocol.
  *
  *   sbt "runMain graft.tools.HintAB [query ...]"
  */
object HintAB {
  def main(args: Array[String]): Unit = {
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("t34_pair_index_delta", "c04_nightly_maintenance")
    val spark = graft.Sessions.graftDefaults(SparkSession.builder())
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val modes = Seq("shuffle_hash", "off")
    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      // warm: JIT/codegen + publish the persisted band/resident state
      // (the deployment shape — the A/B measures the live verify join,
      // not the one-time index build)
      modes.foreach { m =>
        spark.conf.set("spark.graft.verifyjoin.hint", m)
        fn(spark, "/root/testdata/sf0.1").count()
        graft.Lifecycle.release(spark)
      }
      val times = scala.collection.mutable.Map.empty[String, List[Double]]
        .withDefaultValue(Nil)
      for (_ <- 1 to 3; m <- modes) {
        spark.conf.set("spark.graft.verifyjoin.hint", m)
        val t0 = System.nanoTime()
        fn(spark, "/root/testdata/sf0.1").count()
        val dt = (System.nanoTime() - t0) / 1e9
        graft.Lifecycle.release(spark)
        times(m) = dt :: times(m)
      }
      val line = modes.map { m =>
        f"$m min=${times(m).min}%.2f all=${times(m).reverse.map(t => f"$t%.2f").mkString(",")}"
      }.mkString("  ")
      println(s"HINTAB $name  $line")
    }
    spark.stop()
  }
}
