package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Starved-heap A/B for the ring's verify-join hint (r15 VERDICT slate
  * #5): the SHUFFLE_HASH pin in `verifyJaccardOf` was motivated by a
  * real plan dump (Night0Diag: both corpus-sized shingle-set sides
  * planned as 100k-row text-payload BROADCASTS under the ring's
  * stacked selectivity estimates — the SpillSmoke r13 OOM class) but
  * proven only by plan SHAPE. This runs the actual night-0 build of
  * the promotion ring over the deep replica corpus under a
  * deliberately starved heap, once per hint mode, and records
  * completes/dies + spill metrics — evidence, not inference, for the
  * memory-safety claim.
  *
  * Usage (one JVM per mode — the heap is a fork-JVM setting):
  *   SPARK_DRIVER_MEM=3g SPARK_GRAFT_MEM_FRACTION=0.2 \
  *     sbt "runMain graft.tools.RingSpill [k] [shuffle_hash|off]"
  *
  * The ring state dirs for the replica corpus are deleted first so the
  * night genuinely builds under the starved settings (a warm /tmp
  * publication would measure a parquet read). Output:
  *   RINGSPILL k=<k> docs=<n> hint=<mode> heapMb=<MB> outcome=<ok|OOM...>
  *     wall=<s> pairs=<n> memSpill=<MB> diskSpill=<MB>
  */
object RingSpill {

  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(25)
    val hint = args.drop(1).headOption.getOrElse("shuffle_hash")
    val fraction = sys.env.getOrElse("SPARK_GRAFT_MEM_FRACTION", "0.2")
    val spark = graft.Sessions.graftDefaults(SparkSession.builder())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.memory.fraction", fraction)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.graft.verifyjoin.hint", hint)
    spark.conf.set("spark.graft.bands.mode", "persisted")

    // DECORRELATED replica corpus: every token carries a per-replica
    // suffix, so shingle sets are DISJOINT across replicas — zero
    // cross-replica band candidates, and the verify workload grows ∝ k
    // while the sets side (the broadcast/build pressure this instrument
    // exists to starve) grows ∝ k too. The old `text + " replicaN"`
    // corpus band-collided all k replicas of a doc into one near-dup
    // clique, exploding candidates ∝ k² — at k=100 EVERY plan drowned
    // in the 25M-pair verify volume and the A/B measured the workload,
    // not the join strategy (r16 finding).
    val dir = s"/tmp/graft_scale_v2_${k}x"
    if (!new java.io.File(s"$dir/documents.parquet").isDirectory) {
      val base = graft.Tables.documents(spark, "/root/testdata/sf0.1")
      (0 until k).map { i =>
        if (i == 0) base
        else base.select(
          (col("doc_id") + lit(i.toLong * 1000000L)).as("doc_id"),
          expr(s"array_join(transform(split(text, ' '), t -> concat(t, '_$i')), ' ')")
            .as("text"),
          col("lang"), col("source"), col("n_chars"))
      }.reduce(_ unionAll _).write.mode("overwrite")
        .parquet(s"$dir/documents.parquet")
    }
    val nDocs = graft.Tables.documents(spark, dir).count()

    import graft.operators.TextDedup
    // fresh night-0 build: clear the ring's published states (keep the
    // band index — the night reads it persisted, the deployment shape)
    (0 to TextDedup.PromotedPairIndex.SliceRems.size).foreach(n =>
      graft.Lifecycle.deleteRecursively(new java.io.File(
        TextDedup.PromotedPairIndex.stateDirFor(dir, n))))
    TextDedup.BandIndex.ensure(spark, dir).count() // outside the timing

    val memSpill = new java.util.concurrent.atomic.LongAdder
    val diskSpill = new java.util.concurrent.atomic.LongAdder
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        Option(e.taskMetrics).foreach { m =>
          memSpill.add(m.memoryBytesSpilled); diskSpill.add(m.diskBytesSpilled)
        }
    })
    val heapMb = Runtime.getRuntime.maxMemory() / (1024 * 1024)
    val t0 = System.nanoTime()
    val outcome =
      try Right(TextDedup.PromotedPairIndex.ensure(spark, dir, 0).count())
      catch { case e: Throwable => Left(e.getClass.getSimpleName + ": " +
        String.valueOf(e.getMessage).take(120)) }
    val wall = (System.nanoTime() - t0) / 1e9
    val mb = 1024 * 1024
    println(f"RINGSPILL k=$k docs=$nDocs hint=$hint heapMb=$heapMb " +
      f"outcome=${outcome.fold(identity, n => s"ok($n pairs)")} wall=$wall%.1fs " +
      f"memSpill=${memSpill.sum / mb}MB diskSpill=${diskSpill.sum / mb}MB")
    spark.stop()
  }
}
