package graft

import org.apache.spark.sql.SparkSession
import scala.util.control.NonFatal

/** Per-query resource lifecycle for the gate catalog.
  *
  * A [[QueryDef]] fn returns a LAZY DataFrame that the harness (Bench's
  * `.count()`, Verify's parquet write) evaluates only after the fn
  * returns — so a fn that caches/checkpoints intermediate state cannot
  * release it before returning without breaking its own evaluation.
  * Instead the fn registers the release here with [[defer]], and the
  * harness calls [[release]] once the result has been consumed.
  *
  * Why it matters: Bench runs a warmup pass plus two timed passes of the
  * whole catalog in ONE JVM. Without release, every `cache()`,
  * `localCheckpoint()` and memory-sink table from every query stays
  * resident in the block store for the session — measured in round 2 as a
  * 3-6x slowdown of the queries that happen to run late in the
  * alphabetical order (q16-q21), and a +45% total on unchanged plans.
  *
  * [[release]] also does a belt-and-braces sweep: clear the Dataset cache
  * registry and unpersist any RDD still pinned (localCheckpoint blocks do
  * not flow through the catalog cache, only through
  * `SparkContext.getPersistentRDDs`). Deferred actions run first so
  * contract-bearing cleanups (e.g. `Ingest.LoadResult.cleanup()`) execute
  * against live handles.
  */
object Lifecycle {

  private val deferred = new java.util.concurrent.ConcurrentLinkedQueue[() => Unit]

  /** Register a cleanup to run after the current query's result has been
    * consumed by the harness. Safe to call from any query fn; actions run
    * at most once, in registration order. */
  def defer(f: => Unit): Unit = deferred.add(() => f)

  /** Hooks observing every top-level [[deleteRecursively]] — registered
    * by caches keyed on on-disk paths (IndexStore's published-schema
    * pin) so an in-JVM delete-and-recreate of a dir re-infers instead of
    * serving the stale cached entry (r20 ADVICE). Registration is
    * lazy-by-classload: a JVM that never loads the cache owner has
    * nothing to invalidate. */
  private val deleteHooks =
    new java.util.concurrent.CopyOnWriteArrayList[String => Unit]
  def onDelete(hook: String => Unit): Unit = { deleteHooks.add(hook); () }

  /** Recursive delete of a scratch dir/file. The ONE implementation
    * shared by checkpoint, fixture and index cleanup (Drain, StAmortize,
    * ScaleSmoke, IndexStore) so null handling and any future hardening
    * live in one place. Fires [[onDelete]] hooks once per call, after
    * the tree is gone. */
  def deleteRecursively(f: java.io.File): Unit = {
    deleteTree(f)
    val p = f.getAbsolutePath
    deleteHooks.forEach { h => try h(p) catch { case NonFatal(_) => () } }
  }

  private def deleteTree(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteTree)
    f.delete(); ()
  }

  /** Run deferred cleanups, then sweep all cached Datasets and any RDD
    * blocks still persisted (checkpoints). Failures are swallowed — a
    * cleanup must never fail the gate.
    *
    * The unpersist is BLOCKING: the async variant only enqueues the
    * removal, so a 127-query catalog pass stacks un-freed checkpoint
    * blocks from query N into query N+1's working set (round-13 churn
    * audit). Blocking costs <1 ms per block here and makes the release
    * a real barrier.
    *
    * [[maybeGc]]: broadcast variables and shuffle files are reclaimed by
    * Spark's ContextCleaner only when the DRIVER GCs the corresponding
    * handle — and `spark.cleaner.periodicGC.interval` defaults to 30
    * MINUTES, longer than an entire catalog pass, so in a single-JVM
    * bench nothing is reclaimed mid-pass. An explicit GC here was the
    * working theory for the in-catalog drag on heavy entries — and the
    * A/B DISPROVED it (see gcMode below): the drag was codegen-cache
    * thrash, and explicit GC actively hurts by unloading generated
    * classes. Default off; SPARK_GRAFT_RELEASE_GC = seconds | "each" |
    * "off" remains for embedders whose long-session workloads are
    * genuinely broadcast/shuffle-accumulation-bound. */
  def release(spark: SparkSession): Unit = {
    var f = deferred.poll()
    while (f != null) {
      try f() catch { case NonFatal(_) => () }
      f = deferred.poll()
    }
    try spark.catalog.clearCache() catch { case NonFatal(_) => () }
    spark.sparkContext.getPersistentRDDs.valuesIterator.foreach { r =>
      try r.unpersist(blocking = true) catch { case NonFatal(_) => () }
    }
    maybeGc()
  }

  // Default OFF — measured A/B at the 128-query catalog, sf0.1, two
  // windows with reversed orderings (PLANS.md round 13): explicit GC per
  // release is a ~25% TOTAL regression (61.8s vs 47.2s on the shared
  // set, order-independent) and a 20s-throttled GC a ~6% one. The
  // hypothesis that ContextCleaner starvation caused the in-catalog
  // churn was WRONG: the dominant accumulation was codegen-cache
  // thrash (see Sessions.graftDefaults), and the explicit full GC
  // actively hurts by unloading freshly JIT-compiled generated classes
  // between passes. The machinery stays for embedders whose workloads
  // differ (e.g. genuinely broadcast-heavy long sessions).
  private val gcMode: String =
    sys.env.getOrElse("SPARK_GRAFT_RELEASE_GC", "off")
  @volatile private var lastGcNanos: Long = 0L

  /** Throttled explicit driver GC so the ContextCleaner can reclaim
    * broadcast blocks and shuffle files during a long single-JVM catalog
    * pass (see [[release]]). Off / every-release / at-most-every-N-s. */
  private def maybeGc(): Unit = gcMode match {
    case "off"  => ()
    case "each" => System.gc()
    case secs =>
      // an unrecognized value must NOT silently enable the measured-
      // regression behavior: anything non-numeric degrades to off
      secs.toLongOption match {
        case Some(n) if n > 0 =>
          val now = System.nanoTime()
          if (now - lastGcNanos > n * 1000000000L) {
            lastGcNanos = now
            System.gc()
          }
        case _ => ()
      }
  }
}
