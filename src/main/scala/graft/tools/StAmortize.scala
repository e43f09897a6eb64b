package graft.tools

import graft.{Sessions, Tables}
import graft.streaming.{Drain, EventsStream}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.DecimalType

/** Measures the streaming amortization claim with data (round-12 slate
  * #2): the st* gate entries pay a BOUNDED-drain floor per invocation —
  * offset/WAL commit, incremental planning, state-store setup — that an
  * unbounded production stream pays once, then amortizes across every
  * subsequent micro-batch, leaving addBatch (the actual kernel) as the
  * marginal cost.
  *
  * Method: stage the sf corpus as n time-ordered parquet slices, run each
  * kernel's UNBOUNDED form as ONE streaming query consuming the slices as
  * n micro-batches (`maxFilesPerTrigger=1` + AvailableNow), and read the
  * engine's own per-batch phase breakdown off
  * `StreamingQueryProgress.durationMs`:
  *
  *   - `triggerExecution`  — wall cost of the whole micro-batch
  *   - `addBatch`          — the data kernel (scan + transform + sink +
  *                           state-store commit)
  *   - everything else     — latestOffset/getBatch (source listing),
  *                           queryPlanning (incremental planner),
  *                           walCommit/commitOffsets (offset log)
  *
  * For each kernel the tool reports batch-1 cost (plan + state-store
  * setup land here), the steady-state median over later batches, and the
  * steady-state NON-addBatch overhead — the number the claim is about.
  * Next to it, the bounded single-file drain of the same plan on the same
  * staged data, i.e. what BENCH's st* entries pay end-to-end every call.
  * Claim holds iff steady overhead (ms/batch) is a small constant
  * unrelated to the bounded drain's total.
  *
  * Kernels are the unbounded (production) forms of the seven st* gates:
  * watermarked hourly agg (st01), fingerprint dedup in Update mode
  * (st02), event-time sessionization with state timeout (st03), the
  * watermarked stream-stream join (st04), the CMS counter update (st05),
  * watermarked dedup (st06), stream-static enrichment (st07). Watermark
  * delays are widened to cover the whole staged corpus so no slice is
  * dropped as late — the cost shape, not the emission timing, is under
  * measurement.
  */
object StAmortize {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(12)
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.graftDefaults(SparkSession.builder())
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // ---- stage the corpus as n time-ordered slices + a 1-file control.
    // Sequential per-slice write jobs so file mtimes are strictly
    // increasing: the file source orders its backlog by mtime, and the
    // append-mode kernels want the watermark advancing monotonically.
    val root = {
      val shm = new java.io.File("/dev/shm")
      (if (shm.isDirectory && shm.canWrite) "/dev/shm" else
        System.getProperty("java.io.tmpdir")) +
        s"/graft-amortize-${java.util.UUID.randomUUID().toString.take(8)}"
    }
    def stageSlices(df: DataFrame, ord: Seq[String], name: String): (String, String) = {
      val sliced = df.withColumn("graft_slice",
        ntile(n).over(Window.orderBy(ord.map(col): _*)) - 1)
      val multi = s"$root/$name-n"
      (0 until n).foreach { i =>
        sliced.filter(col("graft_slice") === i).drop("graft_slice")
          .coalesce(1).write.mode("append").parquet(multi)
        Thread.sleep(5) // mtime tiebreak across jobs
      }
      val single = s"$root/$name-1"
      df.coalesce(1).write.mode("overwrite").parquet(single)
      (multi, single)
    }
    val ev = Tables.events(spark, d)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val (evN, ev1) = stageSlices(ev, Seq("ts", "event_id"), "events")
    val docs = Tables.read(spark, d, "documents")
      .select("doc_id", "text", "lang", "source", "n_chars")
    val (docN, doc1) = stageSlices(docs, Seq("doc_id"), "documents")
    val evSchema = spark.read.parquet(ev1).schema
    val docSchema = spark.read.parquet(doc1).schema

    def src(s2: SparkSession, dir: String, doc: Boolean, multi: Boolean): DataFrame = {
      val r = s2.readStream.schema(if (doc) docSchema else evSchema)
      (if (multi) r.option("maxFilesPerTrigger", 1) else r).parquet(dir)
    }

    // the kernels: each takes (child session, staged dir, multi?) and
    // returns (plan, output mode) — identical plan for the n-batch run
    // and the bounded control, only the source dir/pacing differs
    val wmAll = "3650 days" // covers the staged corpus: nothing late
    val kernels: Seq[(String, Boolean, (SparkSession, DataFrame) => DataFrame, OutputMode)] = Seq(
      ("st01_hourly_agg", false, (_, in) =>
        in.withWatermark("ts", wmAll)
          .groupBy(window(col("ts"), "1 hour"), col("event_type"))
          .agg(count(lit(1)).as("n"),
            graft.functions.Exact.exactSum(col("value")).as("sum_value")),
        OutputMode.Append),
      ("st02_dedup_update", true, (_, in) =>
        in.groupBy(graft.functions.TextFunctions.fingerprint(col("text")).as("fp"))
          .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_docs")),
        OutputMode.Update),
      ("st03_sessionize", false, (_, in) =>
        EventsStream.sessionizeUnbounded(
          in.as[EventsStream.Event], 30, wmAll).toDF(),
        OutputMode.Append),
      ("st04_ss_join", false, (_, in) =>
        EventsStream.viewClickJoin(
          in.filter(col("event_type") === "view"),
          in.filter(col("event_type") === "click")),
        OutputMode.Append),
      ("st05_cms", true, (s2, in) => {
        graft.functions.TextExpressions.register(s2)
        in.repartition(s2.sparkContext.defaultParallelism)
          .select(explode(call_function("graft_tokens", col("text"))).as("tok"))
          .select(posexplode(array((0 until graft.operators.Sketches.CmsDepth).map(i =>
            graft.operators.Sketches.cmsBucket(i, col("tok"))): _*)).as(Seq("rw", "bucket")))
          .groupBy(col("rw"), col("bucket"))
          .agg(count(lit(1)).as("c"))
      }, OutputMode.Update),
      ("st06_wm_dedup", false, (_, in) => {
        val side = in.select("event_id", "ts", "user_id", "event_type", "value")
        side.union(side).withWatermark("ts", wmAll)
          .dropDuplicatesWithinWatermark("event_id")
      }, OutputMode.Append),
      ("st07_static_join", false, (s2, in) =>
        in.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("value"))
          .join(Tables.customer(s2, d).select(col("c_custkey"), col("c_mktsegment")),
            col("user_id") === col("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value")),
        OutputMode.Complete))

    final case class Meas(batches: Int, b1TrigMs: Long, b1PlanMs: Long,
                          steadyTrigMs: Double, steadyAddMs: Double,
                          steadyOverMs: Double, steadyPlanMs: Double,
                          steadyWalMs: Double, steadySrcMs: Double,
                          rowsPerBatch: Double, wallS: Double)
    def run(name: String, doc: Boolean, multi: Boolean,
            plan: (SparkSession, DataFrame) => DataFrame, mode: OutputMode): Meas = {
      val dir = (doc, multi) match {
        case (true, true) => docN; case (true, false) => doc1
        case (false, true) => evN; case (false, false) => ev1
      }
      val t0 = System.nanoTime()
      val (q, _) = Drain.toTable(spark, s"amortize_$name",
        mode) { s2 => plan(s2, src(s2, dir, doc, multi)) }
      val wall = (System.nanoTime() - t0) / 1e9
      val prog = q.recentProgress.toSeq
      def ms(p: org.apache.spark.sql.streaming.StreamingQueryProgress, k: String): Long =
        Option(p.durationMs.get(k)).map(_.toLong).getOrElse(0L)
      val fed = prog.filter(_.numInputRows > 0)
      val first = fed.headOption.map(ms(_, "triggerExecution")).getOrElse(0L)
      val firstPlan = fed.headOption.map(ms(_, "queryPlanning")).getOrElse(0L)
      def median(xs: Seq[Double]): Double =
        if (xs.isEmpty) 0.0
        else { val s = xs.sorted; s(s.size / 2) }
      // steady state: skip the first two fed batches (planning + JIT of
      // the generated code both land there)
      val steady = fed.drop(2)
      def med(k: String): Double = median(steady.map(ms(_, k).toDouble))
      val over = median(steady.map(p =>
        (ms(p, "triggerExecution") - ms(p, "addBatch")).toDouble))
      val rows = if (fed.isEmpty) 0.0 else fed.map(_.numInputRows).sum.toDouble / fed.size
      graft.Lifecycle.release(spark)
      Meas(fed.size, first, firstPlan, med("triggerExecution"), med("addBatch"),
        over, med("queryPlanning"),
        med("walCommit") + med("commitOffsets"),
        med("latestOffset") + med("getBatch"), rows, wall)
    }

    // finally: the staged corpus lives in RAM (/dev/shm) — a kernel
    // failure must not leave hundreds of MB resident until reboot
    try {
      println(f"%n| kernel | bounded drain (gate cost) | n | batch1 trig/plan ms | steady trig | steady addBatch | steady non-addBatch (plan / wal / source) |")
      println("|---|---|---|---|---|---|---|")
      kernels.foreach { case (name, doc, plan, mode) =>
        // warmup: one bounded drain compiles the plan's codegen
        run(name, doc, multi = false, plan, mode)
        val bounded = run(name, doc, multi = false, plan, mode)
        val multi = run(name, doc, multi = true, plan, mode)
        println(f"| $name | ${bounded.wallS}%.2fs (trig ${bounded.b1TrigMs}ms) " +
          f"| ${multi.batches} | ${multi.b1TrigMs}/${multi.b1PlanMs} " +
          f"| ${multi.steadyTrigMs}%.0f | ${multi.steadyAddMs}%.0f " +
          f"| ${multi.steadyOverMs}%.0f (${multi.steadyPlanMs}%.0f / ${multi.steadyWalMs}%.0f / ${multi.steadySrcMs}%.0f) |")
      }
    } finally graft.Lifecycle.deleteRecursively(new java.io.File(root))
    spark.stop()
  }
}
