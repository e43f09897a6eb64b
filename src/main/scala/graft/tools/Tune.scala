package graft.tools

import graft.{Lifecycle, Tables}
import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only A/B harness for plan variants, timed the way Bench times
  * (min of two cold runs, Lifecycle.release outside the clock). */
object Tune {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timeMin(name: String)(f: => DataFrame): Unit = {
      def once: Double = {
        val t0 = System.nanoTime()
        val n = f.count()
        val dt = (System.nanoTime() - t0) / 1e9
        Lifecycle.release(spark)
        if (n < 0) -1 else dt
      }
      once // warmup
      val dt = math.min(once, once)
      println(f"TUNE $name%-28s $dt%7.3fs")
    }

    // ------------------------------------------------ t06 variants
    import graft.operators.TextDedup

    def t06From(sh: DataFrame): DataFrame = {
      val sz = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val a = sh.select(col("doc_id").as("doc1"), col("shingle"))
      val b = sh.select(col("doc_id").as("doc2"), col("shingle"))
      val inter = a.join(b, a("shingle") === b("shingle") && col("doc1") < col("doc2"))
        .groupBy(col("doc1"), col("doc2")).agg(count(lit(1)).as("inter"))
      inter
        .join(sz.select(col("doc_id").as("doc1"), col("n").as("n1")), "doc1")
        .join(sz.select(col("doc_id").as("doc2"), col("n").as("n2")), "doc2")
        .withColumn("jaccard", col("inter") * lit(1.0) / (col("n1") + col("n2") - col("inter")))
        .filter(col("jaccard") >= 0.6)
        .select(col("doc1"), col("doc2"), col("jaccard"))
        .orderBy(col("doc1"), col("doc2"))
    }

    timeMin("t06_current")(TextDedup.t06.fn(spark, d))
    timeMin("t06_cache_index") {
      val sh = TextDedup.shingleIndex(spark, d).cache()
      Lifecycle.defer(sh.unpersist())
      t06From(sh)
    }
    timeMin("t06_checkpoint_index") {
      t06From(TextDedup.shingleIndex(spark, d).localCheckpoint())
    }

    timeMin("t06_inline_n") {
      // single-pass: per-doc distinct-shingle count attached BEFORE the
      // explode (costs a 2nd shingles3 eval per row; saves the whole
      // sz recompute pipeline). Join carries n1/n2 through.
      val sh = Tables.documents(spark, d)
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .repartition(spark.sparkContext.defaultParallelism)
        .filter(size(col("toks")) >= 3)
        .select(col("doc_id"), shingles3(col("toks")).as("sh"))
        .select(col("doc_id"), size(col("sh")).as("n"),
          explode(col("sh")).as("shingle"))
      val a = sh.select(col("doc_id").as("doc1"), col("n").as("n1"), col("shingle"))
      val b = sh.select(col("doc_id").as("doc2"), col("n").as("n2"), col("shingle"))
      a.join(b, a("shingle") === b("shingle") && col("doc1") < col("doc2"))
        .groupBy(col("doc1"), col("doc2"))
        .agg(count(lit(1)).as("inter"), min(col("n1")).as("n1"), min(col("n2")).as("n2"))
        .withColumn("jaccard", col("inter") * lit(1.0) / (col("n1") + col("n2") - col("inter")))
        .filter(col("jaccard") >= 0.6)
        .select(col("doc1"), col("doc2"), col("jaccard"))
        .orderBy(col("doc1"), col("doc2"))
    }

    timeMin("t06_single_pass_n") {
      graft.functions.TextExpressions.register(spark)
      val sh = Tables.documents(spark, d)
        .repartition(spark.sparkContext.defaultParallelism)
        .select(col("doc_id"),
          explode(call_function("graft_shingles_n", col("text"))).as("sh"))
        .select(col("doc_id"), col("sh.shingle").as("shingle"), col("sh.n").as("n"))
      val a = sh.select(col("doc_id").as("doc1"), col("n").as("n1"), col("shingle"))
      val b = sh.select(col("doc_id").as("doc2"), col("n").as("n2"), col("shingle"))
      a.join(b, a("shingle") === b("shingle") && col("doc1") < col("doc2"))
        .groupBy(col("doc1"), col("doc2"))
        .agg(count(lit(1)).as("inter"), min(col("n1")).as("n1"), min(col("n2")).as("n2"))
        .withColumn("jaccard", col("inter") * lit(1.0) / (col("n1") + col("n2") - col("inter")))
        .filter(col("jaccard") >= 0.6)
        .select(col("doc1"), col("doc2"), col("jaccard"))
        .orderBy(col("doc1"), col("doc2"))
    }

    timeMin("t06_native_shingles") {
      graft.functions.TextExpressions.register(spark)
      val sh = Tables.documents(spark, d)
        .repartition(spark.sparkContext.defaultParallelism)
        .select(col("doc_id"),
          explode(call_function("graft_shingles", col("text"))).as("shingle"))
      t06From(sh)
    }

    // ------------------------------------------------ v01 variants
    timeMin("v01_current")(graft.operators.Advanced.v01.fn(spark, d))
    timeMin("v01_direct_explode") {
      Tables.documents(spark, d)
        .repartition(spark.sparkContext.defaultParallelism)
        .select(explode(tokens(col("text"))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token")).limit(20)
    }
    timeMin("v01_no_repart") {
      Tables.documents(spark, d)
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .select(explode(col("toks")).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("token")).limit(20)
    }

    // ------------------------------------------------ q22 variants
    timeMin("q22_current")(graft.operators.Relational.q22.fn(spark, d))
    timeMin("q22_single_join") {
      val c = Tables.customer(spark, d)
      val ok = Tables.orders(spark, d).select(col("o_custkey")).distinct()
      c.join(ok, c("c_custkey") === ok("o_custkey"), "left")
        .select(col("c_custkey"), col("o_custkey").isNotNull.as("has_orders"))
        .orderBy(col("c_custkey"))
    }

    // --------------------------------- streaming state-store count (r5)
    // A stateful streaming agg creates/commits ONE state store per
    // shuffle partition per micro-batch; at drain scale the 32 stores
    // are pure overhead. Production sizes this to state volume — the
    // knob is hourlyAgg's statePartitions parameter (st02 pins 4).
    timeMin("st01_parts32")(graft.streaming.EventsStream.hourlyAgg(spark, d, statePartitions = 32))
    timeMin("st01_parts8")(graft.streaming.EventsStream.hourlyAgg(spark, d, statePartitions = 8))
    timeMin("st01_parts4")(graft.streaming.EventsStream.hourlyAgg(spark, d, statePartitions = 4))
    timeMin("st02_current")(graft.operators.SourcesStreaming.st02.fn(spark, d))

    // --------------------------------- t10 df strategies (r5)
    timeMin("t10_current")(graft.operators.Advanced.t10.fn(spark, d))
    timeMin("t10_window_df") {
      // BASELINE: the superseded r4 window-df form (production t10 now
      // materializes tf and broadcasts df) — kept so the A/B that
      // justified the change stays re-runnable
      graft.functions.TextExpressions.register(spark)
      import org.apache.spark.sql.expressions.Window
      val tf = Tables.documents(spark, d)
        .repartition(spark.sparkContext.defaultParallelism)
        .select(col("doc_id"),
          explode(call_function("graft_tokens", col("text"))).as("term"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      val n = Tables.documents(spark, d)
        .agg(count(lit(1)).cast("double").as("n"))
      val wTerm = Window.partitionBy(col("term"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("tfidf").desc, col("term"))
      tf.withColumn("df", count(lit(1)).over(wTerm))
        .crossJoin(broadcast(n))
        .withColumn("tfidf", col("tf") * (col("n") / col("df")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("term"), col("tfidf"), col("rank"))
        .orderBy(col("doc_id"), col("rank"))
    }

    // --------------------------------- s03 bucket-frame reuse (r5)
    timeMin("s03_current")(graft.operators.Similarity.s03.fn(spark, d))
    timeMin("s03_nocheckpoint") {
      // BASELINE variant: the pre-round-5 s03 WITHOUT the shared-frame
      // materialization (production s03 now localCheckpoints), kept so
      // the A/B that justified the change stays re-runnable
      graft.functions.VectorExpressions.register(spark)
      import org.apache.spark.sql.expressions.Window
      def dt(a: Column, b: Column) = call_function("graft_dot", a, b)
      val pl = graft.operators.Similarity.makePlanes(8, 4, 7)
      def buckets(emb: Column) = array((0 until 8).map { t =>
        (0 until 4).map { j =>
          val p = array(pl(t * 4 + j).map(lit(_)): _*)
          when(dt(emb, p) > 0, lit(1 << j)).otherwise(lit(0))
        }.reduce(_ + _)
      }: _*)
      val e = Tables.embeddings(spark, d)
        .repartition(spark.sparkContext.defaultParallelism)
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("embedding"))
        .select(col("vec_id"), col("embedding"),
          sqrt(dt(col("embedding"), col("embedding"))).as("nrm"))
        .select(col("vec_id"), col("embedding"), col("nrm"),
          posexplode(buckets(col("embedding"))).as(Seq("tbl", "bucket")))
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
          col("nrm").as("qn"), col("tbl").as("qt"), col("bucket").as("qb"))
      val c = e.select(col("vec_id").as("neighbor_id"), col("embedding").as("ne"),
        col("nrm").as("nn"), col("tbl"), col("bucket"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("neighbor_id"))
      q.join(c, col("qt") === col("tbl") && col("qb") === col("bucket") &&
          col("query_id") =!= col("neighbor_id"))
        .select(col("query_id"), col("neighbor_id"),
          when(col("qn") === 0.0 || col("nn") === 0.0, lit(null))
            .otherwise(dt(col("qe"), col("ne")) / (col("qn") * col("nn"))).as("cos"))
        .distinct()
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .orderBy(col("query_id"), col("rank"))
    }
    timeMin("t11_current")(graft.operators.Corpus.t11.fn(spark, d))
    timeMin("t06_edges_only")(graft.operators.TextDedup.t06.fn(spark, d))
    timeMin("t07_edges_only")(graft.operators.TextDedup.t07.fn(spark, d))

    // --------------------------------- t09 dedup-before-verify (r5)
    // Current shape computes the exact cosine per TABLE-HIT (~8x per
    // pair at T=32/P=2) because the hit rows already carry the vectors.
    // Alternative: narrow (id1, id2) candidates -> distinct -> fetch
    // vectors from a localCheckpointed ~1MB frame via BROADCAST joins
    // (no re-scan, no shuffle), one dot per unique pair.
    timeMin("t09_current")(graft.operators.Advanced.t09.fn(spark, d))
    timeMin("t09_bcast_verify") {
      graft.functions.VectorExpressions.register(spark)
      def dt(a: Column, b: Column) = call_function("graft_dot", a, b)
      val e = Tables.embeddings(spark, d)
        .repartition(spark.sparkContext.defaultParallelism)
        .select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("embedding"))
        .select(col("vec_id"), col("embedding"),
          sqrt(dt(col("embedding"), col("embedding"))).as("nrm"))
        .localCheckpoint()
      val pl = graft.operators.Similarity.makePlanes(32, 2, 11)
      def buckets(emb: Column) = array((0 until 32).map { t =>
        (0 until 2).map { j =>
          val p = array(pl(t * 2 + j).map(lit(_)): _*)
          when(dt(emb, p) > 0, lit(1 << j)).otherwise(lit(0))
        }.reduce(_ + _)
      }: _*)
      val eb = e.select(col("vec_id"),
        posexplode(buckets(col("embedding"))).as(Seq("tbl", "bucket")))
      val a = eb.select(col("vec_id").as("id1"), col("tbl"), col("bucket"))
      val b = eb.select(col("vec_id").as("id2"), col("tbl").as("t2"), col("bucket").as("b2"))
      val cand = a.join(b, col("tbl") === col("t2") && col("bucket") === col("b2") &&
          col("id1") < col("id2"))
        .select(col("id1"), col("id2")).distinct()
      val v1 = broadcast(e.select(col("vec_id").as("id1"), col("embedding").as("e1"), col("nrm").as("n1")))
      val v2 = broadcast(e.select(col("vec_id").as("id2"), col("embedding").as("e2"), col("nrm").as("n2")))
      cand.join(v1, "id1").join(v2, "id2")
        .withColumn("cos", when(col("n1") === 0.0 || col("n2") === 0.0, lit(null))
          .otherwise(dt(col("e1"), col("e2")) / (col("n1") * col("n2"))))
        .filter(col("cos") >= 0.38)
        .groupBy(col("id2").as("vec_id")).agg(min(col("id1")).as("keep_id"))
        .orderBy(col("vec_id"))
    }
    spark.stop()
  }
}
