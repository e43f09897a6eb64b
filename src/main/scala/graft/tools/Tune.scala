package graft.tools

import graft.{Lifecycle, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only A/B harness for plan variants, timed the way Bench times
  * (min of two cold runs after a warmup, Lifecycle.release outside the
  * clock). Superseded rounds' experiments live in git history — each
  * round rewrites this file with the variants under decision, keeping
  * the losing production form as a re-runnable baseline. */
object Tune {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.graftDefaults(SparkSession.builder())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val only = args.headOption

    def timeMin(name: String)(f: => DataFrame): Unit = if (only.forall(name.contains)) {
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

    // --------------------------------- t10 TF-IDF plans (r8)
    timeMin("t10_current")(graft.operators.Advanced.t10.fn(spark, d))
    timeMin("t10_r5_materialize") {
      // BASELINE: the superseded r5 production plan (materialize tf via
      // localCheckpoint, aggregate df over it, broadcast back) — 8.3x
      // DuckDB in BENCH_r07; kept re-runnable for the A/B record.
      import graft.functions.TextFunctions._
      import org.apache.spark.sql.expressions.Window
      val terms = Tables.documents(spark, d)
        .select(col("doc_id"), tokens(col("text")).as("toks"))
        .repartition(spark.sparkContext.defaultParallelism)
        .select(col("doc_id"), explode(col("toks")).as("term"))
      val n = Tables.documents(spark, d)
        .agg(count(lit(1)).cast("double").as("n"))
      val tf = terms.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
        .localCheckpoint()
      val dfc = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("tfidf").desc, col("term"))
      tf.join(broadcast(dfc), "term")
        .crossJoin(broadcast(n))
        .withColumn("tfidf", col("tf") * (col("n") / col("df")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("term"), col("tfidf"), col("rank"))
        .orderBy(col("doc_id"), col("rank"))
    }
    timeMin("t10_groupby_window") {
      // middle variant: window df (like current) but TF via explode +
      // groupBy(doc, term) instead of the per-row kernel — isolates how
      // much of the win is the kernel vs dropping the checkpoint.
      graft.functions.TextExpressions.register(spark)
      import org.apache.spark.sql.expressions.Window
      val tf = Tables.documents(spark, d)
        .repartition(spark.sparkContext.defaultParallelism)
        .select(col("doc_id"),
          explode(call_function("graft_tokens", col("text"))).as("term"))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      val n = Tables.documents(spark, d)
        .agg(count(lit(1)).cast("double").as("n"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("tfidf").desc, col("term"))
      tf.withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
        .crossJoin(broadcast(n))
        .withColumn("tfidf", col("tf") * (col("n") / col("df")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("term"), col("tfidf"), col("rank"))
        .orderBy(col("doc_id"), col("rank"))
    }

    timeMin("t10_bcast_df_nockpt") {
      // window-free df: recompute the cheap kernel subtree for the df
      // aggregate (map-side combined to vocab size, broadcast back) —
      // the tf probe side then never exchanges on term at all.
      graft.functions.TextExpressions.register(spark)
      import org.apache.spark.sql.expressions.Window
      def tfFrame = Tables.documents(spark, d)
        .repartition(spark.sparkContext.defaultParallelism)
        .select(col("doc_id"),
          explode(call_function("graft_term_counts", col("text"))).as("tc"))
        .select(col("doc_id"), col("tc.term").as("term"), col("tc.tf").as("tf"))
      val dfc = tfFrame.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val n = Tables.documents(spark, d)
        .agg(count(lit(1)).cast("double").as("n"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("tfidf").desc, col("term"))
      tfFrame.join(broadcast(dfc), "term")
        .crossJoin(broadcast(n))
        .withColumn("tfidf", col("tf") * (col("n") / col("df")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("term"), col("tfidf"), col("rank"))
        .orderBy(col("doc_id"), col("rank"))
    }

    timeMin("t10_norepart") {
      // window plan without the protective repartition: the kernel is
      // opaque (no CollapseProject hazard) and the FIRST exchange is the
      // term window, so scan parallelism only affects the explode pass.
      graft.functions.TextExpressions.register(spark)
      import org.apache.spark.sql.expressions.Window
      val tf = Tables.documents(spark, d)
        .select(col("doc_id"),
          explode(call_function("graft_term_counts", col("text"))).as("tc"))
        .select(col("doc_id"), col("tc.term").as("term"), col("tc.tf").as("tf"))
      val n = Tables.documents(spark, d)
        .agg(count(lit(1)).cast("double").as("n"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("tfidf").desc, col("term"))
      tf.withColumn("df", count(lit(1)).over(Window.partitionBy(col("term"))))
        .crossJoin(broadcast(n))
        .withColumn("tfidf", col("tf") * (col("n") / col("df")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("doc_id"), col("term"), col("tfidf"), col("rank"))
        .orderBy(col("doc_id"), col("rank"))
    }

    // --------------------------------- near-dup pair consumers (r8)
    timeMin("t07_current")(graft.operators.TextDedup.t07.fn(spark, d))
    timeMin("t11_current")(graft.operators.Corpus.t11.fn(spark, d))
    timeMin("t19_current")(graft.operators.Corpus.t19.fn(spark, d))
    timeMin("t06_current")(graft.operators.TextDedup.t06.fn(spark, d))

    // --------------------------------- t06 plan variants (r8)
    def t06Shaped(sh: DataFrame): DataFrame = {
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
    timeMin("t06_norepart") {
      graft.functions.TextExpressions.register(spark)
      t06Shaped(Tables.documents(spark, d)
        .select(col("doc_id"),
          explode(call_function("graft_shingles_n", col("text"))).as("sh"))
        .select(col("doc_id"), col("sh.shingle").as("shingle"), col("sh.n").as("n")))
    }
    timeMin("t06_slim_bcast_sz") {
      // drop the n-carry from the 1.27M-pair exchange; broadcast the
      // tiny per-doc size frame onto the aggregated pairs instead
      graft.functions.TextExpressions.register(spark)
      val sh = Tables.documents(spark, d)
        .repartition(spark.sparkContext.defaultParallelism)
        .select(col("doc_id"),
          explode(call_function("graft_shingles", col("text"))).as("shingle"))
      val sz = Tables.documents(spark, d)
        .select(col("doc_id"),
          size(call_function("graft_shingles", col("text"))).as("n"))
        .filter(col("n") > 0)
      val a = sh.select(col("doc_id").as("doc1"), col("shingle"))
      val b = sh.select(col("doc_id").as("doc2"), col("shingle"))
      a.join(b, a("shingle") === b("shingle") && col("doc1") < col("doc2"))
        .groupBy(col("doc1"), col("doc2")).agg(count(lit(1)).as("inter"))
        .join(broadcast(sz.select(col("doc_id").as("doc1"), col("n").as("n1"))), "doc1")
        .join(broadcast(sz.select(col("doc_id").as("doc2"), col("n").as("n2"))), "doc2")
        .withColumn("jaccard", col("inter") * lit(1.0) / (col("n1") + col("n2") - col("inter")))
        .filter(col("jaccard") >= 0.6)
        .select(col("doc1"), col("doc2"), col("jaccard"))
        .orderBy(col("doc1"), col("doc2"))
    }
    timeMin("t06_shj_hint") {
      graft.functions.TextExpressions.register(spark)
      val sh = Tables.documents(spark, d)
        .repartition(spark.sparkContext.defaultParallelism)
        .select(col("doc_id"),
          explode(call_function("graft_shingles_n", col("text"))).as("sh"))
        .select(col("doc_id"), col("sh.shingle").as("shingle"), col("sh.n").as("n"))
      val a = sh.select(col("doc_id").as("doc1"), col("n").as("n1"), col("shingle"))
      val b = sh.select(col("doc_id").as("doc2"), col("n").as("n2"), col("shingle")).hint("SHUFFLE_HASH")
      a.join(b, a("shingle") === b("shingle") && col("doc1") < col("doc2"))
        .groupBy(col("doc1"), col("doc2"))
        .agg(count(lit(1)).as("inter"), min(col("n1")).as("n1"), min(col("n2")).as("n2"))
        .withColumn("jaccard", col("inter") * lit(1.0) / (col("n1") + col("n2") - col("inter")))
        .filter(col("jaccard") >= 0.6)
        .select(col("doc1"), col("doc2"), col("jaccard"))
        .orderBy(col("doc1"), col("doc2"))
    }

    timeMin("t06_slim_shj") {
      graft.functions.TextExpressions.register(spark)
      val sh = Tables.documents(spark, d)
        .repartition(spark.sparkContext.defaultParallelism)
        .select(col("doc_id"),
          explode(call_function("graft_shingles", col("text"))).as("shingle"))
      val sz = Tables.documents(spark, d)
        .select(col("doc_id"),
          size(call_function("graft_shingles", col("text"))).as("n"))
        .filter(col("n") > 0)
      val a = sh.select(col("doc_id").as("doc1"), col("shingle"))
      val b = sh.select(col("doc_id").as("doc2"), col("shingle")).hint("SHUFFLE_HASH")
      a.join(b, a("shingle") === b("shingle") && col("doc1") < col("doc2"))
        .groupBy(col("doc1"), col("doc2")).agg(count(lit(1)).as("inter"))
        .join(broadcast(sz.select(col("doc_id").as("doc1"), col("n").as("n1"))), "doc1")
        .join(broadcast(sz.select(col("doc_id").as("doc2"), col("n").as("n2"))), "doc2")
        .withColumn("jaccard", col("inter") * lit(1.0) / (col("n1") + col("n2") - col("inter")))
        .filter(col("jaccard") >= 0.6)
        .select(col("doc1"), col("doc2"), col("jaccard"))
        .orderBy(col("doc1"), col("doc2"))
    }

    // --------------------------------- s03 signature index (r8)
    timeMin("s03_current")(graft.operators.Similarity.s03.fn(spark, d))
    timeMin("t09_current")(graft.operators.Advanced.t09.fn(spark, d))
    timeMin("sk01_current")(graft.operators.Sketches.sk01.fn(spark, d))
    timeMin("sk02_current")(graft.operators.Sketches.sk02.fn(spark, d))
    timeMin("sk03_current")(graft.operators.Sketches.sk03.fn(spark, d))
    timeMin("t15_current")(graft.operators.TextDedup.t15.fn(spark, d))
    timeMin("sk03_semijoins") {
      import org.apache.spark.sql.functions._
      def pos(i: Int, key: org.apache.spark.sql.Column) =
        conv(substring(md5(concat(lit(s"B$i:"), key).cast("binary")), 1, 15), 16, 10)
          .cast("long") % 65536
      val sh = graft.operators.TextDedup.shingleIndex(spark, d)
      val bench = sh.filter(col("doc_id") % 20 === 7)
        .select(col("doc_id").as("bench_id"), col("shingle")).localCheckpoint()
      val bits = bench.select(explode(array((0 until 4).map(i =>
        pos(i, col("shingle"))): _*)).as("pos")).distinct()
      var surv = sh.filter(col("doc_id") % 20 =!= 7)
      (0 until 4).foreach { i =>
        surv = surv.withColumn(s"p$i", pos(i, col("shingle")))
          .join(broadcast(bits.withColumnRenamed("pos", s"p$i")),
            Seq(s"p$i"), "left_semi")
      }
      surv.join(broadcast(bench), "shingle")
        .groupBy(col("doc_id"), col("bench_id"))
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= 5)
        .orderBy(col("doc_id"), col("bench_id"))
    }
    timeMin("sk01_vocab_weighted") {
      // counters derived from the exact vocab aggregate by linearity:
      // one kernel/scan pass feeds both the sketch and the exact side
      import org.apache.spark.sql.functions._
      graft.functions.TextExpressions.register(spark)
      def bkt(i: Int, tok: org.apache.spark.sql.Column) =
        conv(substring(md5(concat(lit(s"$i:"), tok).cast("binary")), 1, 15), 16, 10)
          .cast("long") % 1024
      val vocab = graft.Tables.documents(spark, d)
        .repartition(spark.sparkContext.defaultParallelism)
        .select(explode(call_function("graft_tokens", col("text"))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("exact_cnt"))
        .localCheckpoint()
      val counters = vocab
        .select(col("exact_cnt"),
          posexplode(array((0 until 4).map(i => bkt(i, col("tok"))): _*)).as(Seq("rw", "bucket")))
        .groupBy(col("rw"), col("bucket")).agg(sum(col("exact_cnt")).as("c"))
      val top = vocab.orderBy(col("exact_cnt").desc, col("tok")).limit(20)
      top
        .select(col("tok"), col("exact_cnt"),
          posexplode(array((0 until 4).map(i => bkt(i, col("tok"))): _*)).as(Seq("rw", "bucket")))
        .join(counters, Seq("rw", "bucket"))
        .groupBy(col("tok"), col("exact_cnt"))
        .agg(min(col("c")).as("cms_est"))
        .select(col("tok").as("token"), col("exact_cnt"), col("cms_est"))
        .orderBy(col("exact_cnt").desc, col("token"))
    }

    spark.stop()
  }
}
