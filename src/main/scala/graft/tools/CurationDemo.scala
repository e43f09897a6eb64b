package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Runnable end-to-end curation pipeline — the composition story: the
  * gate catalog proves each operator alone; this main chains them the
  * way a training-data deployment would, through plain DataFrames:
  *
  *   near-dup canonicalization (t23's keep mask)
  *     -> benchmark decontamination (t15's overlap flags)
  *     -> model quality cut (c02's per-source deciles)
  *     -> sequence packing over the survivors (t18's running budget)
  *     -> deterministic shard manifest (r09's hash assignment)
  *
  * Every stage consumes the previous stage's DataFrame lazily — ONE
  * Catalyst plan per printed action, no intermediate materialization
  * except the persisted pair index t23 reads (built once per corpus
  * fingerprint). Run: `sbt "runMain graft.tools.CurationDemo [sfDir]"`. */
object CurationDemo {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.Sessions.graftDefaults(SparkSession.builder())
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val total = graft.Tables.documents(spark, d).count()

    // 1. near-dup canonicalization: keep one representative per cluster
    val kept = graft.operators.Corpus.t23.fn(spark, d)
      .filter(col("keep"))
      .select(col("doc_id"))

    // 2. decontamination: drop documents sharing >=5 shingles with the
    //    benchmark slice
    val contaminated = graft.operators.TextDedup.t15.fn(spark, d)
      .select(col("doc_id")).distinct()
    val clean = kept.join(contaminated, Seq("doc_id"), "left_anti")

    // 3. model quality cut: keep the top 7 deciles of each source
    val scored = graft.operators.Advanced.c02.fn(spark, d)
      .filter(col("decile") <= 7)
      .select(col("doc_id"), col("source"))
    val curated = clean.join(scored, Seq("doc_id"))

    // 4. pack the survivors into fixed-token training sequences —
    //    packing runs OVER the curated subset (t18's core parameterized
    //    on input), not over the full corpus then filtered: sequence
    //    membership and token budgets must reflect the final corpus, or
    //    every dropped doc leaves an under-filled sequence behind
    val packed = graft.operators.Corpus.packSequences(
      graft.Tables.documents(spark, d)
        .join(curated.select(col("doc_id")), Seq("doc_id")),
      2048)

    // 5. shard manifest over the curated set (r09's hash assignment,
    //    recomputed here on the survivors)
    val manifest = packed
      .withColumn("shard",
        (conv(substring(md5(col("doc_id").cast("string").cast("binary")), 1, 15), 16, 10)
          .cast("long") % 8).cast("integer"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
        countDistinct(col("seq_id")).as("n_seqs"))
      .orderBy(col("shard"))

    val nKept = kept.count(); val nClean = clean.count()
    val nCurated = curated.count()
    println(s"CURATION total=$total kept=$nKept clean=$nClean curated=$nCurated")
    manifest.collect().foreach { r =>
      println(s"SHARD ${r.getInt(0)} docs=${r.getLong(1)} tokens=${r.getLong(2)} seqs=${r.getLong(3)}")
    }
    graft.Lifecycle.release(spark)
    spark.stop()
  }
}
