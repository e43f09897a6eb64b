package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the training-data pipeline ops.
  *
  * All of these are compositions of built-in codegen'd functions — no
  * UDFs — so they stay inside whole-stage codegen and scale linearly with
  * executor count. Each has an exact DuckDB-SQL mirror used by the
  * correctness oracles (see operators.TextDedup).
  */
object TextFunctions {

  /** Whitespace-collapsed, trimmed, lower-cased text. */
  def normText(c: Column): Column =
    lower(trim(regexp_replace(c, "\\s+", " ")))

  /** Whitespace tokens of the normalized text, empty strings dropped.
    * Mirror: `list_filter(string_split_regex(lower(trim(x)), '\s+'), t -> t <> '')`.
    * Implemented by the native one-pass [[TokenArray]] kernel (byte-equal
    * to the HOF chain — pinned in TextExpressionsSpec — with the split
    * pattern precompiled instead of recompiled per row, which the
    * built-in `split` cannot avoid). */
  def tokens(c: Column): Column =
    org.apache.spark.sql.GraftColumns.column(
      TokenArray(org.apache.spark.sql.GraftColumns.expression(c)))

  /** The composable reference form of [[tokens]], kept for the
    * bit-compatibility cross-check. */
  private[graft] def tokensHof(c: Column): Column =
    filter(split(lower(trim(c)), "\\s+"), t => t =!= "")

  /** Deterministic document fingerprint: md5 of the normalized text.
    * md5 is identical in Spark and DuckDB, so fingerprints are portable
    * across engines (and stable across cluster sizes — pure per-row). */
  def fingerprint(c: Column): Column = md5(normText(c))

  /** Contiguous n-token shingles (n=3) of the token array, deduplicated.
    * Documents with fewer than n tokens yield an empty array. */
  def shingles3(toks: Column): Column =
    when(size(toks) >= 3,
      array_distinct(transform(sequence(lit(0), size(toks) - 3),
        i => concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2), element_at(toks, i + 3)))))
      .otherwise(array().cast("array<string>"))

  /** struct(n_tokens, quality, pred_lang) via the fused native
    * [[TextStats]] kernel — one token pass for all three statistics,
    * bit-identical to [[qualityScore]]/[[langId]] over [[tokens]]
    * (pinned in TextExpressionsSpec). */
  def textStats(c: Column): Column =
    org.apache.spark.sql.GraftColumns.column(
      TextStats(org.apache.spark.sql.GraftColumns.expression(c)))

  val EnStop = Seq("the", "a", "of", "and", "is")
  val DeStop = Seq("der", "die", "das", "und", "ist")
  val FrStop = Seq("le", "la", "les", "et", "est")
  val EsStop = Seq("el", "los", "las", "y", "es")

  private def markerCount(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isin(markers.map(m => lit(m)): _*)))

  /** Language-ID by stopword-marker scoring with a CJK fast path.
    * Deterministic tie-break: fixed en > de > fr > es precedence. */
  def langId(text: Column, toks: Column): Column = {
    val sEn = markerCount(toks, EnStop)
    val sDe = markerCount(toks, DeStop)
    val sFr = markerCount(toks, FrStop)
    val sEs = markerCount(toks, EsStop)
    val m = greatest(sEn, sDe, sFr, sEs)
    when(text.rlike("[\\x{4e00}-\\x{9fff}]"), lit("zh"))
      .when(m === 0, lit("unknown"))
      .when(sEn === m, lit("en"))
      .when(sDe === m, lit("de"))
      .when(sFr === m, lit("fr"))
      .otherwise(lit("es"))
  }

  /** Heuristic quality score in [0,1]: token volume, vocabulary diversity,
    * stopword balance, mean token length. Pure per-row double arithmetic —
    * identical in any engine, any cluster size. */
  def qualityScore(toks: Column): Column = {
    val n = size(toks)
    val distinctRatio = size(array_distinct(toks)).cast("double") / n
    val stopRatio = markerCount(toks, EnStop).cast("double") / n
    val avgLen = aggregate(toks, lit(0), (acc, t) => acc + length(t)).cast("double") / n
    // zero-token guard: under Spark's default ANSI mode x/0 THROWS (and
    // DuckDB would yield NULL — diverging either way). Empty docs score 0.
    when(n === 0, lit(0.0)).otherwise(
      lit(0.3) * least(n.cast("double") / 50.0, lit(1.0)) +
        lit(0.3) * distinctRatio +
        lit(0.2) * (lit(1.0) - stopRatio) +
        lit(0.2) * least(avgLen / 5.0, lit(1.0)))
  }
}
