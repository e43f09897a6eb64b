package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass kernel for the tokenize -> 3-shingle -> distinct pipeline.
  *
  * The composable form — `array_distinct(transform(sequence(...),
  * i -> concat_ws(' ', element_at(toks, i+1), ...)))` over
  * `filter(split(lower(trim(text)), '\\s+'), _ <> '')` — pays per-element
  * lambda dispatch for every shingle, re-compiles the split regex per row
  * (String.split has no non-regex fast path for `\s+`), and needs an
  * exchange between tokenize and shingle to stop CollapseProject from
  * substituting the tokenizer into every element_at (PLANS.md). This
  * kernel does trim -> lower -> split -> triples -> distinct in one call
  * with a precompiled pattern, and is opaque to the optimizer — no
  * substitution hazard, so consumers need no protective repartition.
  *
  * Bit-compatibility contract (pinned in TextFunctionsSpec): byte-equal
  * output to `shingles3(tokens(text))` — trim/lower run in UTF8String
  * domain (the same methods Spark's Lower/StringTrim call), the split is
  * `Pattern.split(s, -1)` (what UTF8String.split does via String.split),
  * triples join UTF-8 byte concatenation (= concat_ws on the re-encoded
  * tokens), distinct keeps first occurrence (= array_distinct), and a
  * null/short input yields an EMPTY array exactly like the
  * `when(size >= 3, ...).otherwise(array())` guard.
  */
object TextKernels extends Serializable {

  private val Whitespace = java.util.regex.Pattern.compile("\\s+")

  /** Non-empty whitespace tokens of trim+lower text (the `tokens` HOF
    * chain in one pass). */
  private[functions] def tokens(text: UTF8String): Array[String] = splitTokens(text)

  private def splitTokens(text: UTF8String): Array[String] = {
    val norm = text.trim().toLowerCase.toString
    val raw = Whitespace.split(norm, -1)
    // drop empties (a leading separator yields one)
    var n = 0
    var i = 0
    while (i < raw.length) { if (!raw(i).isEmpty) n += 1; i += 1 }
    if (n == raw.length) return raw
    val toks = new Array[String](n)
    i = 0; var j = 0
    while (i < raw.length) { if (!raw(i).isEmpty) { toks(j) = raw(i); j += 1 }; i += 1 }
    toks
  }

  def tokenArray(text: UTF8String): ArrayData = {
    val toks = splitTokens(text)
    val out = new Array[Any](toks.length)
    var i = 0
    while (i < toks.length) { out(i) = UTF8String.fromString(toks(i)); i += 1 }
    new GenericArrayData(out)
  }

  private[functions] def distinctShinglesOf(text: UTF8String): java.util.LinkedHashSet[String] =
    distinctShingles(text)

  private def distinctShingles(text: UTF8String): java.util.LinkedHashSet[String] = {
    val toks = splitTokens(text)
    val n = toks.length
    val seen = new java.util.LinkedHashSet[String](math.max(8, (n - 2) * 2))
    var i = 0
    while (i <= n - 3) {
      val sb = new java.lang.StringBuilder(
        toks(i).length + toks(i + 1).length + toks(i + 2).length + 2)
      sb.append(toks(i)).append(' ').append(toks(i + 1)).append(' ').append(toks(i + 2))
      seen.add(sb.toString)
      i += 1
    }
    seen
  }

  def shingleSet(text: UTF8String): ArrayData = {
    if (text == null) return new GenericArrayData(Array.empty[Any])
    val seen = distinctShingles(text)
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out)
  }

  /** ALL 3-token shingles of a document in POSITION order (no distinct):
    * element i is the shingle starting at token i, so a `posexplode`
    * recovers (position, shingle) pairs — the input the verbatim-span
    * detector (t32) needs, which the set-valued [[shingleSet]] erases.
    * Same tokenizer/concat domain as [[shingleSet]]; null or short input
    * yields an empty array. */
  def posShingles(text: UTF8String): ArrayData = {
    if (text == null) return new GenericArrayData(Array.empty[Any])
    val toks = splitTokens(text)
    val n = math.max(toks.length - 2, 0)
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      val sb = new java.lang.StringBuilder(
        toks(i).length + toks(i + 1).length + toks(i + 2).length + 2)
      sb.append(toks(i)).append(' ').append(toks(i + 1)).append(' ').append(toks(i + 2))
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** array<struct<term, tf>> — the doc's DISTINCT terms with their
    * within-doc occurrence counts, in first-occurrence order. Replaces
    * t10's explode + groupBy(doc_id, term) count: term frequency is a
    * pure per-document function, so computing it in the row kernel
    * removes the (doc_id, term) aggregate exchange entirely — the
    * explode then emits one row per DISTINCT (doc, term) directly. tf is
    * Long to match the COUNT(*) it replaces. Null text -> empty array
    * (the null token array was dropped by the explode it replaces). */
  def termCounts(text: UTF8String): ArrayData = {
    if (text == null) return new GenericArrayData(Array.empty[Any])
    val toks = splitTokens(text)
    val m = new java.util.LinkedHashMap[String, java.lang.Long](math.max(8, toks.length * 2))
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      val prev = m.get(t)
      m.put(t, if (prev == null) 1L else prev.longValue() + 1L)
      i += 1
    }
    val out = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](UTF8String.fromString(e.getKey), e.getValue.longValue()))
      j += 1
    }
    new GenericArrayData(out)
  }

  /** array<struct<shingle, n>> where n = the doc's DISTINCT shingle
    * count stamped on every element. The count rides the GENERATOR
    * OUTPUT through an explode — unlike a computed column projected
    * across a Generate, which Spark re-evaluates per generated row
    * (measured 19-22s on t06; PLANS.md). */
  def shingleSetWithCount(text: UTF8String): ArrayData = {
    if (text == null) return new GenericArrayData(Array.empty[Any])
    val seen = distinctShingles(text)
    val n = seen.size
    val out = new Array[Any](n)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) {
      out(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](UTF8String.fromString(it.next()), n))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Per-document signature kernels: MinHash band hashes and the 60-bit
  * SimHash, each a pure function of the text — so signatures need NO
  * explode + wide-aggregate shuffle (the 64-min / 60-vote group-bys they
  * replace). Hash parity:
  *  - MinHash uses the same `XXH64` statics Spark's `xxhash64` calls
  *    with the same seed/fold order (`hashUTF8String(shingle, 42)`;
  *    per-permutation `hashLong(h, hashInt(j, 42))` = `xxhash64(j, h)`;
  *    band `hashLong(mh1, hashLong(mh0, 42))` = `xxhash64(mh0, mh1)`),
  *    and min is the signed Long min like the `min` aggregate — pinned
  *    equal to the aggregate formulation in TextExpressionsSpec;
  *  - SimHash parses the first 15 md5 hex chars exactly like
  *    `conv(substr(md5(x),1,15),16,10)` (and the DuckDB oracle's
  *    `('0x'||substr(md5,1,15))::BIGINT`).
  * Documents with no shingles return null (they were absent from the
  * exploded index, so they must not join). */
object SignatureKernels extends Serializable {
  private val Seed = 42L
  private val NumHashes = 64
  private val BandRows = 2

  import org.apache.spark.sql.catalyst.expressions.XXH64

  def minhashBands(text: UTF8String): ArrayData = {
    if (text == null) return null
    val shingles = TextKernels.distinctShinglesOf(text)
    if (shingles.isEmpty) return null
    val permSeeds = new Array[Long](NumHashes)
    var j = 0
    while (j < NumHashes) { permSeeds(j) = XXH64.hashInt(j, Seed); j += 1 }
    val mins = Array.fill(NumHashes)(Long.MaxValue)
    val it = shingles.iterator()
    while (it.hasNext) {
      val h = XXH64.hashUTF8String(UTF8String.fromString(it.next()), Seed)
      j = 0
      while (j < NumHashes) {
        val hj = XXH64.hashLong(h, permSeeds(j))
        if (hj < mins(j)) mins(j) = hj
        j += 1
      }
    }
    val bands = new Array[Any](NumHashes / BandRows)
    var b = 0
    while (b < NumHashes / BandRows) {
      bands(b) = XXH64.hashLong(mins(2 * b + 1), XXH64.hashLong(mins(2 * b), Seed))
      b += 1
    }
    new GenericArrayData(bands)
  }

  def simhash60(text: UTF8String): Any = {
    if (text == null) return null
    val shingles = TextKernels.distinctShinglesOf(text)
    if (shingles.isEmpty) return null
    val md = java.security.MessageDigest.getInstance("MD5")
    val votes = new Array[Int](60)
    val it = shingles.iterator()
    while (it.hasNext) {
      val digest = md.digest(it.next().getBytes(java.nio.charset.StandardCharsets.UTF_8))
      md.reset()
      // first 15 hex chars = bytes 0..6 plus the high nibble of byte 7
      var h = 0L
      var i = 0
      while (i < 7) { h = (h << 8) | (digest(i) & 0xffL); i += 1 }
      h = (h << 4) | ((digest(7) & 0xf0L) >> 4)
      i = 0
      while (i < 60) { if (((h >> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1; i += 1 }
    }
    var sig = 0L
    var i = 0
    while (i < 60) { if (votes(i) > 0) sig |= (1L << i); i += 1 }
    java.lang.Long.valueOf(sig)
  }
}

/** Compatibility-exact kernel for [[TextStats]] — see the expression
  * Scaladoc for the parity contract. */
object TextStatsKernel extends Serializable {
  import TextFunctions.{EnStop, DeStop, FrStop, EsStop}

  private val En = EnStop.toSet
  private val De = DeStop.toSet
  private val Fr = FrStop.toSet
  private val Es = EsStop.toSet

  /** (n_tokens, quality, pred_lang) in one pass over the tokens.
    * Null text reproduces the HOF chain's degenerate values exactly:
    * n_tokens/quality NULL, and pred_lang "es" (every `when` condition
    * evaluates NULL, so the chain falls through to the otherwise). */
  def stats(text: UTF8String): InternalRow = {
    if (text == null)
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](null, null, UTF8String.fromString("es")))
    val toks = TextKernels.tokens(text)
    val n = toks.length
    // CJK fast path scans the ORIGINAL text, like rlike does
    val s = text.toString
    var hasCjk = false
    var ci = 0
    while (ci < s.length && !hasCjk) {
      val cp = s.codePointAt(ci)
      if (cp >= 0x4e00 && cp <= 0x9fff) hasCjk = true
      ci += Character.charCount(cp)
    }
    var nDistinct = 0
    val seen = new java.util.HashSet[String](math.max(8, n * 2))
    var nStop = 0; var sEn = 0; var sDe = 0; var sFr = 0; var sEs = 0
    var lenSum = 0
    var i = 0
    while (i < n) {
      val t = toks(i)
      if (seen.add(t)) nDistinct += 1
      if (En.contains(t)) { nStop += 1; sEn += 1 }
      if (De.contains(t)) sDe += 1
      if (Fr.contains(t)) sFr += 1
      if (Es.contains(t)) sEs += 1
      // Spark length() counts code points (UTF8String.numChars)
      lenSum += t.codePointCount(0, t.length)
      i += 1
    }
    val quality =
      if (n == 0) 0.0
      else
        0.3 * math.min(n.toDouble / 50.0, 1.0) +
          0.3 * (nDistinct.toDouble / n) +
          0.2 * (1.0 - nStop.toDouble / n) +
          0.2 * math.min(lenSum.toDouble / n / 5.0, 1.0)
    val m = math.max(math.max(sEn, sDe), math.max(sFr, sEs))
    val lang =
      if (hasCjk) "zh"
      else if (m == 0) "unknown"
      else if (sEn == m) "en"
      else if (sDe == m) "de"
      else if (sFr == m) "fr"
      else "es"
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, quality, UTF8String.fromString(lang)))
  }
}

/** `graft_shingles(text)` — the distinct 3-token shingle array of a
  * document, as a single native expression. Never null: null input maps
  * to an empty array (matching the HOF guard's behavior). */
case class ShingleSet(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_shingles"

  override def eval(input: InternalRow): Any =
    TextKernels.shingleSet(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val kernel = ctx.addReferenceObj("textKernels", TextKernels,
      TextKernels.getClass.getName)
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          $kernel.shingleSet(${c.isNull} ? null : ${c.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_pos_shingles(text)` — ALL 3-token shingles in position order
  * (element i = shingle starting at token i; no distinct), for consumers
  * that need shingle POSITIONS via `posexplode` (the verbatim-span
  * detector t32). Never null: null/short input maps to an empty array. */
case class PosShingles(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_pos_shingles"

  override def eval(input: InternalRow): Any =
    TextKernels.posShingles(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val kernel = ctx.addReferenceObj("textKernels", TextKernels,
      TextKernels.getClass.getName)
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          $kernel.posShingles(${c.isNull} ? null : ${c.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_shingles_n(text)` — [[ShingleSet]] with the per-doc distinct
  * count stamped on each element, for consumers that need |shingles(doc)|
  * AFTER an explode without a second corpus pass (t06's jaccard
  * denominator). Never null. */
case class ShingleSetWithCount(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("shingle", StringType), StructField("n", IntegerType))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_shingles_n"

  override def eval(input: InternalRow): Any =
    TextKernels.shingleSetWithCount(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val kernel = ctx.addReferenceObj("textKernels", TextKernels,
      TextKernels.getClass.getName)
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          $kernel.shingleSetWithCount(${c.isNull} ? null : ${c.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_term_counts(text)` — array<struct<term, tf>>: the document's
  * distinct terms with within-doc counts, so TF needs no (doc, term)
  * aggregate shuffle (see [[TextKernels.termCounts]]). Never null: null
  * input maps to an empty array. */
case class TermCounts(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("term", StringType), StructField("tf", LongType))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_term_counts"

  override def eval(input: InternalRow): Any =
    TextKernels.termCounts(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val kernel = ctx.addReferenceObj("textKernels", TextKernels,
      TextKernels.getClass.getName)
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          $kernel.termCounts(${c.isNull} ? null : ${c.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_tokens(text)` — the non-empty whitespace tokens of
  * trim+lower text as a single native expression. Null-intercepting like
  * the HOF chain it replaces (`filter(split(lower(trim(c)), '\\s+'),
  * _ <> '')`): null text -> null array. */
case class TokenArray(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_tokens"

  override def nullSafeEval(input: Any): Any =
    TextKernels.tokenArray(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = ctx.addReferenceObj("textKernels", TextKernels,
      TextKernels.getClass.getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $kernel.tokenArray($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_textstats(text)` — struct(n_tokens, quality, pred_lang) fused
  * into one token pass. The composable forms walk the token array once
  * per statistic through per-element lambda dispatch (qualityScore: 4
  * passes, langId: 4 marker scans + a regex); this kernel computes all
  * of them in a single loop. Double arithmetic replicates the Column
  * expression tree's operation order exactly (left-associative sums,
  * same divisions), so values are bit-identical — pinned against the HOF
  * forms on the full corpus in TextExpressionsSpec and by the unchanged
  * gate oracles. Codegen subexpression elimination evaluates the struct
  * once per row even when a projection reads several fields. */
case class TextStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType),
    StructField("quality", DoubleType),
    StructField("pred_lang", StringType)))
  override def nullable: Boolean = false
  override def prettyName: String = "graft_textstats"

  override def eval(input: InternalRow): Any =
    TextStatsKernel.stats(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val kernel = ctx.addReferenceObj("textStatsKernel", TextStatsKernel,
      TextStatsKernel.getClass.getName)
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.InternalRow ${ev.value} =
          $kernel.stats(${c.isNull} ? null : ${c.value});
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_minhash_bands(text)` — the 32 MinHash LSH band hashes of a
  * document as array<long>; null when the document has no shingles (it
  * was absent from the exploded index, so it must not band-join). */
case class MinHashBands(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_bands"

  override def eval(input: InternalRow): Any =
    SignatureKernels.minhashBands(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val kernel = ctx.addReferenceObj("sigKernels", SignatureKernels,
      SignatureKernels.getClass.getName)
    val v = ctx.freshName("bands")
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData $v =
        $kernel.minhashBands(${c.isNull} ? null : ${c.value});
      boolean ${ev.isNull} = $v == null;
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = $v;
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_simhash60(text)` — the document's 60-bit SimHash signature;
  * null when the document has no shingles. */
case class SimHash60(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash60"

  override def eval(input: InternalRow): Any =
    SignatureKernels.simhash60(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val kernel = ctx.addReferenceObj("sigKernels", SignatureKernels,
      SignatureKernels.getClass.getName)
    val v = ctx.freshName("sig")
    ev.copy(code = code"""
      ${c.code}
      java.lang.Long $v = (java.lang.Long) $kernel.simhash60(${c.isNull} ? null : ${c.value});
      boolean ${ev.isNull} = $v == null;
      long ${ev.value} = ${ev.isNull} ? -1L : $v.longValue();
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExpressions {
  val shinglesInfo = new ExpressionInfo(classOf[ShingleSet].getName, "graft_shingles")
  val tokensInfo = new ExpressionInfo(classOf[TokenArray].getName, "graft_tokens")
  val statsInfo = new ExpressionInfo(classOf[TextStats].getName, "graft_textstats")
  val shinglesNInfo = new ExpressionInfo(classOf[ShingleSetWithCount].getName, "graft_shingles_n")
  val posShinglesInfo = new ExpressionInfo(classOf[PosShingles].getName, "graft_pos_shingles")
  val termCountsInfo = new ExpressionInfo(classOf[TermCounts].getName, "graft_term_counts")
  val minhashInfo = new ExpressionInfo(classOf[MinHashBands].getName, "graft_minhash_bands")
  val simhashInfo = new ExpressionInfo(classOf[SimHash60].getName, "graft_simhash60")

  /** The full native text surface as (identifier, info, builder)
    * triples — the ONE list both [[register]] and
    * [[GraftExtensions]] consume, so a kernel added here reaches the
    * per-session registration path AND the spark.sql.extensions
    * embedding path without a second edit. */
  val registrations: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (FunctionIdentifier("graft_shingles"), shinglesInfo,
        (exprs: Seq[Expression]) => ShingleSet(exprs.head)),
      (FunctionIdentifier("graft_tokens"), tokensInfo,
        (exprs: Seq[Expression]) => TokenArray(exprs.head)),
      (FunctionIdentifier("graft_textstats"), statsInfo,
        (exprs: Seq[Expression]) => TextStats(exprs.head)),
      (FunctionIdentifier("graft_shingles_n"), shinglesNInfo,
        (exprs: Seq[Expression]) => ShingleSetWithCount(exprs.head)),
      (FunctionIdentifier("graft_pos_shingles"), posShinglesInfo,
        (exprs: Seq[Expression]) => PosShingles(exprs.head)),
      (FunctionIdentifier("graft_term_counts"), termCountsInfo,
        (exprs: Seq[Expression]) => TermCounts(exprs.head)),
      (FunctionIdentifier("graft_minhash_bands"), minhashInfo,
        (exprs: Seq[Expression]) => MinHashBands(exprs.head)),
      (FunctionIdentifier("graft_simhash60"), simhashInfo,
        (exprs: Seq[Expression]) => SimHash60(exprs.head)))

  /** Idempotently register the text kernels (same pattern as
    * [[VectorExpressions.register]]). */
  def register(spark: SparkSession): Unit =
    registrations.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
