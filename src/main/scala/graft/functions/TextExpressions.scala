package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
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

  def shingleSet(text: UTF8String): ArrayData = {
    if (text == null) return new GenericArrayData(Array.empty[Any])
    val toks = splitTokens(text)
    val n = toks.length
    if (n < 3) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](math.max(8, (n - 2) * 2))
    var i = 0
    while (i <= n - 3) {
      val sb = new java.lang.StringBuilder(
        toks(i).length + toks(i + 1).length + toks(i + 2).length + 2)
      sb.append(toks(i)).append(' ').append(toks(i + 1)).append(' ').append(toks(i + 2))
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out)
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

object TextExpressions {
  val shinglesInfo = new ExpressionInfo(classOf[ShingleSet].getName, "graft_shingles")
  val tokensInfo = new ExpressionInfo(classOf[TokenArray].getName, "graft_tokens")

  /** Idempotently register the text kernels (same pattern as
    * [[VectorExpressions.register]]). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_shingles"), shinglesInfo,
      (exprs: Seq[Expression]) => ShingleSet(exprs.head))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("graft_tokens"), tokensInfo,
      (exprs: Seq[Expression]) => TokenArray(exprs.head))
  }
}
