package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based parity for the native text kernels on GENERATED
  * unicode input — the corpus pins (TextExpressionsSpec) only cover the
  * synthetic ASCII corpus, so the kernel/HOF bit-compatibility contract
  * is exercised here over the wider domain: combining marks, CJK,
  * non-BMP emoji, exotic-but-\s whitespace, NBSP (deliberately NOT \s —
  * it must stay inside tokens on both sides), digits, punctuation.
  * Same harness shape as tabjolt.PropertySpec: sample N inputs up
  * front, one Spark job per property. */
class KernelPropertySpec extends SparkSpec {

  private def sample[A](g: Gen[A], n: Int): Seq[A] =
    Gen.listOfN(n, g).apply(Gen.Parameters.default, Seed(4242L)).get

  /** Words over a domain chosen to stress the tokenizer: ascii, accents,
    * CJK, an emoji (non-BMP surrogate pair), NBSP glued mid-word. */
  private val word: Gen[String] = for {
    n <- Gen.chooseNum(1, 6)
    cs <- Gen.listOfN(n, Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf('é', 'ß', 'ñ', 'Č'),
      Gen.oneOf('中', '文', '語'), Gen.const(' '),
      Gen.oneOf('.', ',', '!', '-')))
  } yield cs.mkString + (if (n == 6) "😀" else "") // grin emoji

  /** Whitespace runs incl. tab/newline/CR/vertical tab/form feed —
    * all matched by java.util.regex \s. */
  private val ws: Gen[String] = for {
    n <- Gen.chooseNum(1, 3)
    cs <- Gen.listOfN(n, Gen.oneOf(' ', '\t', '\n', '\r', '\u000B', '\f'))
  } yield cs.mkString

  private val text: Gen[String] = Gen.oneOf(
    Gen.const(""),
    ws,
    for {
      k <- Gen.chooseNum(1, 12)
      words <- Gen.listOfN(k, word)
      seps <- Gen.listOfN(k + 1, ws)
    } yield (seps.head +: words.zip(seps.tail).map { case (w, s) => w + s }).mkString)

  private def df(n: Int) = {
    import spark.implicits._
    TextExpressions.register(spark)
    sample(text, n).zipWithIndex.map { case (t, i) => (i, t) }.toDF("i", "text")
  }

  test("native tokens == HOF chain on generated unicode text") {
    import TextFunctions._
    val rows = df(500)
      .select(col("i"), tokens(col("text")).as("native"), tokensHof(col("text")).as("hof"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2), s"case ${r.getInt(0)}")
    }
  }

  test("array_distinct(graft_pos_shingles) == graft_shingles (the fusion-rule equivalence)") {
    val rows = df(500)
      .selectExpr("i",
        "array_distinct(graft_pos_shingles(text)) AS fused",
        "graft_shingles(text) AS direct")
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2), s"case ${r.getInt(0)}")
    }
  }

  test("pos shingle i is exactly tokens i..i+2; count is max(n-2, 0)") {
    import TextFunctions._
    val rows = df(400)
      .select(col("i"), tokens(col("text")).as("toks"),
        call_function("graft_pos_shingles", col("text")).as("psh"))
      .collect()
    rows.foreach { r =>
      val toks = r.getSeq[String](1)
      val psh = r.getSeq[String](2)
      assert(psh.length == math.max(toks.length - 2, 0), s"case ${r.getInt(0)}")
      psh.zipWithIndex.foreach { case (sh, i) =>
        assert(sh == s"${toks(i)} ${toks(i + 1)} ${toks(i + 2)}",
          s"case ${r.getInt(0)} pos $i")
      }
    }
  }

  test("signature null contract: no shingles <=> null minhash bands and simhash") {
    val rows = df(400)
      .selectExpr("i",
        "size(graft_shingles(text)) AS nsh",
        "graft_minhash_bands(text) AS bands",
        "graft_simhash60(text) AS sim")
      .collect()
    rows.foreach { r =>
      val empty = r.getInt(1) == 0
      assert(r.isNullAt(2) == empty, s"bands case ${r.getInt(0)}")
      assert(r.isNullAt(3) == empty, s"simhash case ${r.getInt(0)}")
    }
  }

  test("textstats n_tokens == size(tokens) on generated text") {
    import TextFunctions._
    val rows = df(400)
      .select(col("i"),
        textStats(col("text")).getField("n_tokens").as("nt"),
        size(tokens(col("text"))).as("sz"))
      .collect()
    rows.foreach { r =>
      assert(r.getInt(1) == r.getInt(2), s"case ${r.getInt(0)}")
    }
  }
}
