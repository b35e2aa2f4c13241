package graft

import graft.llm.TextOps
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** The round-13 single-byte-pass scanners ([[graft.functions.LangIdExpr]],
  * [[graft.functions.GopherStatsExpr]]) must be BIT-IDENTICAL to the
  * Column-formula twins they replaced (TextOps.langIdCols /
  * gopherC4RulesCols) — those formulas are what the DuckDB oracles replay.
  * Hand-picked adversarial cases plus a ScalaCheck sweep over a charset
  * chosen to hit every branch: ASCII/unicode whitespace, the multi-byte
  * bullet/ellipsis chars, case-mapping specials (Kelvin sign K, dotted İ,
  * fullwidth letters), stopwords of several languages, sentence punctuation
  * runs, and the lorem needle in mixed case. */
class TextScanDifferentialSpec extends SparkSpec {
  import spark.implicits._

  private val adversarial: Seq[String] = Seq(
    "",
    " ",
    "\t",
    "\n\n",
    "the and of to in is that with for it",
    "der die und das ist nicht mit ein zu den",
    "le la les et de un une est que pour",
    "el la los las y de que es un para",
    "il la che di e un una per non sono",
    "THE AND OF", // ascii uppercase stopwords
    "\u212Aelvin the sign", // Kelvin K lowercases to ascii k
    "\u0130stanbul the city", // dotted capital I -> "i" + combining dot
    "ＴＨＥ ｆｕｌｌｗｉｄｔｈ", // fullwidth letters never lower to ascii
    "Lorem Ipsum dolor", "LOREM IPSUM", "lore m ipsum", "xlorem ipsumx",
    "lorem\u00A0ipsum", // NBSP is not a space
    "{ \"json\": 1 }",
    "- bullet\n * star\n \u2022 dot\n•tight\nplain",
    "   - deep indent bullet",
    "\t- tab then bullet",
    "ends with dots...\nends with uni…\ndots... \nmid ... dle\n...",
    "..", "...", "....", ".....", "......", ". . .",
    "a...b...c", "a. b! c? d",
    "!!!", "?!.",
    "one two three four\nfive six seven eight nine\n",
    " \n \n", // space-only lines are dropped, tab-only kept
    "\t\n\u000B\n\f\n\r\n", // non-space \s chars: lines kept, words none
    "word" + "x" * 200, // long token, mean word len out of range
    (1 to 60).map(i => s"tok$i").mkString(" "), // wordcount passes 50
    "### #hash# rate",
    "åéîøü das ist ein test", // multibyte letters in tokens
    "a\u2022b c…d", // bullet/ellipsis INSIDE tokens
    "e" * 3 + "\u2026", // ellipsis at end, no newline
    "tail space ... ",
    "crlf line...\r\nnext", // \r is line-ws for the $-anchor skip
    "mixed\u3000ideographic space the and of", // U+3000 is NOT \s in Java
    "the the the und und le le el el il il")

  private val charGen: Gen[Char] = Gen.frequency(
    (8, Gen.alphaNumChar),
    (3, Gen.oneOf(' ', '\t', '\n', '\u000B', '\f', '\r')),
    (2, Gen.oneOf('.', '!', '?', '-', '*', '#', '{', '}')),
    (1, Gen.oneOf('\u2022', '\u2026', '\u212A', '\u0130', 'é', 'ß', '\u3000')),
    (1, Gen.oneOf('t', 'h', 'e', 'a', 'n', 'd', 'l', 'o', 'r', 'm', 'i',
      'p', 's', 'u')))
  private val textGen: Gen[String] = for {
    n <- Gen.choose(0, 400)
    cs <- Gen.listOfN(n, charGen)
    sw <- Gen.listOf(Gen.oneOf(
      TextOps.stopwords.values.flatten.toSeq ++
        TextOps.gopherRequiredWords ++ Seq("lorem", "ipsum", "Lorem Ipsum")))
  } yield (cs.mkString + " " + sw.mkString(" ")).take(500)

  private def compareAll(texts: Seq[String]): Unit = {
    val df = texts.toDF("text")
    val got = TextOps.gopherC4Rules(df, "text")
      .withColumn("lang", TextOps.langId(col("text")))
    val want = TextOps.gopherC4RulesCols(df, "text")
      .withColumn("lang", TextOps.langIdCols(col("text")))
    val cols = got.columns.toSeq
    assert(cols.sorted == want.columns.toSeq.sorted)
    val g = got.select(cols.map(col): _*).collect()
    val w = want.select(cols.map(col): _*).collect()
    g.zip(w).zip(texts).foreach { case ((a, b), t) =>
      cols.indices.foreach { i =>
        assert(a.get(i) == b.get(i),
          s"column ${cols(i)}: scan=${a.get(i)} cols=${b.get(i)} " +
            s"for text=${t.replace("\n", "\\n").replace("\r", "\\r")}")
      }
    }
  }

  test("scan expressions match the Column formulas on adversarial cases") {
    compareAll(adversarial)
  }

  test("scan expressions match the Column formulas on random text (3 x 200)") {
    val seed0 = sys.env.getOrElse("GRAFT_FUZZ_SEED", "13").toLong
    for (s <- seed0 to seed0 + 2) {
      val rnd = new scala.util.Random(s)
      val texts = (1 to 200).map { _ =>
        textGen(Gen.Parameters.default,
          org.scalacheck.rng.Seed(rnd.nextLong())).getOrElse("")
      }
      compareAll(texts)
    }
  }

  test("langId null text matches the Column formula's fall-through") {
    val df = Seq[(Integer, String)]((1, null), (2, "the and of"))
      .toDF("id", "text")
    val got = df.select(TextOps.langId(col("text"))).collect().map(_.getString(0))
    val want = df.select(TextOps.langIdCols(col("text"))).collect().map(_.getString(0))
    assert(got.toSeq == want.toSeq && got(0) == "und")
  }

  test("scan expressions stay exact under forced codegen factory mode") {
    // r14 (verdict #6): a doGenCode static-call shim was A/B'd and LOST to
    // CodegenFallback at the sf10 funnel (BASELINE.md) — the scanners stay
    // fallback. This test pins that they remain correct (and loudly fail
    // rather than silently degrade) under CODEGEN_ONLY, and guards any
    // future doGenCode reintroduction against Janino breaks.
    val keys = Seq("spark.sql.codegen.factoryMode", "spark.sql.codegen.fallback")
    val before = keys.map(k => k -> spark.conf.getOption(k))
    spark.conf.set(keys(0), "CODEGEN_ONLY")
    spark.conf.set(keys(1), "false")
    try compareAll(adversarial)
    finally before.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
