package graft

import graft.llm.UnigramOps
import org.apache.spark.sql.functions._

/** Unigram-LM tokenizer vs brute-force segmentation enumeration and
  * hand-checked piece tables. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  /** All segmentations of `w` into pieces from the map; returns each
    * segmentation's (count, score). */
  private def enumerate(w: String, p: Map[String, Double],
      maxL: Int): Seq[(Int, Double)] = {
    if (w.isEmpty) Seq((0, 0.0))
    else (1 to math.min(maxL, w.length)).flatMap { l =>
      p.get(w.take(l)).toSeq.flatMap { lp =>
        enumerate(w.drop(l), p, maxL).map { case (c, s) => (c + 1, lp + s) }
      }
    }
  }

  test("viterbiWord matches the brute-force optimum on every corpus word") {
    val pieces = UnigramOps.train(docs, "text", maxPieceLen = 4)
      .select("piece", "logp").as[(String, Double)].collect().toMap
    val words = docs.select("text").as[String].collect()
      .flatMap(_.split("\\s+")).filter(_.nonEmpty).distinct
    assert(words.nonEmpty)
    words.foreach { w =>
      val all = enumerate(w, pieces, 4)
      val got = UnigramOps.viterbiWord(w, pieces, 4)
      assert(all.nonEmpty == got.isDefined, s"word $w segmentability")
      got.foreach { case (cnt, score) =>
        val bestScore = all.map(_._2).max
        assert(math.abs(score - bestScore) < 1e-12, s"word $w score")
        val optCnts = all.filter(_._2 >= bestScore - 1e-12).map(_._1).toSet
        assert(optCnts.contains(cnt), s"word $w count $cnt not optimal")
      }
    }
  }

  test("train: hand-checked weights and normalization") {
    val df = Seq("ab ab b").toDF("text")
    val got = UnigramOps.train(df, "text", maxPieceLen = 4)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    // ab×2 contributes a:2 ab:2 b:2; b×1 contributes b:1 → total 7
    assert(got.keySet == Set("a", "ab", "b"))
    assert(got("a")._1 == 2L && got("ab")._1 == 2L && got("b")._1 == 3L)
    assert(math.abs(got("ab")._2 - math.log(2.0 / 7)) < 1e-15)
    // single-piece segmentation beats per-char (one ln factor vs two)
    val p = got.map { case (k, (_, lp)) => k -> lp }
    assert(UnigramOps.viterbiWord("ab", p, 4).get._1 == 1)
  }

  test("relative pruning makes the inventory scale-invariant") {
    val small = docs
    val big = small.union(small).union(small) // 3x volume
    def inv(df: org.apache.spark.sql.DataFrame) =
      UnigramOps.train(df, "text", maxPieceLen = 4, minFrac = 0.05)
        .select("piece", "logp").as[(String, Double)].collect().toMap
    val a = inv(small); val b = inv(big)
    assert(a.keySet == b.keySet, "same pieces at 3x the data")
    a.foreach { case (k, lp) =>
      assert(math.abs(lp - b(k)) < 1e-12, s"piece $k logp drifts")
    }
    assert(a.nonEmpty)
  }

  test("viterbiWord matches brute force on random words over a random inventory") {
    val rnd = new scala.util.Random(20260814L)
    val alphabet = "abcd"
    (0 until 300).foreach { i =>
      // random piece inventory: some chars missing on purpose so the
      // None path is exercised; random (distinct) log-weights
      val pieces = (for {
        l <- 1 to 3
        _ <- 1 to 4
      } yield (1 to l).map(_ => alphabet(rnd.nextInt(4))).mkString)
        .distinct.filter(_ => rnd.nextInt(3) > 0)
        .map(p => p -> -(1.0 + rnd.nextDouble() * 4)).toMap
      val w = (1 to (1 + rnd.nextInt(7)))
        .map(_ => alphabet(rnd.nextInt(4))).mkString
      val all = enumerate(w, pieces, 3)
      val got = UnigramOps.viterbiWord(w, pieces, 3)
      assert(all.nonEmpty == got.isDefined, s"#$i word $w segmentability")
      got.foreach { case (cnt, score) =>
        val bestScore = all.map(_._2).max
        assert(math.abs(score - bestScore) < 1e-12, s"#$i word $w score")
        assert(all.filter(_._2 >= bestScore - 1e-12).map(_._1)
          .contains(cnt), s"#$i word $w count")
      }
    }
  }

  test("emRound: hand-computed forward-backward expected counts") {
    // corpus "ab ab b": pieces a(2/7) ab(2/7) b(3/7)
    // word "ab": Z = p(ab) + p(a)p(b) = 2/7 + 6/49 = 20/49
    //   E[ab] = p(ab)/Z = 0.7; E[a] = E[b] = p(a)p(b)/Z = 0.3
    // word "b": E[b] = 1
    // weighted: ab: 2·0.7 = 1.4; a: 2·0.3 = 0.6; b: 2·0.3 + 1 = 1.6
    val df = Seq("ab ab b").toDF("text")
    val probs = Map("a" -> 2.0 / 7, "ab" -> 2.0 / 7, "b" -> 3.0 / 7)
    val got = UnigramOps.emRound(df, "text", probs, 4)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(got.keySet == Set("a", "ab", "b"))
    assert(math.abs(got("ab")._1 - 1.4) < 1e-9)
    assert(math.abs(got("a")._1 - 0.6) < 1e-9)
    assert(math.abs(got("b")._1 - 1.6) < 1e-9)
    // M-step renormalizes over 3.6 total expected mass
    assert(math.abs(got("b")._2 -
      math.floor(math.log(1.6 / 3.6) * 1e6) / 1e6) < 2e-6)
  }

  test("emRound: expected piece mass per word sums to expected piece count") {
    // invariant: for each word, sum over occurrences of E equals the
    // posterior-expected segmentation length (between 1 and len)
    val pieces = UnigramOps.train(docs, "text", maxPieceLen = 4)
      .select("piece", "weight").as[(String, Long)].collect()
    val tw = pieces.map(_._2).sum
    val probs = pieces.map { case (p, w) => p -> (w.toDouble / tw) }.toMap
    val words = docs.select("text").as[String].collect()
      .flatMap(_.split("\\s+")).filter(_.nonEmpty).distinct
    words.foreach { w =>
      val e = UnigramOps.wordExpectedCounts(w, probs, 4)
      val mass = e.map(_._2).sum
      assert(mass >= 1.0 - 1e-9 && mass <= w.length + 1e-9, s"word $w: $mass")
      e.foreach { case (p, v) =>
        assert(v >= -1e-15 && v <= w.length + 1e-9, s"$w/$p")
      }
    }
  }

  test("EM is likelihood-non-decreasing over three chained rounds") {
    val pw = UnigramOps.train(docs, "text", maxPieceLen = 4, minFrac = 0.05)
      .select("piece", "weight").as[(String, Long)].collect()
    val tw = pw.map(_._2).sum
    var probs = pw.map { case (p, w) => p -> (w.toDouble / tw) }.toMap
    var ll = UnigramOps.corpusLogLikelihood(docs, "text", probs, 4)
    (1 to 3).foreach { round =>
      val ec = UnigramOps.expectedCounts(docs, "text", probs, 4)
        .as[(String, java.math.BigDecimal)].collect()
        .map { case (p, e) => (p, BigInt(e.toBigInteger)) }
      val t = ec.map(_._2).sum
      probs = ec.map { case (p, e) => p -> (e.toDouble / t.toDouble) }.toMap
      val ll2 = UnigramOps.corpusLogLikelihood(docs, "text", probs, 4)
      assert(ll2 >= ll - 1e-9, s"round $round: $ll -> $ll2 decreased")
      assert(ll2 < 0.0, "log-likelihood of a proper model is negative")
      ll = ll2
    }
  }

  test("encode: unsegmentable word becomes one UNK with no score") {
    val df = Seq((1L, "ab xq"), (2L, "")).toDF("id", "text")
    val p = Map("a" -> -1.0, "b" -> -2.0, "ab" -> -2.5)
    val got = UnigramOps.encode(df, "text", p, 4)
      .select("id", "um_n", "um_logp", "um_unk")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getDouble(2), r.getInt(3)))).toMap
    // "ab" → [ab] (-2.5 beats -3.0); "xq" → UNK
    assert(got(1L) == ((2, -2.5, 1)))
    assert(got(2L) == ((0, 0.0, 0)))
  }
}
