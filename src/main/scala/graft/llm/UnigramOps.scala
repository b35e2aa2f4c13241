package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Unigram-language-model tokenization (Kudo 2018, the SentencePiece
  * `unigram` algorithm family) — the third tokenizer next to
  * [[BpeOps.train BPE]] and [[BpeOps.wordpieceEncode WordPiece]]. A piece
  * inventory carries log-probabilities and a word is segmented by VITERBI:
  * the piece sequence maximizing the sum of piece log-probs. Training here
  * is the closed-form first M-step of Kudo's EM — substring-occurrence
  * counts as the expected counts — which keeps the entire pipeline (piece
  * table, normalization, and the per-word DP) exactly replayable in SQL;
  * full EM iterations refine probabilities but do not change the
  * machinery.
  *
  * 100 TB shape: the piece table derives from the DISTINCT-WORD table
  * weighted by word frequency (one corpus shuffle, the [[BpeOps.train]]
  * discipline); candidate generation is O(len·maxPieceLen) per distinct
  * word. Inference broadcasts the pruned piece map and runs one codegen'd
  * scan — per-word cost O(len·maxPieceLen) hash probes, flat in both
  * corpus and vocabulary size.
  */
object UnigramOps {

  /** Piece inventory: every substring of length 1..`maxPieceLen` of the
    * corpus words, weighted by total occurrence count (each position of
    * each word occurrence counts once), pruned to weight >= `minFrac` ×
    * total word occurrences — a RELATIVE threshold, so the inventory is
    * scale-invariant (the same corpus at 10× volume keeps the same
    * pieces) — EXCEPT single characters, which are always kept so every
    * training word stays segmentable. Log-probs normalize over the
    * PRUNED table (the inventory is the model; pruned mass is simply not
    * in it). Returns `(piece, weight, logp)` sorted by (weight desc,
    * piece). */
  def train(df: DataFrame, textCol: String, maxPieceLen: Int = 4,
      minFrac: Double = 0.0): DataFrame = {
    val words = df
      .select(explode(split(col(textCol), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    val unpruned = words
      .select(explode(piecesOf(col("w"), maxPieceLen)).as("piece"),
        col("cnt"))
      .groupBy("piece").agg(sum("cnt").as("weight"))
    // the threshold needs total word occurrences — one extra tiny
    // aggregate job; skip it entirely when pruning is off (minFrac 0)
    val pieces =
      if (minFrac <= 0.0) unpruned
      else {
        val totWords = Option(words.agg(sum("cnt")).head.get(0))
          .map(_.asInstanceOf[Long]).getOrElse(0L)
        unpruned.filter(col("weight") >= lit(minFrac) * lit(totWords) ||
          length(col("piece")) === 1)
      }
    val total = pieces.agg(sum("weight").as("t"))
    pieces.crossJoin(broadcast(total))
      .select(col("piece"), col("weight"),
        log(col("weight").cast("double") / col("t")).as("logp"))
      .orderBy(col("weight").desc, col("piece"))
  }

  /** All substrings of `w` with length 1..`maxPieceLen`, one entry per
    * occurrence position (weights are occurrence counts, not distinct
    * flags). */
  private def piecesOf(w: org.apache.spark.sql.Column, maxPieceLen: Int) =
    flatten(transform(sequence(lit(1), length(w)), i =>
      transform(sequence(lit(1),
        least(lit(maxPieceLen), length(w) - i + lit(1))), l =>
        w.substr(i, l))))

  /** Viterbi-tokenize: per word the DP `best[j] = max_l best[j-l] +
    * logp(w[j-l+1..j])`, ties on the score broken toward the LONGER last
    * piece (deterministic, mirrored by the SQL replay's `ORDER BY s DESC,
    * l DESC`). A word with a character absent from the piece map cannot
    * be segmented and becomes one `[UNK]` with no score contribution.
    * Adds `<as>_n` (piece count) and `<as>_logp` (summed log-prob, word
    * folds left-to-right so the float addition order is deterministic). */
  def encode(df: DataFrame, textCol: String,
      pieces: Map[String, Double], maxPieceLen: Int,
      as: String = "um"): DataFrame = {
    val bP = df.sparkSession.sparkContext.broadcast(pieces)
    val enc = udf { (text: String) =>
      if (text == null) null
      else {
        val p = bP.value
        var n = 0
        var lp = 0.0
        var unk = 0
        text.split("\\s+").iterator.filter(_.nonEmpty).foreach { w =>
          viterbiWord(w, p, maxPieceLen) match {
            case Some((cnt, score)) => n += cnt; lp += score
            case None => n += 1; unk += 1
          }
        }
        (n, lp, unk)
      }
    }
    df.withColumn("__e", enc(col(textCol)))
      .withColumn(s"${as}_n", col("__e._1"))
      .withColumn(s"${as}_logp", col("__e._2"))
      .withColumn(s"${as}_unk", col("__e._3"))
      .drop("__e")
  }

  /** One full EM round (Kudo 2018 §3.2): E-step = forward-backward over
    * every word's segmentation lattice (expected count of each piece
    * occurrence = α(before)·p·β(after)/Z, words weighted by corpus
    * frequency), M-step = renormalize expected counts into new piece
    * probabilities. `probs` must be the probability map the piece table
    * defines (weight/total — pass the exact rationals, not exp(logp),
    * so the SQL replay computes bit-identical terms). Returns
    * `(piece, e_count, logp_new)` with both doubles rounded to 6.
    *
    * 100 TB shape: the lattice runs per DISTINCT word (the one corpus
    * shuffle already paid by [[train]]); each word costs
    * O(len·maxPieceLen) multiply-adds, and the only further shuffle is
    * the piece-keyed expected-count aggregation. The α/β recursions add
    * candidate terms in ascending piece-length order with left-assoc
    * float addition — the exact order the oracle's unrolled CTE chain
    * replays. */
  def emRound(df: DataFrame, textCol: String,
      probs: Map[String, Double], maxPieceLen: Int): DataFrame = {
    val ec = expectedCounts(df, textCol, probs, maxPieceLen)
    val tot = ec.agg(sum("ecq").as("t"))
    ec.crossJoin(broadcast(tot))
      .select(col("piece"),
        round(col("ecq").cast(DoubleType) / 1e9, 6).as("e_count"),
        round(log(col("ecq").cast(DoubleType) / col("t").cast(DoubleType)), 6)
          .as("logp_new"))
  }

  /** Decimal half-up rounding to the nearest long — the same rounding
    * Spark's own `round(x, 0)` applies (BigDecimal HALF_UP), matching
    * DuckDB round. Callers pass the already-scaled value. */
  private[llm] def q9(x: Double): Long =
    BigDecimal(x).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  /** E-step only: expected counts as exact 10⁹-scaled integers
    * `(piece, ecq)` — each per-occurrence contribution `cnt·e` is
    * quantized BEFORE the piece-keyed sum, so the aggregate is an exact
    * integer, independent of the shuffle's partial-merge order (and the
    * oracle quantizes the identical per-occurrence terms). Feed
    * `ecq / sum(ecq)` back in as the next round's probabilities. */
  def expectedCounts(df: DataFrame, textCol: String,
      probs: Map[String, Double], maxPieceLen: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bP = spark.sparkContext.broadcast(probs)
    val words = df
      .select(explode(split(col(textCol), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .as[(String, Long)]
    words.flatMap { case (w, cnt) =>
      wordExpectedCounts(w, bP.value, maxPieceLen)
        .map { case (piece, e) => (piece, q9((cnt * e) * 1e9)) }
    }.toDF("piece", "eq")
      // sum into DECIMAL(38,0): the global Σ of 10⁹-scaled terms passes
      // Long.MAX around 10⁹ corpus tokens — far below the 100 TB design
      // point (the DuckDB twin already sums BIGINT into HUGEINT)
      .groupBy("piece")
      .agg(sum(col("eq").cast(DecimalType(38, 0))).as("ecq"))
  }

  /** Corpus log-likelihood under the piece model: Σ_w cnt·ln(Z_w) over
    * segmentable words (EM's objective — [[emRound]] must never
    * decrease it). Driver-side over the collected distinct-word table;
    * a diagnostic, not a data-path operator — use
    * [[corpusLogLikelihoodDF]] for the distributed form. */
  def corpusLogLikelihood(df: DataFrame, textCol: String,
      probs: Map[String, Double], maxPieceLen: Int): Double = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(explode(split(col(textCol), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .as[(String, Long)].collect()
      .map { case (w, c) =>
        val z = wordZ(w, probs, maxPieceLen)
        if (z > 0) c * math.log(z) else 0.0
      }.sum
  }

  /** Distributed corpus log-likelihood as an exact 10⁹-scaled integer
    * `llq`: the forward lattice runs as a broadcast-map UDF over the
    * distinct-word table; each word's `cnt·ln(Z)` is quantized to a
    * scaled long before the engine-side sum, so the aggregate is
    * summation-order-free (no word list ever reaches the driver). */
  def corpusLogLikelihoodDF(df: DataFrame, textCol: String,
      probs: Map[String, Double], maxPieceLen: Int): DataFrame = {
    val bP = df.sparkSession.sparkContext.broadcast(probs)
    val z = udf((w: String) => wordZ(w, bP.value, maxPieceLen))
    df.select(explode(split(col(textCol), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(col("cnt"), z(col("w")).as("__z"))
      .agg(sum(when(col("__z") > 0.0,
        round((col("cnt") * log(col("__z"))) * 1e9, 0).cast(LongType))
        .otherwise(0L).cast(DecimalType(38, 0))).as("llq"))
  }

  /** Forward lattice total probability of one word. */
  def wordZ(w: String, probs: Map[String, Double],
      maxPieceLen: Int): Double = {
    val n = w.length
    val alpha = new Array[Double](n + 1)
    alpha(0) = 1.0
    var j = 1
    while (j <= n) {
      var acc = 0.0
      var l = 1
      while (l <= math.min(maxPieceLen, j)) {
        probs.get(w.substring(j - l, j)).foreach(p => acc += alpha(j - l) * p)
        l += 1
      }
      alpha(j) = acc
      j += 1
    }
    alpha(n)
  }

  /** Forward-backward expected piece counts for one word; empty when the
    * word has no segmentation. α/β sums add candidates in ascending
    * piece-length order (absent pieces contribute exact 0.0, matching
    * the SQL COALESCE). */
  def wordExpectedCounts(w: String, probs: Map[String, Double],
      maxPieceLen: Int): Seq[(String, Double)] = {
    val n = w.length
    val alpha = new Array[Double](n + 1)
    val beta = new Array[Double](n + 1)
    alpha(0) = 1.0
    var j = 1
    while (j <= n) {
      var acc = 0.0
      var l = 1
      while (l <= math.min(maxPieceLen, j)) {
        probs.get(w.substring(j - l, j)) match {
          case Some(p) => acc += alpha(j - l) * p
          case None =>
        }
        l += 1
      }
      alpha(j) = acc
      j += 1
    }
    val z = alpha(n)
    if (z <= 0.0) return Seq.empty
    beta(n) = 1.0
    var k = n - 1
    while (k >= 0) {
      var acc = 0.0
      var l = 1
      while (l <= math.min(maxPieceLen, n - k)) {
        probs.get(w.substring(k, k + l)) match {
          case Some(p) => acc += p * beta(k + l)
          case None =>
        }
        l += 1
      }
      beta(k) = acc
      k -= 1
    }
    val out = Seq.newBuilder[(String, Double)]
    var i = 0
    while (i < n) {
      var l = 1
      while (l <= math.min(maxPieceLen, n - i)) {
        val piece = w.substring(i, i + l)
        probs.get(piece).foreach { p =>
          out += piece -> (alpha(i) * p * beta(i + l) / z)
        }
        l += 1
      }
      i += 1
    }
    out.result()
  }

  /** The per-word DP; `None` when no segmentation exists. Score
    * comparisons use (score, lastPieceLen) lexicographic max so exact
    * ties resolve identically to the SQL replay. */
  def viterbiWord(w: String, pieces: Map[String, Double],
      maxPieceLen: Int): Option[(Int, Double)] = {
    val n = w.length
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val bl = Array.fill(n + 1)(0) // winning last-piece length at j
    val cnt = Array.fill(n + 1)(0)
    best(0) = 0.0
    var j = 1
    while (j <= n) {
      var l = 1
      while (l <= math.min(maxPieceLen, j)) {
        if (best(j - l) != Double.NegativeInfinity) {
          pieces.get(w.substring(j - l, j)) match {
            case Some(lp) =>
              val s = best(j - l) + lp
              if (s > best(j) || (s == best(j) && l > bl(j))) {
                best(j) = s; bl(j) = l; cnt(j) = cnt(j - l) + 1
              }
            case None =>
          }
        }
        l += 1
      }
      j += 1
    }
    if (best(n) == Double.NegativeInfinity) None
    else Some((cnt(n), best(n)))
  }
}
