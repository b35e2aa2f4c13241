package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary learning + tokenization at corpus scale
  * (Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
  * Subword Units") — the real version of the "BPE-ish regex" token
  * counting in [[TextOps.subwordCount]].
  *
  * 100 TB shape: pair statistics aggregate over the DISTINCT-WORD table
  * weighted by word frequency — one corpus-wide shuffle up front, then
  * every merge round runs on the vocabulary, which is orders of magnitude
  * smaller than the text (`trainFraction` bounds the initial scan for
  * open vocabularies). One Spark job per round: the weighted pair argmax
  * (deterministic (weight desc, pair asc) tie-break) with the vocab
  * localCheckpointed between rounds, the same loop discipline as
  * [[DedupOps.clusters]].
  */
object BpeOps {

  /** One merge applied left-to-right, non-overlapping — written as the
    * exact fold the DuckDB oracle replays (`reduce` with a list
    * accumulator): a fresh merge becomes the accumulator tail, so it can
    * never chain into the pair that produced it. */
  def applyMerge(toks: Seq[String], l: String, r: String): Seq[String] =
    toks.foldLeft(Vector.empty[String]) { (acc, t) =>
      if (acc.nonEmpty && acc.last == l && t == r) acc.init :+ (l + r)
      else acc :+ t
    }

  /** Learn `numMerges` merges from whitespace-pretokenized text. Words
    * start as single characters (no end-of-word marker: merges cannot
    * cross word boundaries by construction, and the marker-free form is
    * what the oracle replays). Stops early when the best pair's weight
    * falls under `minCount`. */
  def train(df: DataFrame, textCol: String, numMerges: Int,
      minCount: Long = 2L, trainFraction: Double = 1.0): Seq[(String, String)] = {
    val spark = df.sparkSession
    import spark.implicits._
    val base =
      if (trainFraction < 1.0) df.sample(withReplacement = false, trainFraction, seed = 42)
      else df
    var words: Dataset[(Seq[String], Long)] = base
      .select(explode(split(col(textCol), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .as[(String, Long)]
      .map { case (w, c) => (w.map(_.toString): Seq[String], c) }
    val merges = Seq.newBuilder[(String, String)]
    var round = 0
    var done = false
    var prevMat: Dataset[(Seq[String], Long)] = null
    while (!done && round < numMerges) {
      // ONE job per round (r16): persist + let the argmax job materialize
      // the round's vocab as a side effect — the old eager localCheckpoint
      // spent a whole extra job per round materializing first. Lineage
      // grows one map() per round over a cached relation (linear analysis
      // cost), so every 8th round still checkpoints to truncate it — at a
      // production 32k-merge vocabulary the plan stays bounded instead of
      // accreting 32k map nodes.
      val mat =
        if (round % 8 == 7) words.localCheckpoint()
        else words.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      words = mat
      val top = words.flatMap { case (toks, c) =>
        toks.zip(toks.drop(1)).map { case (a, b) => (a, b, c) }
      }.toDF("l", "r", "c").groupBy("l", "r").agg(sum("c").as("wt"))
        .orderBy(col("wt").desc, col("l"), col("r")).limit(1)
        .as[(String, String, Long)].collect() // materializes `mat`
      if (prevMat ne null) prevMat.unpersist()
      prevMat = mat
      top match {
        case Array((l, r, wt)) if wt >= minCount =>
          merges += ((l, r))
          words = words.map { case (toks, c) => (applyMerge(toks, l, r), c) }
        case _ => done = true
      }
      round += 1
    }
    if (prevMat ne null) prevMat.unpersist()
    merges.result()
  }

  /** Tokenize by greedy lowest-rank merging against a broadcast
    * `(l, r) -> rank` map. Equivalent to sequential rank-order replay
    * ([[replayEncodeWord]]) PROVIDED the merge list came from [[train]]:
    * a pair involving a token built at training round k cannot have been
    * learnable before round k, so every rule touching that token has a
    * higher rank — merging the lowest rank present never creates a
    * lower-rank pair, and greedy is exactly the replay with absent ranks
    * skipped (BpeSpec pins the equivalence on trained merges). Cost is
    * O(|word|²) worst-case per word and INDEPENDENT of |merges| — the
    * fold-replay form is O(|merges|·|word|), which at a production 32k
    * vocab multiplies tokenization ~1000×. The rank map is a real
    * `sparkContext.broadcast` (32k entries ride to each executor once,
    * not per task). */
  def encode(df: DataFrame, textCol: String, merges: Seq[(String, String)],
      as: String = "bpe"): DataFrame = {
    val bRank = df.sparkSession.sparkContext.broadcast(merges.zipWithIndex.toMap)
    val enc = udf { (text: String) =>
      if (text == null) null
      else {
        val rank = bRank.value
        text.split("\\s+").iterator.filter(_.nonEmpty)
          .flatMap(greedyEncodeWord(_, rank)).toSeq
      }
    }
    df.withColumn(as, enc(col(textCol)))
  }

  /** Greedy lowest-rank encoder for one pretokenized word. */
  def greedyEncodeWord(w: String, rank: Map[(String, String), Int]): Seq[String] = {
    var toks: Vector[String] = w.map(_.toString).toVector
    var go = toks.length > 1
    while (go) {
      var best = Int.MaxValue
      var bi = -1
      var i = 0
      while (i < toks.length - 1) {
        val rk = rank.getOrElse((toks(i), toks(i + 1)), Int.MaxValue)
        if (rk < best) { best = rk; bi = i }
        i += 1
      }
      if (bi < 0) go = false
      else {
        toks = applyMerge(toks, toks(bi), toks(bi + 1)).toVector
        go = toks.length > 1
      }
    }
    toks
  }

  /** Sequential rank-order replay — the form the DuckDB oracle mirrors and
    * the spec's equivalence reference; NOT the production path (cost scales
    * with |merges|). */
  def replayEncodeWord(w: String, merges: Seq[(String, String)]): Seq[String] =
    merges.foldLeft(w.map(_.toString): Seq[String]) {
      case (t, (l, r)) => applyMerge(t, l, r)
    }

  /** WordPiece vocabulary (Wu et al. 2016 / BERT's tokenizer family —
    * the greedy longest-match counterpart of BPE's merge replay): the
    * `topWords` most frequent whitespace words as word-initial pieces
    * (ties broken by word asc, words already carrying the "##"
    * continuation marker excluded to keep the piece space unambiguous),
    * plus `extraPieces` (e.g. BPE-learned merge tokens — the vocab BERT
    * actually ships was learned by a trainer and then greedy-matched) in
    * both initial and "##" continuation form, plus single ALPHABETIC
    * characters in both forms. With `fullCharCoverage` the characters
    * come from the whole corpus (only non-alphabetic characters can
    * `[UNK]`); without it they come from the top words alone — a CLOSED
    * vocabulary where any word using an unseen character falls through
    * to `[UNK]`, BERT's whole-word failure rule.
    *
    * Scale: the distinct-word table is corpus-derived (GBs at web
    * scale) but the top-k is a `TakeOrdered` (no full sort) and the
    * character set is alphabet-sized; the vocab that leaves the driver
    * is `topWords + |extraPieces| + 2·|alphabet|` strings. */
  def wordpieceVocab(df: DataFrame, textCol: String, topWords: Int,
      extraPieces: Seq[String] = Nil,
      fullCharCoverage: Boolean = true): Seq[String] = {
    val spark = df.sparkSession
    import spark.implicits._
    val words = df
      .select(explode(split(col(textCol), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    val top = words.filter(!col("w").startsWith("##"))
      .orderBy(col("cnt").desc, col("w")).limit(topWords)
      .select("w").as[String].collect().toSeq
    val chars =
      if (fullCharCoverage)
        words.select(explode(split(col("w"), "")).as("c"))
          .filter(col("c").rlike("^[A-Za-z]$"))
          .distinct().orderBy("c").as[String].collect().toSeq
      else top.flatMap(_.toSeq)
        .filter(c => (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z'))
        .distinct.sorted.map(_.toString)
    (top ++ extraPieces.flatMap(p => Seq(p, "##" + p)) ++
      chars ++ chars.map("##" + _)).distinct
  }

  /** Tokenize with greedy longest-match-first against a broadcast piece
    * set: at each position take the LONGEST vocab piece (continuation
    * positions match with the "##" prefix); if no piece matches, the
    * ENTIRE word becomes `unk` (BERT's whole-word failure rule, not a
    * per-char fallback). Cost per word is O(|word|·maxPieceLen) hash
    * probes — flat in vocab size, the same scale property as [[encode]];
    * the vocab rides to executors once via a real broadcast. */
  def wordpieceEncode(df: DataFrame, textCol: String, vocab: Seq[String],
      as: String = "wp", unk: String = "[UNK]"): DataFrame = {
    require(vocab.nonEmpty, "wordpiece vocab must not be empty")
    // cap candidate lengths at the RAW max piece length: a position-0
    // candidate is the raw substring, so a literal "##"-initial word can
    // match a continuation-form string at its full length (the SQL walk
    // enumerates every length; a too-short cap would silently UNK it)
    val maxLen = vocab.map(_.length).max
    val bV = df.sparkSession.sparkContext.broadcast(vocab.toSet)
    val enc = udf { (text: String) =>
      if (text == null) null
      else text.split("\\s+").iterator.filter(_.nonEmpty)
        .flatMap(wordpieceWord(_, bV.value, maxLen, unk)).toSeq
    }
    df.withColumn(as, enc(col(textCol)))
  }

  /** Greedy longest-match segmentation of one word; `Seq(unk)` when any
    * position has no matching piece. */
  def wordpieceWord(w: String, vocab: Set[String], maxPieceLen: Int,
      unk: String): Seq[String] = {
    val out = Vector.newBuilder[String]
    var pos = 0
    while (pos < w.length) {
      var len = math.min(maxPieceLen, w.length - pos)
      var found: String = null
      while (len >= 1 && (found eq null)) {
        val cand =
          (if (pos == 0) "" else "##") + w.substring(pos, pos + len)
        if (vocab(cand)) found = cand else len -= 1
      }
      if (found eq null) return Seq(unk)
      out += found
      // consumed chars: at a continuation position the piece carries the
      // synthetic "##" prefix, at position 0 it is the raw substring —
      // key off the POSITION, not a "##" prefix test, so a word that
      // literally starts with "##" advances by its full matched length
      // (the SQL oracle's position walk does the same)
      pos += (if (pos == 0) found.length else found.length - 2)
    }
    out.result()
  }
}
