package graft

import graft.llm.{CorpusOps, TextOps}
import graft.operators.Sessionize
import org.apache.spark.sql.functions._

class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  test("repetitionFeatures: dup-word and top-bigram counts") {
    val df = Seq((1L, "a a a b"), (2L, "x y z"), (3L, "w")).toDF("id", "text")
    val got = df.select($"id", TextOps.repetitionFeatures($"text").as("r"))
      .select($"id", $"r.n_words", $"r.n_distinct_words", $"r.n_bigrams",
        $"r.top_bigram_count")
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4)))).toMap
    // "a a a b": bigrams [a a, a a, a b] — mode "a a" runs twice
    assert(got(1L) == ((4, 2, 3, 2L)))
    assert(got(2L) == ((3, 3, 2, 1L)))
    // single word: no bigrams, fold returns 0
    assert(got(3L) == ((1, 1, 0, 0L)))
  }

  test("wordNgrams: short docs yield no grams; grams are space-joined windows") {
    val df = Seq((1L, "a b c d"), (2L, "a b")).toDF("id", "text")
    val got = df.select($"id", CorpusOps.wordNgrams($"text", 3).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(got(1L) == Seq("a b c", "b c d"))
    assert(got(2L) == Seq.empty)
  }

  test("decontaminate flags docs sharing an n-gram with the benchmark") {
    val corpus = Seq(
      (1L, "one two three four five"), // contains bench 3-gram
      (2L, "six seven eight nine ten")).toDF("doc_id", "text")
    val bench = Seq((99L, "zero two three four")).toDF("doc_id", "text")
    val got = CorpusOps.decontaminate(corpus, bench, "text", "doc_id", n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // doc 1 shares "two three four"; doc 2 shares nothing
    assert(got == Set((1L, 1L, 1), (2L, 0L, 0)))
  }

  test("decontaminate broadcasts the benchmark gram set (no corpus shuffle for the probe)") {
    val corpus = Seq((1L, "a b c d e f g h i")).toDF("doc_id", "text")
    val bench = Seq((9L, "c d e f g h i j")).toDF("doc_id", "text")
    val plan = CorpusOps.decontaminate(corpus, bench, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("decontaminate hashed-gram mode (the 100 TB payload) matches string mode") {
    val corpus = Seq(
      (1L, "one two three four five"),
      (2L, "six seven eight nine ten"),
      (3L, "zero two three four six")).toDF("doc_id", "text")
    val bench = Seq((99L, "zero two three four")).toDF("doc_id", "text")
    def res(h: Boolean) =
      CorpusOps.decontaminate(corpus, bench, "text", "doc_id", n = 3, hashGrams = h)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(res(true) == res(false))
  }

  test("tfidfTopK ranks by tf * n/df with term tie-break") {
    val corpus = Seq(
      (1L, "apple apple apple common"),
      (2L, "banana banana common common"),
      (3L, "cherry common zebra")).toDF("doc_id", "text")
    val got = CorpusOps.tfidfTopK(corpus, "text", "doc_id", k = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // doc 1: apple tf=3 df=1 score=9 > common tf=1 df=3 score=1
    assert(got(1L) == "apple,common")
    // doc 2: banana 2*3=6 > common 2*1=2
    assert(got(2L) == "banana,common")
    // doc 3: cherry 1*3=3 == zebra 1*3=3 — tie breaks on the word
    assert(got(3L) == "cherry,zebra")
  }

  test("unigramLogProb: uniform corpus scores ln(1/vocab) per token") {
    val corpus = Seq((1L, "a b"), (2L, "c d")).toDF("doc_id", "text")
    val got = CorpusOps.unigramLogProb(corpus, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    val want = BigDecimal(math.log(0.25))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == ((want, 2L)) && got(2L) == ((want, 2L)))
  }

  test("chunkWindows: overlapping token windows, short tail, empty doc") {
    val df = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 tokens
      (2L, "a b"),                                     // fits one chunk
      (3L, ""))                                        // no chunks
      .toDF("doc_id", "text")
    val got = TextOps.chunkWindows(df, "doc_id", "text",
      chunkTokens = 4, overlap = 2)
      .select("doc_id", "chunk_id", "chunk", "n_chunk_tokens")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
      .toSet
    // stride 2: chunks at 0,2,4,6,8 -> ceil((10-2)/2) = 4 chunks cover all
    assert(got == Set(
      (1L, 0, "w1 w2 w3 w4", 4), (1L, 1, "w3 w4 w5 w6", 4),
      (1L, 2, "w5 w6 w7 w8", 4), (1L, 3, "w7 w8 w9 w10", 4),
      (2L, 0, "a b", 2)))
  }

  test("dropRepeatedLines removes corpus-wide boilerplate, keeps order") {
    val df = Seq(
      (1L, "COOKIE BANNER\nreal content one\nfooter"),
      (2L, "COOKIE BANNER\nreal content two\nfooter"),
      (3L, "unique doc"))
      .toDF("doc_id", "text")
    val got = graft.llm.DedupOps.dropRepeatedLines(df, "doc_id", "text", 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(got == Set(
      (1L, 1, "real content one"),
      (2L, 1, "real content two"),
      (3L, 0, "unique doc")))
  }

  test("sessionize splits on gap and aggregates per session") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(s: Long) = new java.sql.Timestamp(base.getTime + s * 1000)
    val ev = Seq(
      (7L, ts(0), 1.0), (7L, ts(600), 2.0),   // session 1: 0..600
      (7L, ts(3000), 4.0),                     // gap 2400 > 1800 -> session 2
      (8L, ts(100), 8.0))                      // other user
      .toDF("user_id", "ts", "value")
    val got = Sessionize(ev, "user_id", "ts", "value", gapSeconds = 1800L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
    val t0 = base.getTime / 1000
    assert(got == Set(
      (7L, 1L, t0, t0 + 600, 2L, 3.0),
      (7L, 2L, t0 + 3000, t0 + 3000, 1L, 4.0),
      (8L, 1L, t0 + 100, t0 + 100, 1L, 8.0)))
  }

  test("bm25TopK ranks term-dense short docs first; deterministic ties") {
    val df = Seq(
      (1L, "spark spark spark"),            // dense in the query term
      (2L, "spark and other words here"),   // one hit, longer doc
      (3L, "nothing relevant at all"),      // no hits
      (4L, "spark spark spark"))            // tie with doc 1 -> id order
      .toDF("doc_id", "text")
    val got = CorpusOps.bm25TopK(df, "text", "doc_id", "spark", k = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toList
    assert(got.map(_._1) == List(1L, 4L, 2L)) // 3 scores 0, misses the cut
    assert(got(0)._2 == got(1)._2 && got(0)._2 > got(2)._2 && got(2)._2 > 0)
  }

  test("rrfFusion: weighted reciprocal ranks, docs missing a ranking score 0 from it") {
    val a = Seq((1L, 1), (2L, 2), (3L, 3)).toDF("doc_id", "rank")
    val b = Seq((3L, 1), (1L, 2)).toDF("doc_id", "rank")
    val got = CorpusOps.rrfFusion(Seq((a, 1.0), (b, 2.0)), "doc_id", k = 3,
      rrfK = 10).collect().map(r => (r.getLong(0), r.getDouble(1))).toList
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val e1 = r6(1.0 / 11 + 2.0 / 12) // doc 1: rank 1 in a, rank 2 in b
    val e3 = r6(1.0 / 13 + 2.0 / 11) // doc 3: rank 3 in a, rank 1 in b
    val e2 = r6(1.0 / 12)            // doc 2: only in a
    assert(got == List((3L, e3), (1L, e1), (2L, e2)))
  }

  test("capPerKey keeps a deterministic md5-priority subset per key") {
    val df = (1L to 30L).map(i => (i, s"dom${i % 3}")).toDF("id", "domain")
    val capped = CorpusOps.capPerKey(df, "domain", "id", 4)
    val byKey = capped.collect().map(r => (r.getString(1), r.getLong(0)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byKey.values.forall(_.size == 4))
    // deterministic: a rerun keeps exactly the same ids
    val again = CorpusOps.capPerKey(df, "domain", "id", 4)
      .collect().map(r => (r.getString(1), r.getLong(0)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(again == byKey)
    // a key with fewer docs than the cap keeps all of them
    val small = CorpusOps.capPerKey(
      Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("id", "domain"), "domain", "id", 5)
    assert(small.count() == 3)
  }

  test("decontaminateFuzzy flags near-verbatim benchmark fragments, not unrelated docs") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "completely unrelated text about spark catalyst optimizer internals"),
      (3L, "another unrelated document describing parquet column pruning")
    ).toDF("doc_id", "text")
    // benchmark holds a truncated copy of doc 1
    val bench = Seq(
      (100L, "the quick brown fox jumps over the lazy dog again and")
    ).toDF("doc_id", "text")
    val out = CorpusOps.decontaminateFuzzy(corpus, bench, "text", "doc_id",
      shingleK = 3, bands = 8, rowsPerBand = 4, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSet == Set((1L, 100L)))
  }

  test("jaccardPairsExact (inverted index) matches the brute-force all-pairs Jaccard") {
    import graft.llm.DedupOps
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // brute force: shingle once per doc, all-pairs set Jaccard
    val dt = docs.groupBy(col("text")).agg(min(col("doc_id")).as("doc"))
    val sh = dt.select(col("doc"), DedupOps.shingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    val a = sh.select(col("doc").as("id_a"), col("sh").as("sh_a"))
    val b = sh.select(col("doc").as("id_b"), col("sh").as("sh_b"))
    val brute = a.join(broadcast(b), col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        DedupOps.jaccardOfSets(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= 0.2)
    val indexed = DedupOps.jaccardPairsExact(docs, "text", "doc_id",
      shingleK = 3, threshold = 0.2)
    val (bp, ip) = (pairs(brute), pairs(indexed))
    assert(bp.nonEmpty, "fixture should contain at least one pair at t=0.2")
    assert(ip == bp)
  }

  test("deterministicShuffle: pos is a permutation in skey order, stable, sharded") {
    import graft.llm.CorpusOps
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id")
    def run() = CorpusOps.deterministicShuffle(docs, "doc_id", "seedX", 4)
      .select("doc_id", "skey", "pos", "shard").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val a = run()
    val n = a.length
    // pos is exactly 0..n-1 and follows the md5 order
    assert(a.map(_._3).sorted.toSeq == (0L until n).toSeq)
    val bySkey = a.sortBy(_._2)
    assert(bySkey.map(_._3).toSeq == (0L until n).toSeq,
      "pos must rank the seeded-md5 total order")
    assert(a.forall { case (_, _, pos, shard) => shard == pos % 4 })
    // reproducible across runs (the whole point)
    assert(run().sortBy(_._1).toSeq == a.sortBy(_._1).toSeq)
  }

  test("mixtureSample: per-source rates hit the token budget, hash-deterministic") {
    import spark.implicits._
    val df = Seq(
      (1L, "w1 w2 w3 w4", "web"),  // web: 8 tokens total
      (2L, "w5 w6 w7 w8", "web"),
      (3L, "c1 c2", "code"),       // code: 4 tokens total
      (4L, "c3 c4", "code"),
      (5L, "junk junk", "spam")    // not in weights -> p 0, dropped
    ).toDF("doc_id", "text", "source")
    // budget 6 of 12 weighted tokens: web target 6*3/4=4.5 of 8 -> p .5625;
    // code target 6*1/4=1.5 of 4 -> p .375
    val got = CorpusOps.mixtureSample(df, "doc_id", "text", "source",
      Map("web" -> 3.0, "code" -> 1.0), budgetTokens = 6L)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getInt(2), r.getDouble(3), r.getBoolean(4))))
      .toMap
    assert(got.size == 5)
    assert(got(1L)._3 == 0.5625 && got(3L)._3 == 0.375)
    assert(got(5L)._3 == 0.0 && !got(5L)._4)
    // saturation: budget >= all weighted tokens -> every doc kept at p 1
    val all = CorpusOps.mixtureSample(df, "doc_id", "text", "source",
      Map("web" -> 1.0, "code" -> 1.0), budgetTokens = 100L)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(all(1L) && all(2L) && all(3L) && all(4L) && !all(5L))
    // deterministic: identical verdicts on a re-run
    val again = CorpusOps.mixtureSample(df, "doc_id", "text", "source",
      Map("web" -> 3.0, "code" -> 1.0), budgetTokens = 6L)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(again == got.view.mapValues(_._4).toMap)
  }

  test("perplexityBuckets: common-word docs land in the head band") {
    import spark.implicits._
    // 'a' dominates the corpus -> the all-'a' doc has the lowest
    // perplexity; the rare-word doc the highest
    val df = Seq(
      (1L, "a a a a a a"),
      (2L, "a a a b"),
      (3L, "a b c"),
      (4L, "x y z"), // every token rare
      (5L, "a a b b"),
      (6L, "a a a a b b")).toDF("doc_id", "text")
    val got = CorpusOps.perplexityBuckets(df, "text", "doc_id", nBuckets = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getInt(3)))
    val byId = got.map(t => t._1 -> t._3).toMap
    assert(byId(1L) == 0, "lowest-ppl doc is head")
    assert(byId(4L) == 2, "rare-word doc is tail")
    // buckets are monotone in ppl: sorting by ppl never decreases bucket
    val sorted = got.sortBy(_._2).map(_._3)
    assert(sorted.zip(sorted.tail).forall { case (a, b) => a <= b })
    // 6 docs / 3 buckets -> balanced 2/2/2 (no rank ties here)
    assert(got.groupBy(_._3).view.mapValues(_.length).toMap ==
      Map(0 -> 2, 1 -> 2, 2 -> 2))
  }

  test("decontaminateBloom is a superset of the exact probe; check row pins it") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "one two three four five"),  // shares bench 3-gram
      (2L, "six seven eight nine ten"),
      (3L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val bench = Seq((99L, "zero two three four")).toDF("doc_id", "text")
    val exact = CorpusOps.decontaminate(corpus, bench, "text", "doc_id", n = 3)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val bloom = CorpusOps.decontaminateBloom(corpus, bench, "text", "doc_id",
      n = 3, fpp = 1e-6)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // no false negatives: every exact flag survives the bloom probe
    assert(exact.forall { case (id, e) => e == 0 || bloom(id) == 1 })
    assert(bloom(1L) == 1)
    val chk = CorpusOps.bloomSupersetCheck(corpus, bench, "text", "doc_id",
      n = 3, fpp = 1e-6).head()
    assert(chk.getLong(0) == 3L && chk.getLong(1) == 1L)
    assert(chk.getBoolean(2) && chk.getBoolean(3))
  }

  test("dropDuplicateSpans erases cross-doc spans, keeps within-doc repeats") {
    import spark.implicits._
    val df = Seq(
      // docs 1 and 2 share the 4-token span "p q r s" at different offsets
      (1L, "a b p q r s c d"),
      (2L, "p q r s x y z w"),
      // within-doc repetition only: never erased (minDocs counts docs)
      (3L, "m n o t m n o t m n o t"),
      // shorter than the window: untouched
      (4L, "u v w")).toDF("doc_id", "text")
    val got = graft.llm.DedupOps
      .dropDuplicateSpans(df, "doc_id", "text", w = 4)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3))))
      .toMap
    assert(got(1L) == (("a b c d", 8, 4)))
    assert(got(2L) == (("x y z w", 8, 4)))
    assert(got(3L) == (("m n o t m n o t m n o t", 12, 0)))
    assert(got(4L) == (("u v w", 3, 0)))
  }

  test("dropDuplicateSpans removes the union of overlapping dup windows") {
    import spark.implicits._
    // shared span of 5 tokens -> two overlapping 4-windows in each doc;
    // covered positions are the union, not double-counted
    val df = Seq(
      (1L, "p q r s t a b"),
      (2L, "z p q r s t y")).toDF("doc_id", "text")
    val got = graft.llm.DedupOps
      .dropDuplicateSpans(df, "doc_id", "text", w = 4)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(3)))).toMap
    assert(got(1L) == (("a b", 5)))
    assert(got(2L) == (("z y", 5)))
  }

  test("gopherC4Rules: each published rule fires on its crafted violator") {
    val good = (Seq.fill(20)("the cat and the dog ran to that big house with hats.").mkString(" "))
    val docs = Seq(
      1L -> good,                                   // passes everything
      2L -> "Short. Yes. Ok.",                      // fails g_wordcount (3 sentences though)
      3L -> (good + " lorem ipsum dolor"),          // fails c4_no_lorem
      4L -> (good + " { code }"),                   // fails c4_no_brace
      5L -> Seq.fill(60)("### # ## #").mkString(" ") ,   // symbol ratio >> 0.1
      6L -> (1 to 60).map(i => s"- bullet item number $i ok").mkString("\n"), // all lines bullets
      7L -> (Seq.fill(30)("the of and to be have that with word more...") .mkString("\n")), // >30% ellipsis lines
      8L -> Seq.fill(60)("12345 67890").mkString(" "),  // alpha ratio 0
      9L -> Seq.fill(60)("zebra quokka xylophone marble").mkString(" ")  // <2 required words
    ).toDF("doc_id", "text")
    val got = TextOps.gopherC4Rules(docs, "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(got(1L).getAs[Boolean]("keep"), "good doc must pass all rules")
    assert(!got(2L).getAs[Boolean]("g_wordcount_ok"))
    assert(got(2L).getAs[Boolean]("c4_sentences_ok"))
    assert(!got(3L).getAs[Boolean]("c4_no_lorem"))
    assert(!got(4L).getAs[Boolean]("c4_no_brace"))
    assert(!got(5L).getAs[Boolean]("g_symbol_ok"))
    assert(!got(6L).getAs[Boolean]("g_bullet_ok"))
    assert(!got(7L).getAs[Boolean]("g_ellipsis_ok"))
    assert(!got(8L).getAs[Boolean]("g_alpha_ok"))
    assert(!got(9L).getAs[Boolean]("g_stopwords_ok"))
    assert(Seq(2L,3L,4L,5L,6L,7L,8L,9L).forall(i => !got(i).getAs[Boolean]("keep")))
  }

  test("dsirSelect: target-like docs get higher importance weights; cutoff = ceil(n/4)") {
    // raw corpus: 8 docs in the target's vocabulary, 8 in a disjoint one
    val targetish = (0 until 8).map(i => (i.toLong, "the quick brown fox jumps over the lazy dog " + i))
    val junk = (8 until 16).map(i => (i.toLong, "zzz qqq www eee rrr ttt yyy uuu iii " + i))
    val raw = (targetish ++ junk).toDF("doc_id", "text")
    val target = targetish.toDF("doc_id", "text")
    val got = CorpusOps.dsirSelect(raw, target, "doc_id", "text",
      buckets = 32, keepFraction = 0.25).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(got.size == 16)
    val avgT = (0 until 8).map(i => got(i.toLong).getAs[Double]("log_weight")).sum / 8
    val avgJ = (8 until 16).map(i => got(i.toLong).getAs[Double]("log_weight")).sum / 8
    assert(avgT > avgJ, s"target-like docs must score higher: $avgT vs $avgJ")
    assert(got.values.count(_.getAs[Boolean]("selected")) == 4) // ceil(16*0.25)
    // deterministic: same inputs, same verdicts
    val again = CorpusOps.dsirSelect(raw, target, "doc_id", "text",
      buckets = 32, keepFraction = 0.25).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("selected")).toMap
    assert(got.forall { case (id, r) => again(id) == r.getAs[Boolean]("selected") })
  }

  test("nbTrainScore: clean vocab separation classifies held-out docs correctly") {
    // labeled training rows: positives share vocab A, negatives vocab B
    val labeled = ((0 until 10).map(i => (100L + i, "good clean prose text sample " + (i % 3), true)) ++
      (0 until 10).map(i => (200L + i, "spam junk noise garbage click " + (i % 3), false)))
      .toDF("doc_id", "text", "lab")
    // corpus includes unseen docs from each vocabulary
    val corpus = Seq(
      (1L, "clean prose text"), (2L, "good sample prose"),
      (3L, "junk noise click"), (4L, "spam garbage junk")
    ).toDF("doc_id", "text")
    val got = CorpusOps.nbTrainScore(corpus, labeled, "doc_id", "text", "lab")
      .collect().map(r => r.getLong(0) -> r.getAs[Boolean]("predicted")).toMap
    assert(got(1L) && got(2L), "target-vocab docs must classify positive")
    assert(!got(3L) && !got(4L), "junk-vocab docs must classify negative")
    // prior dominates for an empty doc: balanced classes -> logit ~ 0 -> negative
    val empty = CorpusOps.nbTrainScore(Seq((9L, "")).toDF("doc_id", "text"),
      labeled, "doc_id", "text", "lab").head()
    assert(math.abs(empty.getAs[Double]("logit")) < 1e-9)
  }

  test("md5Lower63Jvm is bit-identical to the Column md5Lower63") {
    val md = java.security.MessageDigest.getInstance("MD5")
    val samples = Seq("", "a", "hello world", "caf\u00e9 \u00e5 \u6f22",
      "the quick:brown", "123", "a b")
    val dfv = samples.toDF("s")
      .select(graft.llm.DedupOps.md5Lower63($"s")).collect().map(_.getLong(0))
    val jvm = samples.map(x => graft.llm.DedupOps.md5Lower63Jvm(md, x))
    assert(dfv.toSeq == jvm)
  }

  test("bigramLogProb: repeated-bigram docs score higher than novel-bigram docs") {
    // "a b" appears 3x in doc 1's corpus presence; doc 3 pairs words never
    // seen adjacent elsewhere
    val docs = Seq(
      (1L, "a b a b a b"), (2L, "a b c d"), (3L, "d a c b"), (4L, "x")
    ).toDF("doc_id", "text")
    val got = CorpusOps.bigramLogProb(docs, "text", "doc_id").collect()
      .map(r => r.getLong(0) -> r).toMap
    // doc 4 has one token -> no bigrams -> absent
    assert(!got.contains(4L) && got.size == 3)
    val s1 = got(1L).getAs[Double]("avg_logp2")
    val s3 = got(3L).getAs[Double]("avg_logp2")
    assert(s1 > s3, s"frequent bigrams must outscore novel ones: $s1 vs $s3")
    assert(got(1L).getAs[Long]("n_bigrams") == 5)
    assert(got(3L).getAs[Long]("n_bigrams") == 3)
  }

  test("chunkSentences: boundary-respecting prefix-sum packing") {
    // sentences of 4 tokens each; maxTokens=10 -> cumBefore 0,4,8,12,16
    // -> chunks 0,0,0,1,1 (chunk 0 overflows to 12 tokens, sentence whole)
    val text = "a b c d. e f g h! i j k l? m n o p. q r s t."
    val got = TextOps.chunkSentences(
      Seq((1L, text), (2L, ""), (3L, "x y")).toDF("doc_id", "text"),
      "doc_id", "text", maxTokens = 10).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r).toMap
    assert(!got.keys.exists(_._1 == 2L), "empty doc yields no chunks")
    assert(got((3L, 0)).getAs[String]("chunk") == "x y")
    assert(got.keys.count(_._1 == 1L) == 2)
    val c0 = got((1L, 0)); val c1 = got((1L, 1))
    assert(c0.getAs[String]("chunk") == "a b c d e f g h i j k l")
    assert(c0.getAs[Int]("n_sentences") == 3 && c0.getAs[Int]("n_chunk_tokens") == 12)
    assert(c1.getAs[String]("chunk") == "m n o p q r s t")
    assert(c1.getAs[Int]("n_sentences") == 2 && c1.getAs[Int]("n_chunk_tokens") == 8)
  }

  test("decontaminateSpans: strips exactly the benchmark-overlapping windows") {
    val benchText = "alpha beta gamma delta"
    val corpus = Seq(
      // doc 1 embeds the bench 4-gram mid-sentence (positions 2..5)
      (1L, "intro words alpha beta gamma delta trailing tail here"),
      (2L, "totally unrelated text with no overlap at all"),
      (3L, "Alpha Beta Gamma Delta")  // case-insensitive full match
    ).toDF("doc_id", "text")
    val bench = Seq((100L, benchText)).toDF("doc_id", "text")
    val got = CorpusOps.decontaminateSpans(corpus, bench, "text", "doc_id",
      n = 4).collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[String]("clean_text") == "intro words trailing tail here")
    assert(got(1L).getAs[Int]("n_removed") == 4)
    assert(got(2L).getAs[String]("clean_text") ==
      "totally unrelated text with no overlap at all")
    assert(got(2L).getAs[Int]("n_removed") == 0)
    // matching is lowercased, reassembly keeps original casing (all gone)
    assert(got(3L).getAs[String]("clean_text") == "")
    assert(got(3L).getAs[Int]("n_removed") == 4)
  }

  test("canonicalizeUrl: case, ports, www, tracking params, fragment, order") {
    val cases = Seq(
      // scheme+host lowercase, fragment dropped, params sorted
      "HTTPS://Example.COM/A/b?z=1&a=2#frag" -> "https://example.com/A/b?a=2&z=1",
      // default port per scheme stripped; non-default kept
      "https://example.com:443/x" -> "https://example.com/x",
      "http://example.com:80/x" -> "http://example.com/x",
      "http://example.com:8080/x" -> "http://example.com:8080/x",
      "https://example.com:80/x" -> "https://example.com:80/x",
      // www. stripped, tracking params dropped (ref exact, not prefix)
      "https://www.example.com/p?utm_source=a&utm_medium=b&id=3" ->
        "https://example.com/p?id=3",
      "https://example.com/p?gclid=g&fbclid=f&ref=hp&refresh=1" ->
        "https://example.com/p?refresh=1",
      // empty path -> '/', all-tracking query -> no '?'
      "https://example.com?utm_campaign=x" -> "https://example.com/",
      "https://example.com/only#f" -> "https://example.com/only")
    val got = cases.map(_._1).zipWithIndex.map { case (u, i) => (i.toLong, u) }
      .toDF("id", "url")
      .select($"id", TextOps.canonicalizeUrl($"url").as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    cases.zipWithIndex.foreach { case ((u, want), i) =>
      assert(got(i.toLong) == want, s"for $u") }
  }

  test("prCurve: exact sweep on a hand-checked set, id tiebreak on score ties") {
    val df = Seq((1L, 0.9, true), (2L, 0.8, false), (3L, 0.7, true),
      (4L, 0.7, false), (5L, 0.5, true)).toDF("id", "score", "y")
    val got = CorpusOps.prCurve(df, "id", "score", "y").orderBy("rank").collect()
    // order: (.9,T) (.8,F) (.7 id3,T) (.7 id4,F) (.5,T)
    assert(got.map(_.getAs[Long]("tp")).toSeq == Seq(1L, 1L, 2L, 2L, 3L))
    assert(got.map(_.getAs[Long]("fp")).toSeq == Seq(0L, 1L, 1L, 2L, 2L))
    assert(got.map(_.getAs[Double]("threshold")).toSeq ==
      Seq(0.9, 0.8, 0.7, 0.7, 0.5))
    assert(got(2).getAs[Double]("prec") == 0.666667) // round(2/3, 6)
    assert(got(3).getAs[Double]("rec") == 0.666667)
    assert(got(4).getAs[Double]("rec") == 1.0)
  }

  test("zipfSlope: closed-form fit over ranked counts, alphabetical tie order") {
    // counts: a=8 b=4 c=2 d=2 -> ranks a1 b2 c3 d4 (c/d tie alphabetical)
    val text = (Seq.fill(8)("a") ++ Seq.fill(4)("b") ++
      Seq.fill(2)("c") ++ Seq.fill(2)("d")).mkString(" ")
    val df = Seq((1L, "s", text)).toDF("id", "source", "text")
    val r = CorpusOps.zipfSlope(df, "text", "source", 100).collect()(0)
    assert(r.getAs[Long]("n_terms") == 4L)
    val x = Seq(1, 2, 3, 4).map(i => math.log(i.toDouble))
    val y = Seq(8, 4, 2, 2).map(c => math.log(c.toDouble))
    val (n, sx, sy) = (4.0, x.sum, y.sum)
    val sxy = x.zip(y).map { case (a, b) => a * b }.sum
    val sxx = x.map(a => a * a).sum
    val want = BigDecimal((n * sxy - sx * sy) / (n * sxx - sx * sx))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("zipf_slope") == want)
    // topK truncation changes the fit: with topK=2 only a,b remain
    val r2 = CorpusOps.zipfSlope(df, "text", "source", 2).collect()(0)
    assert(r2.getAs[Long]("n_terms") == 2L)
    val want2 = BigDecimal((math.log(4.0) - math.log(8.0)) / math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r2.getAs[Double]("zipf_slope") == want2) // exactly -1
  }

  test("ngramDiversity: hand-counted trigram ratio, short docs contribute 0") {
    val df = Seq((1L, "a", "a b c a b c"), // grams: abc bca cab abc -> 3/4
      (2L, "a", "x y"), // too short for trigrams
      (3L, "b", "p q r")).toDF("id", "source", "text")
    val got = CorpusOps.ngramDiversity(df, "text", "source", 3).collect()
      .map(r => r.getString(0) -> ((r.getAs[Long]("n_ngrams"),
        r.getAs[Long]("n_distinct"), r.getAs[Double]("diversity")))).toMap
    assert(got("a") == ((4L, 3L, 0.75)))
    assert(got("b") == ((1L, 1L, 1.0)))
    assert(!got.contains(null))
  }

  test("rocAuc: midrank Mann-Whitney matches the hand-counted pair AUC") {
    // pairs: pos .9 beats both negs (2); pos .7 ties neg .7 (0.5); pos .5
    // beats none -> AUC = 2.5 / (3*2)
    val df = Seq((0.9, true), (0.8, false), (0.7, true), (0.7, false),
      (0.5, true)).toDF("score", "y")
    val r = CorpusOps.rocAuc(df, "score", "y").collect()(0)
    assert(r.getAs[Long]("p") == 3L && r.getAs[Long]("n") == 2L)
    assert(r.getAs[Double]("auc") == 0.416667)
  }

  test("rocAuc: null scores are excluded, not rank-inflated") {
    // a null-scored neg once took rank 1 (nulls-first) and then dropped
    // at the tie-size join, shifting every real rank up by one
    val df = Seq((Some(0.1), false), (None, false), (Some(0.9), true))
      .toDF("score", "y")
    val r = CorpusOps.rocAuc(df, "score", "y").collect()(0)
    assert(r.getAs[Long]("p") == 1L && r.getAs[Long]("n") == 1L)
    assert(r.getAs[Double]("auc") == 1.0, "perfect separation, not 2.0")
  }

  test("averagePrecision: mean precision at the positives' ranks") {
    // order (.9,T)(.8,F)(.7T id3)(.7F)(.5T): precisions at positives =
    // 1/1, 2/3, 3/5 -> AP = (1 + 0.666.. + 0.6)/3
    val df = Seq((1L, 0.9, true), (2L, 0.8, false), (3L, 0.7, true),
      (4L, 0.7, false), (5L, 0.5, true)).toDF("id", "score", "y")
    val r = CorpusOps.averagePrecision(df, "id", "score", "y").collect()(0)
    assert(r.getAs[Long]("p") == 3L)
    assert(r.getAs[Double]("ap") == 0.755556) // round((1+2.0/3+0.6)/3, 6)
  }

  test("calibration: sigmoid deciles, clamped top bin, observed rates") {
    val df = Seq((0.0, true), (0.0, false), (10.0, true), (12.0, true),
      (-10.0, false)).toDF("logit", "y")
    val got = CorpusOps.calibration(df, "logit", "y", 10).collect()
      .map(r => r.getAs[Int]("bin") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Double]("observed_rate")))).toMap
    // sigmoid(0)=0.5 -> bin 5; sigmoid(±10,12)≈1/0 -> bins 9 and 0 (clamped)
    assert(got(5) == ((2L, 0.5)))
    assert(got(9) == ((2L, 1.0)))
    assert(got(0) == ((1L, 0.0)))
  }

  test("packSegments: contiguous spans, window alignment, packIntoWindows agreement") {
    val docs = Seq((0L, "s", "a b c"), (1L, "s", "d e"), (2L, "s", "f g h i"),
      (3L, "t", "j"), (4L, "t", "k l m n o p")).toDF("doc_id", "src", "text")
    val seg = TextOps.packSegments(docs, "doc_id", "text", 4, Some("src"))
      .collect().map(r => (r.getAs[String]("src"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("seg_start"), r.getAs[Long]("seg_end"),
        r.getAs[Long]("window_id"))).sortBy(t => (t._1, t._2))
    // per-shard token stream is gapless and ordered
    for (Seq(a, b) <- seg.toSeq.sliding(2) if a._1 == b._1)
      assert(a._4 == b._3, s"gap between $a and $b")
    // a doc's window is the window containing its FIRST token
    seg.foreach { case (_, _, st, _, w) => assert(w == st / 4) }
    // same assignment as packIntoWindows
    val piw = TextOps.packIntoWindows(docs, "doc_id", "text", 4, Some("src"))
      .select("doc_id", "window_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    seg.foreach { case (_, id, _, _, w) => assert(piw(id) == w) }
  }

  test("urlDedup: synthUrl's four variants collapse to one canonical url") {
    val docs = (0L until 40L).toDF("doc_id")
      .select($"doc_id", TextOps.synthUrl($"doc_id").as("url"))
    val d = TextOps.urlDedup(docs, "doc_id", "url").collect()
    assert(d.length == 10)
    assert(d.forall(_.getAs[Long]("dup_count") == 4L))
    // keep_id is the page's lowest doc and canon carries the page id
    d.foreach { r =>
      val keep = r.getAs[Long]("keep_id")
      assert(keep % 4 == 0)
      assert(r.getAs[String]("canon_url") ==
        s"https://site${keep / 4 % 50}.example.com/articles/${keep / 4}?id=${keep / 4}")
    }
  }

  test("tokenBudgetSelect: crossing doc kept, min one doc per source") {
    val df = Seq(
      ("A", 1L, 0.9, 50L), ("A", 2L, 0.8, 60L), ("A", 3L, 0.7, 40L),
      ("B", 4L, 0.5, 200L), ("B", 5L, 0.4, 10L))
      .toDF("src", "id", "q", "tk")
    val got = CorpusOps.tokenBudgetSelect(df, "src", "id", "q", "tk", 100L)
      .collect().map(r => r.getLong(1) -> ((r.getInt(4), r.getLong(5))))
      .toMap
    // A: doc1 (cum 50), doc2 crosses at 110 and is KEPT, doc3 dropped;
    // B: doc4 alone blows the budget but every source contributes one
    assert(got.keySet == Set(1L, 2L, 4L))
    assert(got(1L) == ((1, 50L)))
    assert(got(2L) == ((2, 110L)))
    assert(got(4L) == ((1, 200L)))
  }

  test("lshBandPlan: factorizations, S-curve monotonicity, one chosen row") {
    val plan = graft.llm.DedupOps.lshBandPlan(spark, 16, 0.5)
      .orderBy("b").collect()
    assert(plan.map(_.getInt(0)).toSeq == Seq(1, 2, 4, 8, 16))
    plan.foreach(r => assert(r.getInt(0) * r.getInt(1) == 16))
    assert(plan.count(_.getBoolean(5)) == 1, "exactly one chosen")
    // more bands shifts the S-curve left: fp grows, fn shrinks, in b
    val fps = plan.map(_.getDouble(2)).toSeq
    val fns = plan.map(_.getDouble(3)).toSeq
    assert(fps == fps.sorted, s"fp not monotone: $fps")
    assert(fns == fns.sorted.reverse, s"fn not monotone: $fns")
    // degenerate b=1 (AND of all perms): nearly no false positives
    assert(fps.head < 0.01 && fns.head > 0.2)
    val chosen = plan.find(_.getBoolean(5)).get
    assert(chosen.getDouble(4) == plan.map(_.getDouble(4)).min)
  }

  test("quantileSketchCheck: exact percentiles hand-checked, bounds hold") {
    val df = (1L to 100L).toDF("v").select($"v".cast("double").as("v"))
    val got = CorpusOps.quantileSketchCheck(df, "v", Seq(0.25, 0.5, 0.9), 100)
      .collect().map(r => r.getDouble(0) ->
        ((r.getDouble(1), r.getBoolean(2)))).toMap
    // type-7 interpolation on 1..100: (n-1)*q + 1
    assert(got(0.25) == ((25.75, true)))
    assert(got(0.5) == ((50.5, true)))
    assert(got(0.9) == ((90.1, true)))
  }

  test("quantileSketchCheck: loose accuracy still inside the GK bound") {
    val df = (1L to 1000L).toDF("v").select($"v".cast("double").as("v"))
    val got = CorpusOps.quantileSketchCheck(df, "v",
      Seq(0.01, 0.5, 0.99), 20) // eps = n/20 = 50 ranks
    assert(got.collect().forall(_.getBoolean(2)),
      "sketch must honor its own accuracy guarantee")
  }

  test("sourceOverlap: hand-counted shared grams, zero pairs kept, jaccard") {
    // bigrams — A: {a b, b c, c d}; B: {a b, b c, x y}; C: {p q}
    val df = Seq(
      ("A", "a b c d"), ("B", "a b c"), ("B", "x y"), ("C", "p q"))
      .toDF("src", "text")
    val got = CorpusOps.sourceOverlap(df, "text", "src", n = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got.size == 3, "all pairs present, including zero-overlap ones")
    // A∩B = {a b, b c} → 2 shared of 3+3-2=4 union
    assert(got(("A", "B")) == ((3L, 3L, 2L, 0.5)))
    assert(got(("A", "C")) == ((3L, 1L, 0L, 0.0)))
    assert(got(("B", "C")) == ((3L, 1L, 0L, 0.0)))
  }

  test("sourceOverlap: dedup within a source; grams are lowercased") {
    // same doc twice in A, case-flipped in B: distinct digest sets equal
    val df = Seq(("A", "Foo Bar Baz"), ("A", "foo bar baz"),
      ("B", "FOO BAR BAZ")).toDF("src", "text")
    val got = CorpusOps.sourceOverlap(df, "text", "src", n = 2).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(2) == 2L && r.getLong(3) == 2L && r.getLong(4) == 2L)
    assert(r.getDouble(5) == 1.0)
  }

  test("curriculumOrder: bands emit in order, shuffled within, deterministic") {
    val docs = (1L to 30L).map(i =>
      (i, (1 to 10).map(j => s"w${(i * 7 + j) % 13}").mkString(" ")))
      .toDF("doc_id", "text")
    val a = CorpusOps.curriculumOrder(docs, "text", "doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(3)))
    // positions are 1..n and unique
    assert(a.map(_._3).sorted.toSeq == (1L to 30L).toSeq)
    // band sequence is non-decreasing along positions
    val bands = a.sortBy(_._3).map(_._2)
    assert(bands.zip(bands.tail).forall { case (x, y) => x <= y })
    // within a band the order is the md5 shuffle, not doc_id order
    val md = java.security.MessageDigest.getInstance("MD5")
    val band0 = a.filter(_._2 == bands.head).sortBy(_._3).map(_._1)
    val expect0 = band0.sortBy(i =>
      (graft.llm.DedupOps.md5Lower63Jvm(md, s"cur:$i"), i))
    assert(band0.toSeq == expect0.toSeq)
    // deterministic across physical layout
    val b = CorpusOps.curriculumOrder(docs.repartition(7), "text", "doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(3)))
    assert(a.sortBy(_._3).toSeq == b.sortBy(_._3).toSeq)
  }

  test("mooreLewisSelect: in-domain-like docs rank first; smoothing verified by hand") {
    // in-domain docs speak "aaa bbb"; general noise speaks "xxx yyy"
    val df = Seq(
      (1L, "aaa bbb aaa", true), (2L, "aaa bbb bbb", true),
      (3L, "xxx yyy xxx", false), (4L, "yyy xxx yyy", false),
      (5L, "aaa bbb aaa", false) // out-of-domain text that LOOKS in-domain
    ).toDF("doc_id", "text", "flag")
    val got = CorpusOps.mooreLewisSelect(df, "doc_id", "text",
      col("flag"), keepFraction = 0.4).collect()
    // counts: aaa cg=5 ci=3, bbb cg=4 ci=3, xxx cg=3 ci=0, yyy cg=3 ci=0
    // ng=15 ni=6 v=4 -> denomIn=10, denomGen=19
    def term(ci: Long, cg: Long) =
      (math.log(ci + 1.0) - math.log(10.0)) -
        (math.log(cg + 1.0) - math.log(19.0))
    def q4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val sAaaBbb = q4((2 * term(3, 5) + 1 * term(3, 4)) / 3)
    val byId = got.map(r => r.getLong(0) ->
      ((r.getDouble(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(byId(1L)._1 == sAaaBbb && byId(5L)._1 == sAaaBbb)
    // ranks: in-domain-speaking docs above noise; floor(5*0.4)=2 selected
    assert(got.count(_.getBoolean(4)) == 2)
    assert(byId(3L)._1 < sAaaBbb && byId(4L)._1 < sAaaBbb)
    // tie on score breaks to the lower doc id
    val tied = got.filter(_.getDouble(2) == sAaaBbb).map(_.getLong(0))
    val ranks = got.map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(tied.sorted.toSeq.sliding(2).forall {
      case Seq(a, b) => ranks(a) < ranks(b)
      case _ => true
    })
  }

  test("exportManifest: shards partition the corpus; checksum is order-independent") {
    val df = (1L to 60L).map(i => (i, s"doc $i body with tokens " + "w " * (i % 5).toInt))
      .toDF("doc_id", "text")
    val a = CorpusOps.exportManifest(df, "text", "doc_id", 4).collect()
    // shards partition: doc counts sum to the corpus
    assert(a.map(_.getLong(1)).sum == 60L)
    // shard assignment replays from the md5 hash
    val md = java.security.MessageDigest.getInstance("MD5")
    val expectShard0 = (1L to 60L).count(i =>
      graft.llm.DedupOps.md5Lower63Jvm(md, s"shard:$i") % 4 == 0)
    assert(a.find(_.getInt(0) == 0).get.getLong(1) == expectShard0)
    // order/partitioning independence: same manifest after a repartition
    val b = CorpusOps.exportManifest(df.repartition(7), "text", "doc_id", 4)
      .collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    // checksum really is the sum of per-doc digests
    val d0 = (1L to 60L).filter(i =>
        graft.llm.DedupOps.md5Lower63Jvm(md, s"shard:$i") % 4 == 0)
      .map { i =>
        val text = s"doc $i body with tokens " + "w " * (i % 5).toInt
        BigInt(graft.llm.DedupOps.md5Lower63Jvm(md, text))
      }.sum
    assert(a.find(_.getInt(0) == 0).get.getString(4) == d0.toString)
  }

  test("pipelineFunnel: every stage drops exactly its construction") {
    def passA(tag: String) = (1 to 5).map(i =>
      s"the quick brown fox jumps over the lazy dog and then it runs back " +
        s"home to rest $tag number$i.").mkString(" ")
    val passB = (1 to 5).map(i =>
      s"tall green trees stand near the quiet river and birds sing " +
        s"morning songs above bright water verse$i.").mkString(" ")
    // structurally clean but German-dominant: dropped at the LANG gate
    val german = (1 to 5).map(i =>
      "der die und das ist nicht mit ein zu den der die und das ist the " +
        s"and wanderer bergwald nummer$i.").mkString(" ")
    val corpus = Seq(
      (1L, passA("alpha")),
      (2L, passA("alpha")), // exact dup of 1
      (3L, passA("alpha").replace("number5.", "number6.")), // near dup of 1
      (4L, german), // dropped at the language gate
      (5L, passB), // survives everything
      (6L, "way too short to pass the word count gate") // dropped by rules
    ).toDF("doc_id", "text")
    // bench shares an 8-gram with passA only
    val bench = Seq((100L,
      "the quick brown fox jumps over the lazy dog and then"))
      .toDF("doc_id", "text")
    val got = CorpusOps.pipelineFunnel(corpus, bench, "text", "doc_id")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (0, "raw", 6L), (1, "rules", 5L), (2, "lang_en", 4L),
      (3, "exact_dedup", 3L), (4, "near_dedup", 2L),
      (5, "decontaminated", 1L)))
  }

  test("kneserNeyLogProb: hand-computed bigram model; full-vocab normalization") {
    // corpus: "a b a b" and "a c"
    // bgCnt (a,b)=2 (b,a)=1 (a,c)=1; ctx a:(c1=3,n1fwd=2) b:(1,1);
    // cont a=1 b=1 c=1; B=3
    val df = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val got = CorpusOps.kneserNeyLogProb(df, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2))))
      .toMap
    // P(b|a) = 1.25/3 + .75*2/3*(1/3) = 0.5833; P(a|b) = .25 + .25 = 0.5
    // doc1 = (2 ln 0.58333 + ln 0.5)/3 = -0.5904
    assert(got(1L) == ((-0.5904, 3L)))
    // P(c|a) = 0.25/3 + .75*2/3*(1/3) = 0.25 -> ln = -1.3863
    assert(got(2L) == ((-1.3863, 1L)))
    // KN is a proper distribution: sum over the FULL vocab of P(w|v) == 1
    val vocab = Seq("a", "b", "c")
    val cb = Map(("a", "b") -> 2.0, ("b", "a") -> 1.0, ("a", "c") -> 1.0)
    val c1 = Map("a" -> 3.0, "b" -> 1.0)
    val n1fwd = Map("a" -> 2.0, "b" -> 1.0)
    val n1back = Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0)
    for (v <- Seq("a", "b")) {
      val total = vocab.map { w =>
        math.max(cb.getOrElse((v, w), 0.0) - 0.75, 0.0) / c1(v) +
          0.75 * n1fwd(v) / c1(v) * (n1back(w) / 3.0)
      }.sum
      assert(math.abs(total - 1.0) < 1e-9, s"context $v sums to $total")
    }
  }

  test("kmvDistinct: exact count below k, sketch estimate within bound above") {
    // group "small": 3 distinct tokens (< k) -> estimate == exact
    // group "big": 500 distinct tokens (> k=64) -> KMV estimate, ok bound
    val small = Seq(("small", "a b c a b"))
    val big = (0 until 10).map(i =>
      ("big", (0 until 50).map(j => s"tok${i * 50 + j}").mkString(" ")))
    val df = (small ++ big).toDF("source", "text")
    val got = CorpusOps.kmvDistinct(df, "text", "source", k = 64)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(got("small")._1 == 3L)
    assert(got("small")._2 == 3.0) // below k: estimate IS the exact count
    assert(got("big")._1 == 500L)
    assert(got("big")._3, s"KMV estimate ${got("big")._2} outside 25% of 500")
    // the estimate is the (k-1)*2^63/h_k formula, not the exact count
    assert(got("big")._2 != 500.0)
  }

  test("kmvDistinct: kth_hash is the k-th smallest distinct token hash") {
    val df = Seq(("s", (0 until 100).map(i => s"w$i").mkString(" ")))
      .toDF("source", "text")
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = (0 until 100)
      .map(i => graft.llm.DedupOps.md5Lower63Jvm(md, s"w$i"))
      .distinct.sorted.apply(15)
    val r = CorpusOps.kmvDistinct(df, "text", "source", k = 16).head()
    assert(r.getLong(2) == expected)
  }

  test("logRegFit: loss decreases and the fit separates a separable slice") {
    // y = (x1 > 0.5), feature x1 informative, x2 noise-free constant
    val rows = (0 until 200).map { i =>
      val x1 = (i % 100) / 100.0
      (1.0, math.rint(x1 * 1e6) / 1e6, x1 > 0.5)
    }
    val df = rows.toDF("x_bias", "x_one", "y")
    val (roundsDf, w) = CorpusOps.logRegFit(df, Seq("x_bias", "x_one"), "y",
      rounds = 4, lr = 2.0)
    val out = roundsDf.collect()
    assert(out.length == 4)
    val losses = out.map(_.getDouble(3))
    assert(losses.zip(losses.tail).forall { case (a, b) => b <= a },
      s"loss not monotone: ${losses.mkString(",")}")
    // the informative weight moved positive, and the score ranks
    // positives above negatives on average
    assert(w(1) > 0)
    val scored = df.select(col("y"),
      CorpusOps.logRegScore(Seq("x_bias", "x_one"), w).as("z"))
      .groupBy("y").agg(avg("z").as("m")).collect()
      .map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(scored(true) > scored(false))
  }

  test("cmsHeavyHitters: exact top-k, never underestimates, collisions overestimate") {
    // "the" appears 30x, "cat" 10x, each fillerN once
    val docs = (0 until 10).map(i =>
      (s"the the the cat filler$i", i)) :+ (("unique tail words", 99))
    val df = docs.toDF("text", "id").repartition(4)
    val wide = CorpusOps.cmsHeavyHitters(df, "text", depth = 4,
      width = 4096, k = 3).collect()
    assert(wide.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("the", 30L), ("cat", 10L), ("filler0", 1L)))
    // huge grid, 14 distinct tokens: no collisions -> estimates exact
    assert(wide.forall(r => r.getLong(2) == r.getLong(1) && r.getBoolean(3)))
    // width 2 forces collisions: still never underestimates, and the
    // total mass argument makes at least one estimate strictly high
    val tight = CorpusOps.cmsHeavyHitters(df, "text", depth = 2,
      width = 2, k = 3).collect()
    assert(tight.forall(r => r.getLong(2) >= r.getLong(1) && r.getBoolean(3)))
    assert(tight.exists(r => r.getLong(2) > r.getLong(1)))
  }

  test("cmsHeavyHitters: grid merge across partitions matches single-partition build") {
    val docs = (0 until 40).map(i => (s"alpha beta tok${i % 7}", i))
    val df = docs.toDF("text", "id")
    val a = CorpusOps.cmsHeavyHitters(df.repartition(8), "text", 4, 64, 5)
      .collect().map(_.toSeq)
    val b = CorpusOps.cmsHeavyHitters(df.coalesce(1), "text", 4, 64, 5)
      .collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("weightedSample: matches the brute-force exponential-key top-k") {
    val rows = (1L to 100L).map(i => (i, ("w " * (i % 13 + 1).toInt).trim))
    val df = rows.toDF("doc_id", "text")
    val got = CorpusOps.weightedSample(df, "doc_id",
      graft.llm.TextOps.tokenCount(col("text")), k = 10).collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    def q9(x: Double) =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val brute = rows.map { case (i, t) =>
      val w = t.split(" ").length
      val u = (graft.llm.DedupOps.md5Lower63Jvm(md, s"ws:$i") % (1L << 48) +
        0.5) / (1L << 48).toDouble
      (i, w.toLong, q9(math.log(u) / w))
    }.sortBy { case (i, _, key) => (-key, i) }.take(10)
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq ==
      brute)
    // keys descend and ARE the sample order
    val keys = got.map(_.getDouble(2))
    assert(keys.zip(keys.tail).forall { case (a, b) => a >= b })
  }

  test("weightedSample: weight-proportional inclusion and zero-weight exclusion") {
    // one heavy doc (10000 tokens) among 50 single-token docs: the heavy
    // doc's key ln(u)/10000 is ~10000x closer to 0 -> always sampled
    val heavy = (1L, ("h " * 10000).trim)
    val light = (2L to 51L).map(i => (i, "x"))
    val empty = (100L, "   ")
    val df = (heavy +: light :+ empty).toDF("doc_id", "text")
    val got = CorpusOps.weightedSample(df, "doc_id",
      graft.llm.TextOps.tokenCount(col("text")), k = 5).collect()
    assert(got.map(_.getLong(0)).contains(1L))
    assert(!got.map(_.getLong(0)).contains(100L)) // weight 0 excluded
    assert(got.length == 5)
  }

  test("dedupNearLsh: star-edge components equal full bucket-clique components (both hash families)") {
    import graft.llm.DedupOps
    // mutated near-dup families + exact dups + singletons: family f docs
    // share most shingles, so most land in shared LSH buckets
    val base = "the quick brown fox jumps over the lazy dog again and again " +
      "while the rain in spain stays mainly on the plain for every season"
    val docs = ((0 until 6).flatMap(f => (0 until 5).map(c =>
      (f * 100L + c, s"$base family $f copy $c"))) ++
      Seq((900L, "completely unrelated tiny text"),
        (901L, "completely unrelated tiny text"), // exact dup of 900
        (950L, "another lonely document without any twin at all")))
      .toDF("doc_id", "text")
    for (md5Mode <- Seq(true, false)) {
      val kept = DedupOps.dedupNearLsh(docs, "text", "doc_id",
          shingleK = 3, bands = 8, rowsPerBand = 4, md5Mode = md5Mode)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      // ground truth: union-find over the FULL bucket-clique pair set
      // (id < id within every band bucket) + exact-dup pairs — the m²
      // graph the star construction must reproduce component-for-component
      val numHashes = 32
      val withSh = docs.groupBy(col("text")).agg(min(col("doc_id")).as("doc"))
        .select(col("doc"), DedupOps.shingles(col("text"), 3).as("sh"))
        .filter(size(col("sh")) > 0)
      val sigs = withSh.select(col("doc"), explode(col("sh")).as("shingle"))
        .groupBy("doc")
        .agg((if (md5Mode) graft.functions.Md5HashAggs.minhash(col("shingle"), numHashes)
        else graft.functions.HashAggs.minhash(col("shingle"), numHashes)).as("sig"))
      val banded = sigs.select(col("doc"), posexplode(array((0 until 8).map(b =>
        concat_ws(",", transform(slice(col("sig"), lit(b * 4 + 1), lit(4)),
          x => x.cast("string")))): _*)).as(Seq("band", "bucket")))
      val aa = banded.select(col("band"), col("bucket"), col("doc").as("id_a"))
      val bb = banded.select(col("band"), col("bucket"), col("doc").as("id_b"))
      val cliquePairs = aa.join(bb, Seq("band", "bucket"))
        .filter(col("id_a") < col("id_b")).select("id_a", "id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val exact = Seq((900L, 901L))
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r
      }
      (cliquePairs ++ exact).foreach { case (x, y) =>
        val (rx, ry) = (find(x), find(y))
        if (rx != ry) parent(math.max(rx, ry)) = math.min(rx, ry)
      }
      val all = docs.select("doc_id").collect().map(_.getLong(0))
      val expectKept = all.filter(id => find(id) == id).toSet
      assert(kept == expectKept, s"md5Mode=$md5Mode")
      // the families must actually have collided (the test would be vacuous
      // if every doc were kept)
      assert(kept.size < all.length)
    }
  }

  test("dedupNear: viral bucket blows the pair budget -> actionable refusal naming dedupNearLsh") {
    import graft.llm.DedupOps
    // one doc mutated m=60 times — the r15 zipf-probe shape: all m copies
    // share nearly every shingle, so they collide in every band and the
    // verification join would plan ~8 × m²/2 ≈ 14k candidate pairs
    val base = "the quick brown fox jumps over the lazy dog again and again " +
      "while the rain in spain stays mainly on the plain for every season"
    val viral = (0 until 60).map(i => (i.toLong, s"$base uq$i"))
      .toDF("doc_id", "text")
    val knob = "graft.dedup.maxPairBudget"
    spark.conf.set(knob, "1000")
    try {
      for (md5Mode <- Seq(true, false)) {
        val e = intercept[IllegalStateException] {
          DedupOps.dedupNear(viral, "text", "doc_id",
            md5Mode = md5Mode).count()
        }
        assert(e.getMessage.contains("dedupNearLsh"), e.getMessage)
        assert(e.getMessage.contains(knob), e.getMessage)
      }
      // the skew-proof sibling runs the same corpus under the same budget
      // (star edges never enumerate pairs) — the refusal's suggestion works
      assert(DedupOps.dedupNearLsh(viral, "text", "doc_id").count() >= 1)
    } finally spark.conf.unset(knob)
    // default budget: the same viral corpus is far under 100M pairs — runs
    assert(DedupOps.dedupNear(viral, "text", "doc_id").count() >= 1)
  }

  test("dedupNearLsh operating point (8 bands x 4 rows): precision/recall of the collision decision pinned") {
    import graft.llm.DedupOps
    // the EXACT fixture `Scratch lshsweep` measures, by construction
    // (shared LshSweepFixture generator; r15 verdict #6):
    // 100 families x 10 copies with 0..8 of 40 words mutated + 1000
    // singletons, seed 20260816. Truth = exact shingle-Jaccard >= 0.5
    // (what dedupNear verifies per pair); decision = any shared band
    // bucket (what dedupNearLsh clusters on). The shipped default (8, 4)
    // sits at precision 0.630 / recall 0.724 on this fixture — sweep
    // table in FIXTURES.md; sharper trades: (16,2) -> recall 1.000 /
    // precision 0.241, (8,8) -> precision 0.943 / recall 0.251. Counts
    // are pinned EXACTLY (seeded generator, own hash family) so the
    // operating point cannot silently drift.
    val df = LshSweepFixture.docs().toDF("doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def pairSet(d: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      d.select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairSet(
      DedupOps.jaccardPairsExact(df, "text", "doc_id", 3, 0.5))
    val cand = pairSet(DedupOps.minhashLsh(df, "text", "doc_id",
      shingleK = 3, bands = 8, rowsPerBand = 4, threshold = 0.0))
    df.unpersist()
    assert(truth.size == 785, s"truth=${truth.size}")
    assert(cand.size == 901, s"cand=${cand.size}")
    assert((cand & truth).size == 568, s"tp=${(cand & truth).size}")
  }

  test("logRegFit: weights are quantized at 9, output at 6") {
    val df = Seq((1.0, 0.3, true), (1.0, 0.7, false)).toDF("b", "x", "y")
    val (roundsDf, w) = CorpusOps.logRegFit(df, Seq("b", "x"), "y", rounds = 2)
    w.foreach { v =>
      assert(BigDecimal(v).setScale(9,
        BigDecimal.RoundingMode.HALF_UP).toDouble == v)
    }
    roundsDf.collect().foreach { r =>
      Seq(1, 2).foreach { j =>
        val v = r.getDouble(j)
        assert(BigDecimal(v).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble == v)
      }
    }
  }
}
