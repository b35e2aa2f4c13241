package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Physical-plan assertions: the properties that matter at 100 TB are facts
  * about the PLAN, not the output — filters must reach the parquet scan,
  * projections must prune the read schema, small joins must broadcast,
  * aggregates must have a map-side partial phase, and stateless pipelines
  * must stay in one whole-stage-codegen span with no exchange. These specs
  * pin them so a refactor that silently de-optimizes a stage fails CI.
  */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private def orders = spark.read.parquet(s"$sf/orders.parquet")
  private def nation = spark.read.parquet(s"$sf/nation.parquet")

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("$match predicate is pushed down to the parquet scan") {
    val out = pipeline.run(orders,
      """[{"$match": {"o_orderstatus": "F", "o_totalprice": {"$gt": 100000}}},
          {"$project": {"o_orderkey": 1}}]""")
    val p = plan(out)
    // Mongo equality is null-safe (missing ≈ null), so it pushes as
    // EqualNullSafe; the range predicate pushes as GreaterThan
    assert(p.contains("PushedFilters:"), s"expected pushed filters in:\n$p")
    assert(p.contains("EqualNullSafe(o_orderstatus,F)"), p)
    assert(p.contains("GreaterThan(o_totalprice,100000"), p)
  }

  test("$project prunes the parquet read schema") {
    val out = pipeline.run(orders,
      """[{"$project": {"o_orderkey": 1, "o_totalprice": 1}}]""")
    val p = plan(out)
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("o_orderkey") && readSchema.contains("o_totalprice"))
    assert(!readSchema.contains("o_comment") && !readSchema.contains("o_orderdate"),
      s"unpruned scan: $readSchema")
  }

  test("stateless stage chain stays map-side: no exchange in the plan") {
    val out = pipeline.run(orders,
      """[{"$match": {"o_orderstatus": "O"}},
          {"$addFields": {"big": {"$gt": ["$o_totalprice", 150000]}}},
          {"$project": {"o_orderkey": 1, "big": 1}},
          {"$replaceWith": {"k": "$o_orderkey", "b": "$big"}}]""")
    val p = plan(out)
    assert(!p.contains("Exchange"), s"stateless pipeline must not shuffle:\n$p")
    // "*(1)" = whole-stage-codegen span 1: the entire chain fused into ONE
    // generated function over the scan
    assert(p.contains("*(1)"), s"expected a fused codegen span:\n$p")
  }

  test("$group compiles to hash aggregation with a map-side partial phase") {
    val out = pipeline.run(orders,
      """[{"$group": {"_id": "$o_orderstatus",
                      "n": {"$count": {}}, "total": {"$sum": "$o_totalprice"}}}]""")
    val p = plan(out)
    // partial -> exchange -> final: only the partial rows cross the wire
    assert(p.contains("HashAggregate"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, s"no partial agg:\n$p")
    assert(p.contains("Exchange hashpartitioning"), p)
  }

  test("$lookup of a small dimension broadcasts (no shuffle of the fact side)") {
    val out = new Pipeline(catalog = name => spark.read.parquet(s"$sf/$name.parquet"))
      .run(orders,
        """[{"$lookup": {"from": "nation", "localField": "o_orderkey",
                         "foreignField": "n_nationkey", "as": "n", "unwind": true}}]""")
    val p = plan(out)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      s"small-side lookup should broadcast:\n$p")
  }

  test("minhash LSH candidate join is a bucketed equi-join, never a cross join") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = graft.llm.DedupOps.minhashLsh(docs, "text", "doc_id")
    val p = plan(out)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"LSH pair formation must stay an equi-join:\n$p")
  }

  test("dedupNearLsh star edges: equi-joins only, partial-agg bucket centers (skew-safe)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = graft.llm.DedupOps.dedupNearLsh(docs, "text", "doc_id")
    val p = plan(out)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"star-edge formation must stay an equi-join:\n$p")
    // the bucket-center min(doc) must be a partial (map-side) aggregate —
    // that's what makes a viral bucket skew-safe
    assert(p.contains("partial_min"),
      s"bucket centers must partial-aggregate map-side:\n$p")
  }

  test("embed near-dup LSH pair formation is a bucketed equi-join") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val out = graft.llm.VectorOps.embedNearDupLsh(emb, "vec_id", "embedding", 0.3)
    val p = plan(out)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"banded LSH must join on (bandIdx, bucket):\n$p")
  }

  test("dynamic $lookup plans one hash equi-join, never a nested loop") {
    import spark.implicits._
    val left = Seq("""{"_id":"a","fk":1}""").toDF("doc")
    val dims = Seq("""{"k":1,"v":"x"}""").toDF("doc")
    val out = graft.dynamic.DynPipeline.run(left,
      """[{"$lookup": {"from": "d", "localField": "fk",
                       "foreignField": "k", "as": "m"}}]""",
      graft.dynamic.DynPipeline.DynCtx(catalog = _ => dims))
    val p = plan(out)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"dynamic lookup must stay an equi-join:\n$p")
    assert(p.contains("HashAggregate"), s"from side must pre-group matches:\n$p")
  }

  test("int8 quantization is a pure projection: no exchange, no aggregate") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val p = plan(graft.llm.VectorOps.quantizeInt8(emb, "vec_id", "embedding"))
    assert(!p.contains("Exchange"), s"quantization must not shuffle:\n$p")
  }

  test("sharded packIntoWindows partitions the window by shard (no global sort)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = plan(graft.llm.TextOps.packIntoWindows(docs, "doc_id", "text", 4096,
      shardCol = Some("source")))
    assert(p.contains("Exchange hashpartitioning(source"),
      s"window must partition on the shard:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"sharded packing must not serialize through one reducer:\n$p")
  }

  test("repetition signals are a pure projection: no exchange") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = plan(docs.select(col("doc_id"),
      graft.llm.TextOps.repetitionFeatures(col("text")).as("r")))
    assert(!p.contains("Exchange"), s"per-doc signals must not shuffle:\n$p")
  }

  test("decontamination probes a broadcast gram set (corpus never shuffles for the join)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = plan(graft.llm.CorpusOps.decontaminate(
      docs.filter(col("doc_id") % 97 =!= 0),
      docs.filter(col("doc_id") % 97 === 0), "text", "doc_id"))
    assert(p.contains("BroadcastHashJoin"), s"bench grams must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the corpus side must not sort-merge against the eval set:\n$p")
  }

  test("sessionize plans one user-hash exchange and a single window") {
    val ev = SparkEntry.queries("q_sessionize")(spark, sf)
    val p = plan(ev)
    assert(p.contains("Exchange hashpartitioning(user_id"),
      s"sessionization must hash-partition by user:\n$p")
    // lag + running sum share (partition, order) -> ONE Window exec, and the
    // per-session groupBy reuses the user hash partitioning (no 2nd shuffle
    // of the event stream beyond the aggregate's own partial phase)
    assert("(?s)Window".r.findAllIn(p).size >= 1)
    assert(!p.contains("Exchange SinglePartition"),
      s"no global ordering may appear:\n$p")
  }

  test("$setWindowFields plans ONE Window exec for all output fields") {
    val p = plan(SparkEntry.queries("q_window_fields")(spark, sf))
    // rank/shift share the ordered window; framed aggs get their own frame
    // but stay in the same Window exec chain with ONE exchange on the key
    assert("Exchange hashpartitioning\\(event_type".r.findAllIn(p).size == 1,
      s"one partition exchange expected:\n$p")
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("$graphLookup rounds are hash equi-joins; assembly joins on the start value") {
    val p0 = new Pipeline(catalog =
      { case "customer" => spark.read.parquet(s"$sf/customer.parquet") })
    val out = p0.run(orders,
      """[{"$graphLookup": {"from": "customer", "startWith": "$o_custkey",
            "connectFromField": "c_nationkey", "connectToField": "c_custkey",
            "as": "chain", "maxDepth": 1}}]""")
    val p = plan(out)
    // the closure re-attaches per start VALUE — an equi-join, and never a
    // nested loop anywhere in the BFS or the assembly
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"graph lookup must stay equi-join:\n$p")
    assert(p.contains("Join") || p.contains("join"), p)
  }

  test("$bucketAuto ranks distributed: range exchange, never SinglePartition") {
    val out = pipeline.run(orders,
      """[{"$bucketAuto": {"groupBy": "$o_totalprice", "buckets": 4}}]""")
    val p = plan(out)
    // the global rank is range-partitioned + per-partition offsets
    // (GlobalRank) — a single-partition window over the INPUT would
    // serialize the whole table through one reducer at 100 TB. The only
    // allowed SinglePartition exchange is the boundary-chaining `lead`
    // over the <= `buckets` aggregated rows.
    val single = "Exchange SinglePartition".r.findAllMatchIn(p).toList
    assert(single.size <= 1, s"one SinglePartition at most (bucket rows):\n$p")
    single.foreach { m =>
      assert(p.substring(m.end).contains("HashAggregate(keys=[__b"),
        s"SinglePartition must sit above the per-bucket aggregate, not the input:\n$p")
    }
    assert(p.contains("partial_min") || p.contains("partial_count"),
      s"expected map-side partial agg per bucket:\n$p")
  }

  test("window calculus family shares the partition exchange") {
    val p = plan(SparkEntry.queries("q_window_fill")(spark, sf))
    // linearFill's back/fwd frames + the EMA growing frame all partition on
    // the same key: exactly one hash exchange, no single-partition collapse
    assert("Exchange hashpartitioning\\(event_type".r.findAllIn(p).size == 1,
      s"one partition exchange expected:\n$p")
    assert(!p.contains("Exchange SinglePartition"), p)
    assert(p.contains("exp_moving_avg"), s"incremental EMA aggregate expected:\n$p")
  }

  test("no window frame ends at unboundedFollowing (shrinking frames are O(n^2))") {
    // $linearFill / $locf / [x, unbounded) user frames must all plan as
    // growing frames (reversed sort where needed): a frame whose lower edge
    // moves and upper edge is unbounded re-scans the partition tail per row
    for (q <- Seq("q_window_fill", "q_window_calc", "q_dynamic_window_calc")) {
      val p = plan(SparkEntry.queries(q)(spark, sf))
      assert(!p.contains("currentrow$(), unboundedfollowing$()") &&
        !"specifiedwindowframe\\((RowFrame|RangeFrame), [-0-9]+, unboundedfollowing"
          .r.findFirstIn(p).isDefined,
        s"$q plans a shrinking frame:\n$p")
    }
  }

  test("bm25 plans a broadcast stats row and a TakeOrdered cutoff") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = graft.llm.CorpusOps.bm25TopK(docs, "text", "doc_id", "spark merge", 10)
    val p = plan(out)
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k must be a TakeOrdered, not a global sort:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"the single stats row must broadcast:\n$p")
  }

  test("exact dedup shuffles the 16-byte digest, not the document text") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = graft.llm.DedupOps.exact(docs, "text", "doc_id")
    val p = plan(out)
    // the exchange partitions on the md5 digest; the raw text column
    // (plan ref "text#<id>") must not appear at or below the shuffle
    assert(p.contains("Exchange hashpartitioning(text_md5"), p)
    val exchangeIdx = p.indexOf("Exchange hashpartitioning")
    assert(!p.substring(exchangeIdx).linesIterator.next().contains("text#"),
      s"full text must not cross the shuffle:\n$p")
    assert(p.contains("partial_min"), s"expected map-side partial agg:\n$p")
  }

  test("capPerKey pre-prunes map-side: partial top-N BEFORE the key exchange") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = graft.llm.CorpusOps.capPerKey(docs, "source", "doc_id", 5)
    val p = plan(out)
    // skew safety: the bounded top-k aggregate must run in PARTIAL mode
    // below the exchange, so a skewed key ships <= k rows per input
    // partition instead of every row to one task (the old row_number
    // window did exactly that)
    assert(!p.contains("row_number"), s"window cap reintroduced:\n$p")
    assert(!p.contains("Exchange rangepartitioning") &&
      !p.contains("Exchange SinglePartition"),
      s"per-key cap must not globally sort:\n$p")
    // NOTE: Catalyst collapses the `col(keyCol).as("__capkey")` alias back
    // to the source attribute in the physical plan, so the exchange prints
    // `hashpartitioning(source#…)` — anchor on the generic exchange, not
    // the alias name
    val exchangeIdx = p.indexOf("Exchange hashpartitioning(")
    assert(exchangeIdx >= 0, s"expected one key exchange:\n$p")
    assert(p.substring(exchangeIdx).contains("partial_bounded_top_k_sorted"),
      s"expected a map-side partial bounded top-k below the exchange:\n$p")
  }

  test("tfidf/unigram vocabulary joins carry no mandatory broadcast hint") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // with the auto-broadcast threshold off, an UNHINTED vocab join must
    // degrade to a shuffle join — a surviving BroadcastHashJoin would mean
    // a forced broadcast() of the corpus-sized document-frequency/unigram
    // table, which is a driver-OOM bomb at web scale. The single-row stats
    // (nDocs/total) keep their hint and plan as BroadcastNestedLoopJoin,
    // which is allowed here.
    val restore = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      for (out <- Seq(
          graft.llm.CorpusOps.tfidfTopK(docs, "text", "doc_id"),
          graft.llm.CorpusOps.unigramLogProb(docs, "text", "doc_id"))) {
        val p = plan(out)
        assert(!p.contains("BroadcastHashJoin"),
          s"vocabulary-sized side must not force-broadcast:\n$p")
        assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
          s"expected a shuffle join on the token:\n$p")
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", restore)
  }

  test("decontaminateFuzzy broadcasts the benchmark side; corpus joins by bucket") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val bench = docs.filter(col("doc_id") % 20 === 0)
      .select(col("doc_id") + 1000000L as "doc_id", col("text"))
    val out = graft.llm.CorpusOps.decontaminateFuzzy(docs, bench,
      "text", "doc_id", threshold = 0.5)
    val p = plan(out)
    assert(p.contains("BroadcastHashJoin"), s"bench side should broadcast:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"candidates must form by bucket only:\n$p")
  }

  test("jaccardPairsExact joins on the shared shingle, never all-pairs") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = graft.llm.DedupOps.jaccardPairsExact(docs, "text", "doc_id",
      shingleK = 3, threshold = 0.4)
    val p = plan(out)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"ground truth must use the inverted index, not all-pairs:\n$p")
    assert(p.contains("hashpartitioning(g#") || p.contains("SortMergeJoin") ||
      p.contains("BroadcastHashJoin"), s"expected an equi-join on the shingle:\n$p")
  }

  test("$scoreFusion: minMax stats broadcast; no rank window in the plan") {
    val out = pipeline.run(orders,
      """[{"$addFields": {"_id": "$o_orderkey"}},
          {"$scoreFusion": {"input": {"pipelines": {
             "price": [{"$score": {"score": "$o_totalprice"}}],
             "prio":  [{"$score": {"score": {"$strLenCP": "$o_orderpriority"}}}]},
             "normalization": "minMaxScaler"},
            "combination": {"weights": {"price": 2}}}}]""")
    val p = plan(out)
    // each pipeline's min/max is ONE broadcast row — never a Window over
    // the stream (the $rankFusion rank window is what forces boundedness
    // there; score fusion must not inherit it)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"minMax stats should broadcast:\n$p")
    assert(!p.contains("Window"), s"score fusion must not plan a window:\n$p")
  }

  test("deterministicShuffle: range-partitioned sort, broadcast offsets, no window") {
    val docs = spark.read.parquet(s"$sf/documents.parquet").select("doc_id")
    val out = graft.llm.CorpusOps.deterministicShuffle(docs, "doc_id", "s", 4)
    val p = plan(out)
    assert(p.contains("BroadcastHashJoin"),
      s"per-partition offsets should broadcast-join:\n$p")
    assert(!p.contains("Window"),
      s"global positions must come from offsets, not a window:\n$p")
    assert(!p.contains("SinglePartition"),
      s"no single-partition stage in the shuffle path:\n$p")
  }

  test("BPE pair counting: map-side partial aggregate before the exchange") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    import spark.implicits._
    // the per-round argmax frame: pairs exploded from the word vocab,
    // weighted count, top-1 — partial_sum must run before the shuffle
    val words = docs
      .select(explode(split(col("text"), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .as[(String, Long)]
      .map { case (w, c) => (w.map(_.toString): Seq[String], c) }
    val top = words.flatMap { case (toks, c) =>
      toks.zip(toks.drop(1)).map { case (a, b) => (a, b, c) }
    }.toDF("l", "r", "c").groupBy("l", "r").agg(sum("c").as("wt"))
      .orderBy(col("wt").desc, col("l"), col("r")).limit(1)
    val p = plan(top)
    assert(p.contains("partial_sum") || p.contains("Partial"),
      s"pair counts need a map-side partial phase:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"argmax should be a TakeOrdered, not a global sort:\n$p")
  }

  test("gopherC4Rules is one shuffle-free codegen scan") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = plan(graft.llm.TextOps.gopherC4Rules(docs, "text"))
    assert(!p.contains("Exchange"), s"rule filters must not shuffle:\n$p")
    // executedPlan.toString renders whole-stage codegen as "*(n)" prefixes
    assert(p.contains("*("), s"rules must codegen:\n$p")
  }

  test("dsirSelect: the only exchange is GlobalRank's range partition") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = graft.llm.CorpusOps.dsirSelect(docs,
      docs.filter(col("lang") === "en"), "doc_id", "text", buckets = 16)
    val p = plan(out)
    val exchanges = p.linesIterator.count(_.trim.startsWith("Exchange"))
    // scoring itself joins nothing; GlobalRank contributes the single
    // rangepartitioning exchange (its localCheckpoint hides it from this
    // plan — accept 0 or 1, but NEVER a SinglePartition funnel or a join)
    assert(exchanges <= 1, s"DSIR must not add exchanges beyond the rank:\n$p")
    assert(!p.contains("SinglePartition"), s"no global funnel:\n$p")
    assert(!p.contains("Join"), s"scoring must not join:\n$p")
  }

  test("nbTrainScore inference: no join, no exchange, broadcast weights") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val labeled = docs.filter(col("doc_id") % 3 === 0)
      .withColumn("lab", col("lang") === "en")
    val out = graft.llm.CorpusOps.nbTrainScore(docs, labeled,
      "doc_id", "text", "lab", buckets = 16)
    val p = plan(out)
    assert(!p.contains("Exchange"), s"NB inference is a pure scan:\n$p")
    assert(!p.contains("Join"), s"NB inference must not join:\n$p")
  }

  test("bigramLogProb: n-gram tables join WITHOUT a mandatory broadcast hint") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val out = graft.llm.CorpusOps.bigramLogProb(docs, "text", "doc_id")
    val op = out.queryExecution.optimizedPlan.toString
    // corpus-derived vocab tables must leave the join strategy to AQE; only
    // the single-row total may carry a hint (exactly one broadcast of it)
    val hints = "ResolvedHint".r.findAllIn(op).length
    assert(hints <= 1, s"only the single-row total may be hinted:\n$op")
  }

  test("chunkSentences is doc-local: no exchange") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = plan(graft.llm.TextOps.chunkSentences(docs, "doc_id", "text", 40))
    assert(!p.contains("Exchange"), s"chunking must stay per-doc:\n$p")
  }

  test("decodeVideoFrames/synthAvi plan has no exchange before aggregation") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val media = graft.llm.MultimodalOps.synthAvi(
      docs.filter(col("doc_id") < 4), "doc_id", 24, 16, nFrames = 2)
    val p = plan(graft.llm.MultimodalOps.decodeVideoFrames(media))
    assert(!p.contains("Exchange"), s"decode is map-only:\n$p")
  }

  test("pcaProject/removeTop are map-side against the broadcast basis: no exchange") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val pProj = plan(graft.llm.PcaOps.pcaProject(
      emb, "vec_id", "embedding", 64, r = 4, whiten = true))
    assert(!pProj.contains("Exchange"), s"projection must not shuffle:\n$pProj")
    val pAbtt = plan(graft.llm.PcaOps.removeTop(
      emb, "vec_id", "embedding", 64, r = 2))
    assert(!pAbtt.contains("Exchange"), s"ABTT must not shuffle:\n$pAbtt")
  }

  test("canonicalizeUrl is a shuffle-free scan; urlDedup ships only digests") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val urls = docs.select(col("doc_id"),
      graft.llm.TextOps.synthUrl(col("doc_id")).as("url"))
    val pCanon = plan(urls.withColumn("canon",
      graft.llm.TextOps.canonicalizeUrl(col("url"))))
    assert(!pCanon.contains("Exchange"),
      s"canonicalization must not shuffle:\n$pCanon")
    val pDedup = plan(graft.llm.TextOps.urlDedup(urls, "doc_id", "url"))
    assert(pDedup.contains("Exchange hashpartitioning(_groupingexpression"),
      s"dedup partitions on the computed md5 grouping key:\n$pDedup")
    assert(pDedup.contains("partial_count"),
      s"map-side combine must run before the exchange:\n$pDedup")
    assert(!pDedup.contains("Exchange SinglePartition"),
      s"no single-partition collapse:\n$pDedup")
  }

  test("tokenizer encodes are shuffle-free broadcast-vocab scans") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val pWp = plan(graft.llm.BpeOps.wordpieceEncode(docs, "text",
      Seq("a", "b", "##a", "##b")))
    assert(!pWp.contains("Exchange"),
      s"wordpiece encode must not shuffle:\n$pWp")
    val pUm = plan(graft.llm.UnigramOps.encode(docs, "text",
      Map("a" -> -1.0, "b" -> -2.0), 4))
    assert(!pUm.contains("Exchange"),
      s"unigram encode must not shuffle:\n$pUm")
  }

  test("weightedSample: partial top-k before one exchange, no global sort") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = plan(graft.llm.CorpusOps.weightedSample(docs, "doc_id",
      graft.llm.TextOps.tokenCount(org.apache.spark.sql.functions.col("text")),
      10))
    // scoring is scan-local; only BoundedTopK partials (≤ k rows per
    // partition) reach the single final-agg exchange
    assert(!p.contains("Sort "), s"no global sort:\n$p")
    // tree prints top-down: final agg, ONE exchange, partial agg below it
    val firstAgg = p.indexOf("ObjectHashAggregate")
    val exchange = p.indexOf("Exchange")
    val partial = p.indexOf("ObjectHashAggregate", exchange)
    assert(firstAgg >= 0 && exchange > firstAgg && partial > exchange,
      s"partial top-k must run below the exchange:\n$p")
  }

  test("cmsHeavyHitters: sketch and candidates join as broadcasts") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = plan(graft.llm.CorpusOps.cmsHeavyHitters(docs, "text", 4, 64, 5))
    // the depth×width grid and the seed spine are both tiny by
    // construction — the point-query join must never shuffle them
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoop"),
      s"sketch point queries must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"no sort-merge join in the point-query path:\n$p")
  }

  test("sourceOverlap shuffles md5 digests, never gram text") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = plan(graft.llm.CorpusOps.sourceOverlap(docs, "text", "source", 5))
    // the corpus-sized exchange is the distinct on (source, digest) —
    // the md5 is computed below it, so only 16-byte digests cross
    assert(p.contains("Exchange hashpartitioning(__src") &&
      p.contains("__d"), s"distinct must partition on (src, digest):\n$p")
    assert(p.contains("md5"), s"digesting must happen in the scan stage:\n$p")
    assert(!p.contains("Exchange SinglePartition"),
      s"no single-partition collapse:\n$p")
  }

}
