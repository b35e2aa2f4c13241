package graft

import graft.llm.BpeOps
import org.apache.spark.sql.functions._

/** BPE trainer/encoder vs an independent single-node reference
  * implementation (plain Scala maps, no Spark) on real fixture text. */
class BpeSpec extends SparkSpec {

  /** Reference trainer: the textbook formulation — pair counts over the
    * word-frequency map, argmax with (weight desc, pair asc) tie-break. */
  private def referenceTrain(texts: Seq[String], numMerges: Int,
      minCount: Long): Seq[(String, String)] = {
    var vocab: Map[Seq[String], Long] = texts
      .flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) =>
        (w.map(_.toString): Seq[String]) -> ws.size.toLong
      }
    val out = Seq.newBuilder[(String, String)]
    var continue = true
    var k = 0
    while (continue && k < numMerges) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (toks, c) =>
        toks.zip(toks.drop(1)).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + c
        }
      }
      if (counts.isEmpty) continue = false
      else {
        val (pair, wt) = counts.toSeq.minBy { case ((l, r), w) => (-w, l, r) }
        if (wt < minCount) continue = false
        else {
          out += pair
          vocab = vocab.groupMapReduce(
            { case (toks, _) => BpeOps.applyMerge(toks, pair._1, pair._2) })(
            _._2)(_ + _)
        }
      }
      k += 1
    }
    out.result()
  }

  /** Greedy lowest-rank encoder (the classic formulation) — must agree
    * with BpeOps.encode's sequential replay. */
  private def greedyEncode(w: String, merges: Seq[(String, String)]): Seq[String] = {
    val rank = merges.zipWithIndex.toMap
    var toks: Seq[String] = w.map(_.toString)
    var go = true
    while (go && toks.length > 1) {
      val best = toks.zip(toks.drop(1)).flatMap(p => rank.get(p).map(p -> _))
        .sortBy(_._2).headOption
      best match {
        case Some(((l, r), _)) => toks = BpeOps.applyMerge(toks, l, r)
        case None => go = true; return toks
      }
    }
    toks
  }

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("distributed trainer matches the single-node reference merge-for-merge") {
    val texts = docs.select("text").collect().map(_.getString(0)).toSeq
    val want = referenceTrain(texts, numMerges = 12, minCount = 2)
    val got = BpeOps.train(docs, "text", numMerges = 12)
    assert(got == want)
    assert(got.size == 12, "fixture vocabulary should support 12 merges")
  }

  test("sequential-replay encode equals greedy lowest-rank encode") {
    val merges = BpeOps.train(docs, "text", numMerges = 10)
    val words = docs.select("text").collect().flatMap(_.getString(0).split("\\s+"))
      .filter(_.nonEmpty).distinct.toSeq
    words.foreach { w =>
      val replay = merges.foldLeft(w.map(_.toString): Seq[String]) {
        case (t, (l, r)) => BpeOps.applyMerge(t, l, r)
      }
      assert(replay == greedyEncode(w, merges), s"word $w")
    }
  }

  test("encode reconstructs the text: concatenated tokens == words in order") {
    val merges = BpeOps.train(docs, "text", numMerges = 8)
    val enc = BpeOps.encode(docs.limit(50), "text", merges)
      .select(col("doc_id"), concat_ws("", col("bpe")).as("joined"),
        regexp_replace(col("text"), "\\s+", "").as("flat"))
      .collect()
    enc.foreach(r => assert(r.getString(1) == r.getString(2)))
  }
}
