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

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("distributed trainer matches the single-node reference merge-for-merge") {
    val texts = docs.select("text").collect().map(_.getString(0)).toSeq
    val want = referenceTrain(texts, numMerges = 12, minCount = 2)
    val got = BpeOps.train(docs, "text", numMerges = 12)
    assert(got == want)
    assert(got.size == 12, "fixture vocabulary should support 12 merges")
  }

  test("production greedy encode equals sequential rank-order replay on trained merges") {
    val merges = BpeOps.train(docs, "text", numMerges = 10)
    val rank = merges.zipWithIndex.toMap
    val words = docs.select("text").collect().flatMap(_.getString(0).split("\\s+"))
      .filter(_.nonEmpty).distinct.toSeq
    words.foreach { w =>
      assert(BpeOps.replayEncodeWord(w, merges) == BpeOps.greedyEncodeWord(w, rank),
        s"word $w")
    }
  }

  test("greedy encode cost is flat in |merges| (replay is not)") {
    // Pad the trained vocabulary to 1k entries with pairs that can never
    // occur (tokens outside the corpus alphabet): the rank MAP grows 100x
    // but the greedy scan never touches it beyond O(1) lookups, while the
    // fold replay walks every rule per word. Equivalence is preserved —
    // absent rules are no-ops in both forms.
    val merges10 = BpeOps.train(docs, "text", numMerges = 10)
    val merges1k = merges10 ++ (0 until 990).map(i => (s"$i", s"$i"))
    val rank10 = merges10.zipWithIndex.toMap
    val rank1k = merges1k.zipWithIndex.toMap
    val words = docs.select("text").collect().flatMap(_.getString(0).split("\\s+"))
      .filter(_.nonEmpty).toSeq
    def time(f: => Unit): Long = { val t0 = System.nanoTime(); f; System.nanoTime() - t0 }
    // warm up JIT on both paths
    words.take(500).foreach { w =>
      BpeOps.greedyEncodeWord(w, rank1k); BpeOps.replayEncodeWord(w, merges1k)
    }
    val tGreedy10 = time(words.foreach(BpeOps.greedyEncodeWord(_, rank10)))
    val tGreedy1k = time(words.foreach(BpeOps.greedyEncodeWord(_, rank1k)))
    val tReplay1k = time(words.foreach(BpeOps.replayEncodeWord(_, merges1k)))
    words.take(50).foreach { w =>
      assert(BpeOps.greedyEncodeWord(w, rank1k) == BpeOps.replayEncodeWord(w, merges1k))
    }
    info(f"greedy@10=${tGreedy10 / 1e6}%.1fms greedy@1k=${tGreedy1k / 1e6}%.1fms " +
      f"replay@1k=${tReplay1k / 1e6}%.1fms over ${words.size} words")
    assert(tGreedy1k < tReplay1k,
      "greedy at a 1k vocab must beat the fold replay at the same vocab")
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
