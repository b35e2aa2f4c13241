package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.llm.DedupOps

/** Streaming MinHash-LSH near-duplicate detection with BOUNDED state — the
  * arrival-time twin of [[graft.llm.DedupOps.dedupNear]] for an unbounded
  * ingest stream (the reference's deployment shape: documents arrive as
  * messages, cf. `/root/reference/src/main/java/net/pincette/mongo/streams/
  * Pipeline.java:273-299`).
  *
  * Per document: the md5 minhash signature (the [[graft.llm.DedupOps
  * .minhashLshMd5]] hash family, so batch and stream agree bit-for-bit on
  * signatures) and its `bands` band buckets. State is keyed by bucket and
  * holds ONLY the first-arriving document's (id, signature) — one owner per
  * bucket, so state size is bounded by the number of DISTINCT buckets seen,
  * never by the stream length, and each entry is `numHashes` longs.
  *
  * A later arrival landing in an owned bucket is verified against the
  * owner by the standard MinHash estimate (fraction of equal signature
  * components, an unbiased Jaccard estimator); estimates ≥ `threshold`
  * emit a `(doc_id, dup_of, est_jaccard)` verdict in APPEND mode. A doc
  * spanning several owned buckets may emit several verdicts (one per
  * band) — consumers treat "any verdict" as duplicate, exactly like the
  * batch candidate semantics.
  *
  * DOCUMENTED deviations from the batch operator: (1) verification uses
  * the signature ESTIMATE, not exact shingle Jaccard — state stays bounded
  * because shingle sets are never stored; (2) each bucket compares against
  * its first owner only, not all members — the batch operator's connected
  * components collapse transitive chains that streaming sees only
  * pairwise. Within a micro-batch, arrivals process in id order so replay
  * is deterministic.
  */
object StreamingNearDedup {

  /** JVM twin of [[graft.llm.DedupOps.shingles]]: distinct k-token
    * windows of the lowercased text; short docs fall back to the single
    * whole-text shingle. */
  private[graft] def shinglesJvm(text: String, k: Int): Array[String] = {
    val toks = if (text == null) Array.empty[String]
      else text.split("\\s+").iterator.filter(_.nonEmpty)
        .map(_.toLowerCase(java.util.Locale.ROOT)).toArray
    if (toks.length >= k)
      toks.sliding(k).map(_.mkString(" ")).distinct.toArray
    else if (toks.nonEmpty) Array(toks.mkString(" "))
    else Array.empty
  }

  /** Near-dup verdicts `(doc_id, dup_of, est_jaccard)` for a (streaming or
    * batch) `docs` frame. Append-mode safe; no watermark required (state
    * is permanent by design — a corpus index grows for the stream's
    * lifetime; wrap with a TTL'd variant if the domain allows dup windows
    * to expire). */
  def verdicts(docs: DataFrame, textCol: String, idCol: String,
      shingleK: Int = 3, bands: Int = 8, rowsPerBand: Int = 4,
      threshold: Double = 0.5): DataFrame = {
    val numHashes = bands * rowsPerBand
    val spark = docs.sparkSession
    import spark.implicits._
    val hits: Dataset[(String, Long, Array[Long])] = docs
      .select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .flatMap { case (id, text) =>
        val sh = shinglesJvm(text, shingleK)
        if (sh.isEmpty) Iterator.empty
        else {
          val md = java.security.MessageDigest.getInstance("MD5")
          val sig = Array.tabulate(numHashes) { s =>
            var m = Long.MaxValue
            var i = 0
            while (i < sh.length) {
              val h = DedupOps.md5Lower63Jvm(md, s + ":" + sh(i))
              if (h < m) m = h
              i += 1
            }
            m
          }
          (0 until bands).iterator.map { b =>
            (b + ":" + sig.slice(b * rowsPerBand, (b + 1) * rowsPerBand)
              .mkString(","), id, sig)
          }
        }
      }
    hits.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Array[Long]), (Long, Long, Double)](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_, it: Iterator[(String, Long, Array[Long])],
            state: GroupState[(Long, Array[Long])]) =>
          val out = Seq.newBuilder[(Long, Long, Double)]
          var rep = state.getOption
          it.toSeq.sortBy(_._2).foreach { case (_, hid, hsig) =>
            rep match {
              case None =>
                rep = Some((hid, hsig)); state.update((hid, hsig))
              case Some((rid, rsig)) if rid != hid =>
                var eq = 0
                var i = 0
                while (i < numHashes) {
                  if (rsig(i) == hsig(i)) eq += 1
                  i += 1
                }
                // HALF_UP like the batch dedup family's round(...,6), not
                // math.rint's half-even — a batch replay of a streaming
                // verdict must agree on exact .5-ulp boundaries
                val est = BigDecimal(eq.toDouble / numHashes)
                  .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
                if (est >= threshold) out += ((hid, rid, est))
              case _ => ()
            }
          }
          out.result().iterator
      }
      .toDF("doc_id", "dup_of", "est_jaccard")
  }
}
