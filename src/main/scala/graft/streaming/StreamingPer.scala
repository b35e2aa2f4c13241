package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming `$per` with the reference's TIMEOUT flush (Per.java:27-49):
  * buffer `amount` `(key, doc)` messages into one `{as: [docs]}` message; a
  * PARTIAL buffer flushes after `timeoutMs` of processing time without
  * reaching `amount`. Expressed as a `flatMapGroupsWithState`
  * processing-time timer over Spark's state store — the batch engine's
  * `$per` (graft.Sinks.per) cannot flush on time because a bounded batch
  * has no "later"; this operator is the streaming answer.
  *
  * One state group per `groupOf(key)` — default a SINGLE pipeline-instance
  * group, matching the reference's per-consumer batching
  * (Pipeline.java:140-145). At scale pass e.g. the Kafka partition id as
  * `groupOf`: state per group is bounded by `amount` buffered docs either
  * way, so the state store never grows with the stream.
  *
  * Timer semantics: Spark fires processing-time timeouts on the next
  * trigger after the deadline (no mid-batch preemption), so an idle stream
  * needs a periodic trigger (e.g. `Trigger.ProcessingTime`) for the flush
  * to materialize — same behavior as any GroupStateTimeout user.
  *
  * The flush deadline is anchored to when buffering STARTED (the
  * reference's `Per(amount, timeout)`, Per.java:40-48): state carries a
  * first-buffered-at timestamp and every invocation re-arms the timer with
  * the REMAINING time to that deadline (Spark clears a group's timeout on
  * each invocation, so the duration must be re-set — but from the anchor,
  * not from "now"). Without the anchor, a steady trickle slower than
  * `amount` per window pushes the deadline forever and the partial batch
  * never flushes.
  */
object StreamingPer {

  def per(df: DataFrame, amount: Int, as: String, timeoutMs: Long,
      groupOf: String => String = _ => ""): DataFrame = {
    require(amount > 0, s"$$per amount must be positive: $amount")
    val spark = df.sparkSession
    import spark.implicits._
    val ds: Dataset[(String, String)] = df
      .select(coalesce(col("key").cast("string"), lit("")).as("key"),
        col("doc").cast("string"))
      .as[(String, String)]
    def emit(docs: Seq[String]): (String, String) =
      (java.util.UUID.randomUUID().toString,
        docs.mkString(s"""{"$as":[""", ",", "]}"))
    ds.groupByKey { case (k, _) => groupOf(k) }
      .flatMapGroupsWithState[(Long, Seq[String]), (String, String)](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (_, rows, state: GroupState[(Long, Seq[String])]) =>
          if (state.hasTimedOut) {
            // timer fired with no new data: flush the partial batch
            val buf = state.getOption.map(_._2).getOrElse(Nil)
            state.remove()
            if (buf.nonEmpty) Iterator.single(emit(buf)) else Iterator.empty
          } else {
            val old = state.getOption
            val buf = old.map(_._2).getOrElse(Nil) ++ rows.map(_._2)
            val chunks = buf.grouped(amount).toList
            val (complete, partial) =
              if (chunks.nonEmpty && chunks.last.size < amount)
                (chunks.dropRight(1), chunks.last)
              else (chunks, Seq.empty[String])
            val now = state.getCurrentProcessingTimeMs()
            // the anchor survives a trickle: only a buffer that started
            // fresh this batch (none carried, or the carried rows all
            // left in a complete chunk) re-bases the deadline
            val firstAt =
              if (old.isDefined && complete.isEmpty) old.get._1 else now
            if (partial.nonEmpty && now - firstAt >= timeoutMs) {
              // deadline already passed: flush the partial NOW. hasTimedOut
              // alone can't be relied on — a trickle where every micro-batch
              // delivers rows means the group always "has data", so the
              // timed-out branch would never run and the partial would
              // starve exactly as an always-re-armed timer does
              state.remove()
              (complete :+ partial).iterator.map(emit)
            } else if (partial.nonEmpty) {
              state.update((firstAt, partial))
              state.setTimeoutDuration(math.max(1L, firstAt + timeoutMs - now))
              complete.iterator.map(emit)
            } else {
              state.remove()
              complete.iterator.map(emit)
            }
          }
      }.toDF("key", "doc")
  }
}
