package graft.streaming

import graft.Pipeline
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Runs a Mongo pipeline over an unbounded (Structured Streaming) DataFrame.
  *
  * Mapping of the reference's infinite-stream semantics
  * (SURVEY.md §2/§3) onto Spark's model:
  *
  *  - stateless stages ($match/$project/$addFields/$unwind/...) apply to the
  *    streaming DataFrame unchanged — Catalyst plans them incrementally;
  *  - `$group` becomes a streaming aggregation in **update** output mode:
  *    one emission per changed key per micro-batch, the documented
  *    approximation of the reference's per-message continuous emission
  *    (Pipeline.java:68-81, SURVEY §2.4). State lives in the Spark state
  *    store (HDFS/RocksDB) instead of a MongoDB collection;
  *  - `$deduplicate` becomes `dropDuplicates` on the expression value —
  *    exact, checkpointed, replacing the reference's Mongo seen-set;
  *  - sink/effect stages (`$merge`, `$send`, ...) cannot run inside an
  *    incremental plan; the pipeline is split at the first sink stage and the
  *    suffix runs per micro-batch via `foreachBatch`, which is exactly the
  *    reference's at-least-once micro-batched side-effect model (retries =
  *    checkpoint replay instead of retry-forever, SURVEY §3).
  */
final class StreamingPipeline(pipeline: Pipeline) {

  private[graft] def split(pipelineJson: String): (JValue, JValue) =
    StreamSplit.split(pipelineJson)

  /** Transform the streaming frame with the native prefix. The caller owns
    * the writeStream; use [[start]] for the full pipeline incl. sinks. */
  def run(stream: DataFrame, pipelineJson: String): DataFrame = {
    val (native, rest) = split(pipelineJson)
    require(rest == JArray(Nil),
      s"pipeline contains sink or batch-only stages — use start(): $rest")
    pipeline.run(stream, native)
  }

  /** True when the native prefix contains a `_continuous: true` `$group` —
    * that compiles to flatMapGroupsWithState(Append), which Spark only allows
    * in an append-output-mode query. */
  private[graft] def hasContinuousGroup(native: JValue): Boolean = native match {
    case JArray(stages) => stages.exists {
      case JObject(fields) => fields.exists { case (n, spec) =>
        n == "$group" && (spec \ "_continuous") == JBool(true)
      }
      case _ => false
    }
    case _ => false
  }

  /** Run the whole pipeline: native prefix on the stream, sink suffix (if
    * any) + `collect` callback per micro-batch. Update output mode so `$group`
    * emits per changed key per batch — except when the prefix holds a
    * `_continuous` `$group` (flatMapGroupsWithState), which Spark requires to
    * run in append mode; `outputMode` overrides the choice explicitly.
    *
    * @param batchGuard optional [[BatchGuard]]: skips the sink suffix for
    *        micro-batches already processed before a crash/restart, turning
    *        checkpoint-replay at-least-once into effectively-once for the
    *        side effects (the reference is plain at-least-once — retries may
    *        re-send; SURVEY §2.8).
    */
  def start(stream: DataFrame, pipelineJson: String,
      collect: DataFrame => Unit,
      trigger: Trigger = Trigger.AvailableNow(),
      checkpoint: Option[String] = None,
      batchGuard: Option[BatchGuard] = None,
      outputMode: Option[String] = None): StreamingQuery = {
    val (native, rest) = split(pipelineJson)
    val transformed = pipeline.run(stream, native)
    val mode = outputMode.getOrElse(
      if (hasContinuousGroup(native)) "append" else "update")
    val writer: DataStreamWriter[Row] = transformed.writeStream
      .outputMode(mode)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batchGuard match {
          case Some(g) => g.once(batchId) { collect(pipeline.run(batch, rest)) }
          case None    => collect(pipeline.run(batch, rest))
        }
      }
    checkpoint.fold(writer)(c => writer.option("checkpointLocation", c)).start()
  }
}

object StreamingPipeline {

  /** Spark's RocksDB state store provider (in sql/core since 3.2; the
    * rocksdbjni native lib ships with the Spark distribution). */
  val RocksDBProvider: String =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Run `body` with the session's state store provider switched (restored
    * after). The provider is a session conf captured when a streaming query
    * STARTS, so this scopes correctly around query construction + start.
    *
    * When to switch: the default HDFSBackedStateStoreProvider keeps every
    * key's state in executor HEAP (one in-memory map per store, snapshots
    * to the checkpoint dir). For `$group`/`$deduplicate`/near-dedup state
    * at 100 TB input — easily 10⁸–10⁹ keys — that heap residency is the
    * scale killer; RocksDB keeps the working set off-heap on local SSD
    * with block-cache reads, bounding heap at O(cache), not O(keys). Rule
    * of thumb (measured in RocksDBStateSpec at toy scale, extrapolated):
    * prefer RocksDB beyond ~10⁶ keys per executor or when state-size ×
    * replay-window no longer fits the executor heap. */
  def withStateStoreProvider[T](spark: org.apache.spark.sql.SparkSession,
      provider: String)(body: => T): T = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(key)
    spark.conf.set(key, provider)
    try body
    finally before match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }
}

/** Where to cut a pipeline for Structured Streaming — shared by the typed
  * and the dynamic (schemaless) streaming runners. */
private[streaming] object StreamSplit {

  private val sinkStages =
    Set("$merge", "$out", "$delete", "$send", "$delay", "$probe", "$per", "$http")

  /** Stages Spark cannot run natively on an unbounded stream (windows,
    * global sorts, gap generation, stream-static union, facets). They split
    * the pipeline like a sink does: everything from the first one on runs
    * inside foreachBatch, i.e. with PER-MICRO-BATCH semantics — windows and
    * sorts see one batch at a time, which is the only meaning they can have
    * on an infinite input. */
  private val batchOnlyStages = Set("$setWindowFields", "$fill", "$densify",
    "$sort", "$limit", "$skip", "$sample", "$sortByCount", "$unionWith",
    "$facet", "$graphLookup", "$bucketAuto", "$vectorSearch", "$documents",
    "$rankFusion", "$search", "$geoNear")

  private def stageName(stage: JValue): String = stage match {
    case JObject(fields) => fields.collectFirst {
      case (n, _) if n != "_trace" => n
    }.getOrElse("")
    case _ => ""
  }

  /** Split the pipeline: longest prefix with no sink / batch-only stage
    * (runs natively on the stream), and the remainder (runs per
    * micro-batch in foreachBatch). */
  def split(pipelineJson: String): (JValue, JValue) = {
    val JArray(stages) = (JsonMethods.parse(pipelineJson): @unchecked)
    val (native, rest) = stages.span(s => !sinkStages.contains(stageName(s)) &&
      !batchOnlyStages.contains(stageName(s)))
    (JArray(native), JArray(rest))
  }
}

/** The dynamic (schemaless) counterpart of [[StreamingPipeline]]: runs a
  * `(key, doc)` JSON stream through [[graft.dynamic.DynPipeline]] with the
  * same split rule — stateless/group prefix natively (update mode), sink
  * and batch-only suffix per micro-batch in foreachBatch. */
final class DynStreamingPipeline(
    ctx: graft.dynamic.DynPipeline.DynCtx = graft.dynamic.DynPipeline.DynCtx()) {

  import graft.dynamic.DynPipeline

  /** Transform the streaming frame with the native prefix. The caller owns
    * the writeStream; use [[start]] for the full pipeline incl. sinks. */
  def run(stream: DataFrame, pipelineJson: String): DataFrame = {
    val (native, rest) = StreamSplit.split(pipelineJson)
    require(rest == JArray(Nil),
      s"pipeline contains sink or batch-only stages — use start(): $rest")
    DynPipeline.run(stream, native, ctx)
  }

  def start(stream: DataFrame, pipelineJson: String,
      collect: DataFrame => Unit,
      trigger: Trigger = Trigger.AvailableNow(),
      checkpoint: Option[String] = None,
      batchGuard: Option[BatchGuard] = None,
      outputMode: String = "update"): StreamingQuery = {
    val (native, rest) = StreamSplit.split(pipelineJson)
    val transformed = DynPipeline.run(stream, native, ctx)
    val writer: DataStreamWriter[Row] = transformed.writeStream
      .outputMode(outputMode)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batchGuard match {
          case Some(g) => g.once(batchId) { collect(DynPipeline.run(batch, rest, ctx)) }
          case None    => collect(DynPipeline.run(batch, rest, ctx))
        }
      }
    checkpoint.fold(writer)(c => writer.option("checkpointLocation", c)).start()
  }
}

/** File-marker idempotence for foreachBatch side effects: a batch id runs its
  * effect once; replays (checkpoint recovery) are skipped. The marker commits
  * AFTER the effect — a crash between effect and marker re-runs the batch,
  * so downstream writes should be idempotent per batch (same guarantee as
  * Spark's own file sinks). */
final class BatchGuard(dir: String) {
  java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))

  private def marker(batchId: Long) =
    java.nio.file.Paths.get(dir, s"batch-$batchId.done")

  def once(batchId: Long)(effect: => Unit): Unit =
    if (!java.nio.file.Files.exists(marker(batchId))) {
      effect
      java.nio.file.Files.createFile(marker(batchId))
    }
}
