package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Adapters between the reference's message model — (key: String,
  * value: JsonObject) Kafka records (net.pincette.rs.streams.Message,
  * Stage.java:16-17) — and this engine's row model (one column per top-level
  * document field, plus an optional `key` column).
  *
  * A Kafka source lands as a DataFrame with `key`/`value` binary or string
  * columns (`spark.read/readStream.format("kafka")`); [[parse]] turns it into
  * pipeline rows, [[toJson]] turns pipeline output back into producible
  * records. Works identically on batch and streaming frames.
  */
object Messages {

  /** (key string, value json-string) records -> (key, <fields...>) rows. */
  def parse(records: DataFrame, schema: StructType): DataFrame = {
    val parsed = records.select(
      col("key").cast("string").as("key"),
      from_json(col("value").cast("string"), schema).as("__doc"))
    parsed.select((col("key") +:
      schema.fieldNames.toIndexedSeq.map(f => col("__doc").getField(f).as(f))): _*)
  }

  /** Schemaless ingestion (SURVEY §1: "schema_of_json-style inference at
    * pipeline build time"): infer one unioned schema from the batch of JSON
    * values, then parse. Heterogeneous documents land in the union schema
    * with nulls for fields they lack — matching the engine's missing≈null
    * semantics. (Batch only: streaming needs a declared schema, like every
    * Spark streaming source.) */
  def parseInferred(records: DataFrame): DataFrame = {
    val spark = records.sparkSession
    import spark.implicits._
    val values = records.select(col("value").cast("string").as("value")).as[String]
    val inferred = spark.read.json(values).schema
    parse(records, inferred)
  }

  /** Pipeline rows -> (key, value json-string) records; key defaults to the
    * document `_id` (Base.java:54-57 behavior) when no key column exists. */
  def toJson(df: DataFrame): DataFrame = {
    val docCols = df.columns.filter(_ != "key")
    val keyCol =
      if (df.columns.contains("key")) col("key")
      else if (df.columns.contains("_id")) col("_id").cast("string")
      else expr("uuid()")
    df.select(keyCol.as("key"),
      to_json(struct(docCols.map(col).toIndexedSeq: _*)).as("value"))
  }

  /** (key, value, topic) producible records for a `$send`/`$delay`-shaped
    * batch: the `__topic` routing column SinkStages emits (when present)
    * becomes the per-record target topic, null routes fall back to
    * `defaultTopic`, and the remaining doc columns serialize into `value`.
    * Shared by every transport binding ([[graft.sources.KafkaBus]],
    * [[graft.sources.FileBus]]) so one produce call fans out across target
    * topics exactly like the reference's
    * `producer.send(new ProducerRecord(topic, …))` (Context.java:32). */
  def routed(batch: DataFrame, defaultTopic: String): DataFrame = {
    val route =
      if (batch.columns.contains("__topic"))
        coalesce(col("__topic").cast("string"), lit(defaultTopic))
      else lit(defaultTopic)
    val docCols = batch.columns.filterNot(c => c == "key" || c == "__topic")
    val keyCol =
      if (batch.columns.contains("key")) col("key").cast("string")
      else if (docCols.contains("_id")) col("_id").cast("string")
      else expr("uuid()")
    batch.select(keyCol.as("key"),
      to_json(struct(docCols.map(col).toIndexedSeq: _*)).as("value"),
      route.as("topic"))
  }
}
