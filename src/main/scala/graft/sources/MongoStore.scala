package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** MongoDB-collection [[DocumentStore]] over the MongoDB Spark connector —
  * the production binding for the reference's state and sink collections
  * (Context.java:32 hands every stage a `MongoDatabase`; Merge.java:47-198
  * and Group.java:172-186 read/write collections through it).
  *
  * The connector is addressed by its DataSource NAME (`"mongodb"`), not by
  * classes, so this file compiles and unit-tests without the connector jar
  * on the classpath; at runtime Spark resolves the format from the session's
  * jars and fails with a clear "Failed to find data source: mongodb" if the
  * connector isn't deployed. All connection state is constructor-injected —
  * no globals, no session-level conf mutation — so two stores with
  * different URIs coexist in one session.
  *
  * Option mapping (connector 10.x option names):
  *  - `connection.uri` ← constructor `uri`
  *  - `database`       ← constructor `database`
  *  - `collection`     ← the per-call collection name
  *  - write `idFieldList` ← the `$merge` `on` field list (the connector's
  *    replace/update key, comma-separated) — the same fields
  *    `SinkStages.merge` joins on, so a connector-native upsert and the
  *    engine's full-outer-join merge agree on document identity. `_id`
  *    (the connector default) when `on` is absent, matching Merge.java's
  *    default `on: "_id"`.
  *  - write `operationType` defaults to `replace`: Merge.java's
  *    `whenMatched: "replace"`/`"merge"` distinction is applied by the
  *    engine BEFORE the write (the store receives finished documents), so
  *    document replace is always the correct physical operation.
  *
  * Scale note: `overwrite` truncate-and-load is only used by the
  * batch-oracle path; streaming sinks go through [[upsert]], which maps to
  * the connector's bulk replaceOne-with-upsert — per-batch incremental, no
  * collection rewrite.
  */
final class MongoStore(spark: SparkSession, uri: String, database: String,
    extraOptions: Map[String, String] = Map.empty) extends DocumentStore {

  require(uri.startsWith("mongodb://") || uri.startsWith("mongodb+srv://"),
    s"not a MongoDB connection string: $uri")
  require(database.nonEmpty, "database must be non-empty")

  /** Options for a read of collection `name` (unit-tested plumbing). */
  private[graft] def readOptions(name: String): Map[String, String] =
    Map("connection.uri" -> uri, "database" -> database,
      "collection" -> name) ++ extraOptions

  /** Options for a write to collection `name`; `on` becomes the
    * connector's `idFieldList` replace key (unit-tested plumbing). */
  private[graft] def writeOptions(name: String,
      on: List[String] = Nil): Map[String, String] = {
    val id = if (on.isEmpty) Map.empty[String, String]
      else Map("idFieldList" -> on.mkString(","))
    readOptions(name) ++ Map("operationType" -> "replace") ++ id
  }

  def read(name: String): DataFrame =
    spark.read.format("mongodb").options(readOptions(name)).load()

  def overwrite(name: String, df: DataFrame): Unit =
    df.write.format("mongodb").mode("overwrite")
      .options(writeOptions(name)).save()

  /** Connector-native incremental upsert: replace-by-`on` with insert for
    * missing keys (the streaming `$merge` fast path — no read-modify-write
    * round trip through the engine). */
  def upsert(name: String, df: DataFrame, on: List[String]): Unit =
    df.write.format("mongodb").mode("append")
      .options(writeOptions(name, on)).save()
}
