package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Abstraction over the reference's MongoDB collections (`$merge`/`$out`/
  * `$delete`/`$lookup` targets — Context.java:32, SURVEY.md §2.6). On a real
  * cluster this would be the MongoDB Spark connector or a lakehouse table;
  * locally it is parquet directories or memory. */
trait DocumentStore {
  def read(name: String): DataFrame
  def overwrite(name: String, df: DataFrame): Unit

  /** Some(n) when collection `name` is hash-bucketed on exactly the `on`
    * COLUMNS, was last written under the same semantic `keySpec`, and
    * supports incremental bucket replacement; None = sinks fall back to
    * read-all/overwrite-all (always correct, just not pruned).
    *
    * `keySpec` exists because a derived key column's NAME doesn't pin its
    * MEANING: the dynamic engine hashes one `__on` column whose values
    * depend on the stage's on-field list, so a collection last bucketed
    * under `on: ["_id"]` must NOT serve pruned bucket reads to a stage
    * running `on: ["a","b"]` (round-12 advisor find — the stored __bucket
    * hashes would select the wrong subset). `null` keySpec defaults to the
    * column list itself, which is the right identity for typed collections
    * whose key columns are the semantic key. */
  def bucketing(name: String, on: List[String], keySpec: String = null): Option[Int] = None

  /** Rows of just the given buckets (partition-pruned on bucketed stores). */
  def readBuckets(name: String, touched: Seq[Int]): DataFrame = read(name)

  /** Incremental write: `rows` must carry a `__bucket` column; buckets in
    * `touched` are REPLACED by their rows, buckets present only in `rows`
    * are APPENDED (merge-on-read). */
  def replaceBuckets(name: String, touched: Seq[Int], rows: DataFrame): Unit =
    throw new UnsupportedOperationException(s"$name: not a bucketed store")
}

object DocumentStore {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{col, hash, lit, pmod}

  /** THE bucket function — sinks and bucketed stores must agree on it
    * (Murmur3 is stable across sessions, so bucketed data is durable). */
  def bucketColumn(on: Seq[String], numBuckets: Int): Column =
    pmod(hash(on.map(col): _*), lit(numBuckets))
}

/** Parquet-directory store with versioned writes: `overwrite` lands in a new
  * version directory and flips the pointer, so a plan lazily reading the old
  * version is never clobbered mid-read (Spark cannot overwrite a path it is
  * scanning). */
final class ParquetStore(spark: SparkSession, base: String) extends DocumentStore {
  private val versions = scala.collection.concurrent.TrieMap.empty[String, Int]

  private def path(name: String, v: Int) = s"$base/$name/v$v"

  def seed(name: String, df: DataFrame): Unit = overwrite(name, df)

  def read(name: String): DataFrame = {
    val v = versions.getOrElse(name,
      throw new IllegalArgumentException(s"no such collection: $name"))
    spark.read.parquet(path(name, v))
  }

  def overwrite(name: String, df: DataFrame): Unit = {
    val next = versions.getOrElse(name, -1) + 1
    df.write.mode("overwrite").parquet(path(name, next))
    versions(name) = next
  }
}

/** Driver-memory store for tests (collects rows eagerly). */
final class InMemoryStore(spark: SparkSession) extends DocumentStore {
  private val tables =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  def read(name: String): DataFrame = tables(name)

  def overwrite(name: String, df: DataFrame): Unit = {
    val rows = df.collect().toIndexedSeq
    tables(name) = spark.createDataFrame(
      new java.util.ArrayList(scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava),
      df.schema)
  }
}
