package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Abstraction over the reference's MongoDB collections (`$merge`/`$out`/
  * `$delete`/`$lookup` targets — Context.java:32, SURVEY.md §2.6). On a real
  * cluster this would be the MongoDB Spark connector or a lakehouse table;
  * locally it is parquet directories or memory. */
trait DocumentStore {
  def read(name: String): DataFrame
  def overwrite(name: String, df: DataFrame): Unit
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
