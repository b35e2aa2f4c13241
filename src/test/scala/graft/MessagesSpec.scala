package graft

import graft.sources.Messages
import org.apache.spark.sql.types._

/** Kafka-message-model adapters: (key, json value) <-> pipeline rows. */
class MessagesSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("_id", StringType), StructField("test", LongType)))

  test("parse -> pipeline -> toJson round-trips the message model") {
    val records = Seq(("k1", """{"_id": "a", "test": 1}"""),
      ("k2", """{"_id": "b", "test": 2}""")).toDF("key", "value")
    val msgs = Messages.parse(records, schema)
    assert(msgs.columns.toSeq == Seq("key", "_id", "test"))
    val out = pipeline.run(msgs,
      """[{"$addFields": {"test": {"$multiply": ["$test", 10]}}},
          {"$setKey": "$test"}]""")
    val back = Messages.toJson(out)
    assert(rows(back) == Set(
      List("10", """{"_id":"a","test":10}"""),
      List("20", """{"_id":"b","test":20}""")))
  }

  test("parseInferred handles heterogeneous schemaless documents") {
    val records = Seq(
      ("k1", """{"_id": "a", "n": 1, "tag": "x"}"""),
      ("k2", """{"_id": "b", "n": 2, "extra": true}""")).toDF("key", "value")
    val rows = Messages.parseInferred(records)
    // union schema: fields from BOTH docs, nulls where missing
    assert(rows.columns.toSet == Set("key", "_id", "n", "tag", "extra"))
    val out = pipeline.run(rows,
      """[{"$match": {"tag": {"$exists": false}}}]""") // missing ≈ null
    assert(out.select("_id").head().getString(0) == "b")
  }

  test("toJson keys by _id when no key column exists") {
    val back = Messages.toJson(Seq(("a", 1L)).toDF("_id", "test"))
    assert(back.head().getString(0) == "a")
  }
}
