package graft

import graft.streaming.StreamingPipeline
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Batch ↔ streaming CONFORMANCE MATRIX (the reference is streaming-first —
  * `Pipeline.java:31-32` — so every stage the typed/dynamic engines run
  * natively on a stream must produce exactly the batch answer on the same
  * input). One harness per engine drives EVERY natively-streamable stateless
  * stage, plus `$unwind` and stream-static `$lookup`, through `readStream`
  * split across two micro-batches, and compares the multiset of output
  * documents against the batch run of the identical pipeline. The stateful
  * set is covered by dedicated StreamingSpec scenarios ($group restart,
  * $deduplicate TTL, composed dedup→group→merge restart, near-dedup restart)
  * and by the `$per` checkpoint-restart case here.
  *
  * README.md's "Batch vs streaming per stage" table is the prose twin of
  * this matrix. */
class StreamingMatrixSpec extends SparkSpec {
  import spark.implicits._

  // one input rich enough for every stateless stage: ids, a groupable
  // string WITH a null, a numeric, an array (incl. empty — $unwind's drop
  // rule), and a struct added identically on both paths
  private val docs: Seq[(String, String, Long, Seq[Long])] = Seq(
    ("0", "a", 1L, Seq(1L, 2L)),
    ("1", "b", 2L, Seq(3L)),
    ("2", "a", 3L, Seq.empty),
    ("3", null, 4L, Seq(7L, 8L)))
  private def prep(df: DataFrame): DataFrame =
    df.withColumn("sub", struct(col("g").as("x"), col("v").as("y")))

  private def lookupCatalog = Seq(("a", 10L), ("b", 20L)).toDF("_id", "w")
  private def lookPipeline = new Pipeline(catalog = _ => lookupCatalog)

  /** Multiset of output docs (JSON) from the STREAM run: two micro-batches
    * through StreamingPipeline.start, update mode, all emissions kept. */
  private def streamOut(json: String, p: Pipeline): Map[String, Int] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String, Long, Seq[Long])]
    val out = scala.collection.mutable.Buffer.empty[String]
    input.addData(docs.take(2): _*)
    val q = new StreamingPipeline(p).start(
      prep(input.toDF().toDF("_id", "g", "v", "arr")), json,
      df => out.synchronized { out ++= df.toJSON.collect() },
      trigger = Trigger.ProcessingTime(0))
    try {
      q.processAllAvailable()
      input.addData(docs.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()
    out.groupBy(identity).map { case (k, v) => (k, v.size) }
  }

  private def batchOut(json: String, p: Pipeline): Map[String, Int] =
    p.run(prep(docs.toDF("_id", "g", "v", "arr")), json).toJSON.collect()
      .groupBy(identity).map { case (k, v) => (k, v.size) }

  private def conform(name: String, json: String,
      p: => Pipeline = pipeline): Unit =
    test(s"typed stream ≡ batch: $name") {
      val b = batchOut(json, p)
      val s = streamOut(json, p)
      assert(s == b, s"\nstream=$s\nbatch =$b")
    }

  // ---- every natively-streamable stateless stage, typed engine ----------
  conform("$addFields", """[{"$addFields": {"w": {"$add": ["$v", 1]}}}]""")
  conform("$set", """[{"$set": {"g2": {"$toUpper": "$g"}}}]""")
  conform("$project", """[{"$project": {"_id": 1, "v": 1}}]""")
  conform("$unset", """[{"$unset": "sub"}]""")
  conform("$replaceWith", """[{"$replaceWith": "$sub"}]""")
  conform("$replaceRoot", """[{"$replaceRoot": {"newRoot": "$sub"}}]""")
  conform("$redact",
    """[{"$redact": {"$cond": [{"$gte": ["$v", 2]}, "$$KEEP", "$$PRUNE"]}}]""")
  conform("$setKey", """[{"$setKey": "$g"}]""")
  conform("$jslt", """[{"$jslt": "{\"_id\": ._id, \"w\": .v}"}]""")
  conform("$jq", """[{"$jq": "select(.v > 1) | {_id, v}"}]""")
  conform("$trace", """[{"$trace": {}}, {"$unset": "sub"}]""")
  conform("$match", """[{"$match": {"v": {"$gte": 2}}}]""")
  conform("$match null/missing", """[{"$match": {"g": null}}]""")
  conform("$unwind", """[{"$unwind": "$arr"}]""")
  conform("$unwind preserve+index",
    """[{"$unwind": {"path": "$arr", "includeArrayIndex": "i",
                     "preserveNullAndEmptyArrays": true}}]""")
  conform("stream-static $lookup (array form)",
    """[{"$lookup": {"from": "c", "localField": "g",
                     "foreignField": "_id", "as": "m"}}]""", lookPipeline)
  conform("stream-static $lookup (unwind inner)",
    """[{"$lookup": {"from": "c", "localField": "g", "foreignField": "_id",
                     "as": "m", "unwind": true, "inner": true}}]""",
    lookPipeline)
  conform("composed stateless chain",
    """[{"$addFields": {"w": {"$multiply": ["$v", 2]}}},
        {"$match": {"w": {"$gte": 2}}},
        {"$unwind": "$arr"},
        {"$project": {"_id": 1, "w": 1, "arr": 1}}]""")

  // ---- the same matrix on the DYNAMIC (schemaless) engine ----------------
  private val dynDocs = Seq(
    """{"_id":"0","g":"a","v":1,"arr":[1,2],"sub":{"x":"a","y":1}}""",
    """{"_id":"1","g":"b","v":2,"arr":[3],"sub":{"x":"b","y":2}}""",
    """{"_id":"2","g":"a","v":3,"arr":[],"sub":{"x":"a","y":3}}""",
    """{"_id":"3","g":null,"v":4,"arr":[7,8],"sub":{"x":null,"y":4}}""")

  private def dynStream(json: String): Map[com.fasterxml.jackson.databind.JsonNode, Int] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val out = graft.dynamic.DynPipeline.run(input.toDF().toDF("doc"), json)
    val name = s"dynmatrix${math.abs(json.hashCode)}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      input.addData(dynDocs.take(2): _*)
      q.processAllAvailable()
      input.addData(dynDocs.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()
    spark.sql(s"select doc from $name").collect()
      .map(r => graft.dynamic.DynJson.parse(r.getString(0)))
      .groupBy(identity).map { case (k, v) => (k, v.size) }
  }

  private def dynBatch(json: String): Map[com.fasterxml.jackson.databind.JsonNode, Int] =
    graft.dynamic.DynPipeline.run(dynDocs.toDF("doc"), json)
      .select("doc").collect()
      .map(r => graft.dynamic.DynJson.parse(r.getString(0)))
      .groupBy(identity).map { case (k, v) => (k, v.size) }

  private def dynConform(name: String, json: String): Unit =
    test(s"dynamic stream ≡ batch: $name") {
      val b = dynBatch(json)
      val s = dynStream(json)
      assert(s == b, s"\nstream=$s\nbatch =$b")
    }

  dynConform("$addFields", """[{"$addFields": {"w": {"$add": ["$v", 1]}}}]""")
  dynConform("$project", """[{"$project": {"_id": 1, "v": 1}}]""")
  dynConform("$unset", """[{"$unset": "sub"}]""")
  dynConform("$replaceWith", """[{"$replaceWith": "$sub"}]""")
  dynConform("$redact",
    """[{"$redact": {"$cond": [{"$gte": ["$v", 2]}, "$$KEEP", "$$PRUNE"]}}]""")
  dynConform("$setKey", """[{"$setKey": "$g"}]""")
  dynConform("$jslt (full language)",
    """[{"$jslt": "{\"_id\": ._id, \"w\": .v * 2}"}]""")
  dynConform("$jq (full language)", """[{"$jq": "select(.v > 1) | {_id, v}"}]""")
  dynConform("$match", """[{"$match": {"v": {"$gte": 2}}}]""")
  dynConform("$unwind", """[{"$unwind": "$arr"}]""")
  dynConform("composed stateless chain",
    """[{"$addFields": {"w": {"$multiply": ["$v", 2]}}},
        {"$match": {"w": {"$gte": 2}}},
        {"$unwind": "$arr"},
        {"$project": {"_id": 1, "w": 1, "arr": 1}}]""")

  test("dynamic stream ≡ batch: stream-static $lookup") {
    implicit val sqlCtx = spark.sqlContext
    val dims = Seq("""{"k":"a","w":10}""", """{"k":"b","w":20}""").toDF("doc")
    val ctx = graft.dynamic.DynPipeline.DynCtx(catalog = _ => dims)
    val json =
      """[{"$lookup": {"from": "d", "localField": "g", "foreignField": "k",
                       "as": "m"}},
          {"$project": {"_id": 1, "n": {"$size": "$m"}}}]"""
    val b = graft.dynamic.DynPipeline.run(dynDocs.toDF("doc"), json, ctx)
      .select("doc").collect()
      .map(r => graft.dynamic.DynJson.parse(r.getString(0)))
      .groupBy(identity).map { case (k, v) => (k, v.size) }
    val input = MemoryStream[String]
    val out = graft.dynamic.DynPipeline.run(input.toDF().toDF("doc"), json, ctx)
    val q = out.writeStream.format("memory").queryName("dynlookupstream")
      .outputMode("append").start()
    try {
      input.addData(dynDocs.take(2): _*)
      q.processAllAvailable()
      input.addData(dynDocs.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()
    val s = spark.sql("select doc from dynlookupstream").collect()
      .map(r => graft.dynamic.DynJson.parse(r.getString(0)))
      .groupBy(identity).map { case (k, v) => (k, v.size) }
    assert(s == b, s"\nstream=$s\nbatch =$b")
  }

  // ---- $per buffered state survives a checkpointed restart ---------------
  // (completes the stateful restart set: $group — StreamingSpec:399,
  // $deduplicate+$group+$merge — StreamingSpec:481, near-dedup — :661)
  test("$per: a partial buffer survives a kill-and-restart, then flushes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_per_ckpt")
    val srcDir = dir.resolve("src").toString
    val ckpt = dir.resolve("ckpt").toString
    new java.io.File(srcDir).mkdirs()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("key",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("doc",
        org.apache.spark.sql.types.StringType)))
    def write(n: Int, rows: Seq[(String, String)]): Unit =
      rows.toDF("key", "doc").coalesce(1).write.mode("overwrite")
        .parquet(s"$srcDir/batch$n")
    val got = scala.collection.mutable.Buffer.empty[String]
    // NOTE: a stateful query with processing-time timers keeps scheduling
    // (empty) micro-batches, so processAllAvailable never returns — poll
    // with a deadline instead (the StreamingSpec $per tests' pattern)
    def runOnce(done: () => Boolean): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet").parquet(s"$srcDir/batch*")
      // 1 h timeout: only a FULL buffer of 3 can flush, so any emission
      // after the restart proves the two batch-1 docs were restored from
      // the checkpointed state
      val out = graft.streaming.StreamingPer.per(stream, amount = 3,
        as = "batch", timeoutMs = 3600000L)
      val q = out.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.ProcessingTime(100L))
        .foreachBatch { (df: DataFrame, _: Long) =>
          got.synchronized { got ++= df.select("doc").collect().map(_.getString(0)) }
          ()
        }.start()
      try {
        val deadline = System.currentTimeMillis + 30000
        while (!done() && System.currentTimeMillis < deadline)
          Thread.sleep(100)
        assert(done(), "streaming $per run hit the 30 s poll deadline")
      } finally q.stop()
    }
    def committed(): Boolean = {
      val c = new java.io.File(s"$ckpt/commits")
      c.isDirectory && c.listFiles.exists(_.getName.forall(_.isDigit))
    }
    write(1, Seq(("k", """{"n":1}"""), ("k", """{"n":2}""")))
    runOnce(() => committed())
    assert(got.synchronized(got.isEmpty), s"partial buffer must not flush: $got")
    write(2, Seq(("k", """{"n":3}""")))
    runOnce(() => got.synchronized(got.nonEmpty)) // restored 2 + new 1 = 3
    val head = got.synchronized(got.head)
    val arr = graft.dynamic.DynJson.parse(head).get("batch")
    assert(arr != null && arr.isArray && arr.size == 3, head)
  }
}
