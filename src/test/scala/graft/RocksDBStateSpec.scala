package graft

import graft.sources.InMemoryStore
import graft.streaming.StreamingPipeline
import org.apache.spark.sql.DataFrame

/** The kill-and-restart stateful scenarios re-run under the RocksDB state
  * store provider (StreamingSpec pins them under the default HDFS-backed
  * provider). RocksDB is the 100 TB answer — per-key state lives off-heap
  * on local disk instead of executor heap (see
  * StreamingPipeline.withStateStoreProvider) — and it serializes state
  * through a different path (no in-heap object maps), so checkpoint
  * restore and timer state deserve their own green run, covering all
  * three state flavors the engine uses: streaming aggregation ($group),
  * dropDuplicates ($deduplicate), and flatMapGroupsWithState
  * (near-dedup bucket owners). */
class RocksDBStateSpec extends SparkSpec {
  import spark.implicits._

  private def underRocksDB[T](body: => T): T =
    StreamingPipeline.withStateStoreProvider(
      spark, StreamingPipeline.RocksDBProvider)(body)

  test("RocksDB provider is applied to started queries") {
    underRocksDB {
      assert(spark.conf.get("spark.sql.streaming.stateStore.providerClass")
        == StreamingPipeline.RocksDBProvider)
    }
    // and restored after
    assert(!spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      .contains(StreamingPipeline.RocksDBProvider))
  }

  test("RocksDB: $deduplicate -> $group -> $merge kill-and-restart is effectively-once") {
    underRocksDB {
      val dir = java.nio.file.Files.createTempDirectory("graft_rdb_ckpt")
      val srcDir = dir.resolve("src").toString
      val ckpt = dir.resolve("ckpt").toString
      new java.io.File(srcDir).mkdirs()
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("_id",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("g",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.LongType)))
      def write(n: Int, rows: Seq[(String, String, Long)]): Unit =
        rows.toDF("_id", "g", "v").coalesce(1).write.mode("overwrite")
          .parquet(s"$srcDir/batch$n")
      val st = new InMemoryStore(spark)
      st.overwrite("agg", Seq.empty[(String, Long)].toDF("_id", "s"))
      def runOnce(): Unit = {
        val stream = spark.readStream.schema(schema)
          .option("pathGlobFilter", "*.parquet").parquet(s"$srcDir/batch*")
        val sp = new StreamingPipeline(new Pipeline(store = st))
        val q = sp.start(stream,
          """[{"$deduplicate": {"expression": "$_id"}},
              {"$group": {"_id": "$g", "s": {"$sum": "$v"}}},
              {"$merge": {"into": "agg"}}]""",
          _ => (), checkpoint = Some(ckpt))
        try q.processAllAvailable() finally q.stop()
      }
      write(1, Seq(("m1", "a", 1L), ("m2", "a", 10L), ("m2", "a", 10L),
        ("m3", "b", 5L)))
      runOnce()
      assert(rows(st.read("agg")) == Set(List("a", 11L), List("b", 5L)))
      // restart against the SAME RocksDB-format checkpoint: the restored
      // dedup state drops m2's redelivery, the group state carries the sums
      write(2, Seq(("m2", "a", 10L), ("m4", "a", 2L)))
      runOnce()
      assert(rows(st.read("agg")) == Set(List("a", 13L), List("b", 5L)))
    }
  }

  test("RocksDB: near-dedup bucket owners survive a checkpointed restart") {
    underRocksDB {
      val dir = java.nio.file.Files.createTempDirectory("graft_rdb_nd")
      val srcDir = dir.resolve("src").toString
      val ckpt = dir.resolve("ckpt").toString
      new java.io.File(srcDir).mkdirs()
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType)))
      val base = "the quick brown fox jumps over the lazy dog and then it " +
        "runs back home to rest quietly tonight"
      def write(n: Int, rows: Seq[(Long, String)]): Unit =
        rows.toDF("doc_id", "text").coalesce(1).write.mode("overwrite")
          .parquet(s"$srcDir/batch$n")
      def runOnce(): Seq[(Long, Long)] = {
        val got = scala.collection.mutable.Buffer.empty[(Long, Long)]
        val stream = spark.readStream.schema(schema)
          .option("pathGlobFilter", "*.parquet").parquet(s"$srcDir/batch*")
        val v = graft.streaming.StreamingNearDedup.verdicts(
          stream, "text", "doc_id", 3, 8, 4, 0.5)
        val q = v.writeStream.outputMode("append")
          .option("checkpointLocation", ckpt)
          .foreachBatch { (df: DataFrame, _: Long) =>
            df.collect().foreach(r => got += ((r.getLong(0), r.getLong(1))))
            ()
          }.start()
        try q.processAllAvailable() finally q.stop()
        got.toSeq.distinct
      }
      write(1, Seq((1L, base)))
      assert(runOnce() == Seq.empty)
      write(2, Seq((7L, base)))
      assert(runOnce() == Seq((7L, 1L)),
        "flatMapGroupsWithState owner state must restore from RocksDB")
    }
  }

  test("RocksDB: $per flushes a partial batch via a processing-time timer") {
    underRocksDB {
      implicit val sqlCtx = spark.sqlContext
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(String, String)]
      val out = graft.streaming.StreamingPer.per(
        input.toDF().toDF("key", "doc"),
        amount = 5, as = "batch", timeoutMs = 300L)
      val q = out.writeStream.format("memory").queryName("rdbper")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(100L))
        .start()
      def sizes(): List[Int] =
        spark.sql("select doc from rdbper").collect().toList.map { r =>
          graft.dynamic.DynJson.parse(r.getString(0)).path("batch").size
        }
      try {
        // no processAllAvailable: timer queries never go idle — poll
        def await(n: Int): Unit = {
          val deadline = System.currentTimeMillis + 30000
          while (sizes().size < n && System.currentTimeMillis < deadline)
            Thread.sleep(100)
        }
        input.addData((1 to 7).map(i => (s"k$i", s"""{"_id":"d$i"}""")): _*)
        await(1)
        assert(sizes().head == 5, s"got ${sizes()}")
        await(2)
        assert(sizes() == List(5, 2), s"got ${sizes()}")
      } finally q.stop()
    }
  }
}
