package graft

import graft.sources.{FileBus, InMemoryStore}
import graft.streaming.StreamingPipeline
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** End-to-end conformance of the reference's TRANSPORT contract
  * (Pipeline.java:273-299 topic loop, Context.java:32 producer) over the
  * [[FileBus]] — the broker-free binding with KafkaBus's exact record and
  * routing semantics. This closes the "no live broker in the sandbox" gap:
  * the composed streaming pipeline runs topic-to-topic, kill-and-restart
  * included, with the checkpoint playing the consumer-group offset store. */
class FileBusSpec extends SparkSpec {
  import spark.implicits._

  private val inSchema = StructType(Seq(
    StructField("_id", StringType), StructField("g", StringType),
    StructField("v", LongType)))
  private val outSchema = StructType(Seq(
    StructField("_id", StringType), StructField("s", LongType)))

  private def newBus() = new FileBus(
    java.nio.file.Files.createTempDirectory("graft_filebus").toString)

  test("topic-to-topic loop: $deduplicate -> $group -> $send with kill-and-restart") {
    val bus = newBus()
    val ckpt = java.nio.file.Files.createTempDirectory("graft_filebus_ckpt").toString
    def produceIn(rowsIn: Seq[(String, String, Long)]): Unit =
      bus.producer("in")(rowsIn.toDF("_id", "g", "v"))
    def runOnce(): Unit = {
      val stream = bus.readStream(spark, Seq("in"), inSchema)
      val sp = new StreamingPipeline(new Pipeline(producer = bus.producer("dlq")))
      val q = sp.start(stream.drop("key"),
        """[{"$deduplicate": {"expression": "$_id"}},
            {"$group": {"_id": "$g", "s": {"$sum": "$v"}}},
            {"$send": {"topic": "out"}}]""",
        _ => (), checkpoint = Some(ckpt))
      try q.processAllAvailable() finally q.stop()
    }
    def outLog(): Set[(String, Long)] =
      bus.read(spark, Seq("out"), outSchema).collect()
        .map(r => (r.getAs[String]("_id"), r.getAs[Long]("s"))).toSet

    // m2 arrives twice inside the first window: in-batch dedup
    produceIn(Seq(("m1", "a", 1L), ("m2", "a", 10L), ("m2", "a", 10L),
      ("m3", "b", 5L)))
    runOnce()
    assert(outLog() == Set(("a", 11L), ("b", 5L)))

    // kill-and-restart from the same checkpoint: m2 arriving AGAIN is
    // dropped by the RESTORED dedup state (else a=23), the group state
    // carries the previous sums (else a=2), and update mode re-emits only
    // the changed key — the out topic is an append log, so the stale a=11
    // record remains alongside the new a=13 exactly like a Kafka topic
    // would retain superseded updates
    produceIn(Seq(("m2", "a", 10L), ("m4", "a", 2L)))
    runOnce()
    assert(outLog() == Set(("a", 11L), ("b", 5L), ("a", 13L)))
  }

  test("$send topic expression fans one produce call across topic directories") {
    val bus = newBus()
    val df = Seq(("d1", "red"), ("d2", "blue"), ("d3", "red"), ("d4", null))
      .toDF("_id", "dest")
    val out = new Pipeline(producer = bus.producer("fallback"))
      .run(df, """[{"$send": {"topic": "$dest"}}]""")
    // null topic result -> the message passes through unsent (Send.java:36-68)
    assert(out.select("_id").as[String].collect().toSet == Set("d4"))
    val red = bus.read(spark, Seq("red"),
      StructType(Seq(StructField("_id", StringType), StructField("dest", StringType))))
    assert(red.select("_id").as[String].collect().toSet == Set("d1", "d3"))
    assert(bus.readRaw(spark, "blue").count() == 1)
    assert(bus.readRaw(spark, "fallback").count() == 0) // no null __topic rows produced
    // record shape on the wire: key defaults to _id, value is the doc JSON
    val rec = bus.readRaw(spark, "blue").head()
    assert(rec.getAs[String]("key") == "d2")
    assert(rec.getAs[String]("value") == """{"_id":"d2","dest":"blue"}""")
  }

  test("$delay produces to the retry topic through the bus and redelivers from the park") {
    val bus = newBus()
    val store = new InMemoryStore(spark)
    val p = new Pipeline(producer = bus.producer("dlq"), store = store)
    val out = p.run(Seq(("j1", 1000L), ("j2", 1000L)).toDF("_id", "ms"),
      """[{"$delay": {"topic": {"$literal": "retry"}, "duration": "$ms",
           "_clock": {"$literal": "2026-01-01T00:00:00Z"}}}]""")
    assert(out.count() == 0) // valid messages leave the stream
    // the produce leg: both messages hit the retry topic dir with their
    // schedule stamped into the value (the reference sends the delayed
    // message alongside parking it, Delay.java:32-77)
    val produced = bus.readRaw(spark, "retry").collect()
    assert(produced.map(_.getAs[String]("key")).toSet == Set("j1", "j2"))
    assert(produced.forall(_.getAs[String]("value").contains("__deliverAt")))
    // the park leg: redelivery pops due messages once
    val due = SinkStages.redeliverDue(store, "retry",
      org.apache.spark.sql.functions.lit("2026-01-01T00:00:02Z").cast("timestamp"))
    assert(due.select("_id").as[String].collect().toSet == Set("j1", "j2"))
  }

  test("concurrent producers to one bus root never lose records (staging isolation)") {
    // Kafka's model allows many producers; the pre-r15 direct append shared
    // <root>/_temporary/0 across jobs, so concurrent produces (the soak's
    // external feeder + a pipeline's $send, even cross-JVM) deleted each
    // other's staging on commit. 4 threads x 6 produces each, all records
    // must land exactly once.
    val bus = newBus()
    val threads = (0 until 4).map { t =>
      new Thread(() => {
        for (i <- 0 until 6) {
          val rowsIn = (0 until 5).map(j => (s"d$t-$i-$j", "g", j.toLong))
          bus.producer("in")(rowsIn.toDF("_id", "g", "v"))
        }
      }, s"producer-$t")
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    val got = bus.read(spark, Seq("in"), inSchema)
      .select("_id").as[String].collect().toSeq
    assert(got.size == 4 * 6 * 5, s"records lost or duplicated: ${got.size}")
    assert(got.toSet.size == got.size)
  }
}
