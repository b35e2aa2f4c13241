package graft

import graft.sources.KafkaBus
import org.apache.spark.sql.functions._

/** Option-plumbing and routing tests for the Kafka transport binding — the
  * spark-sql-kafka jar isn't in this container, so no broker I/O can run;
  * what CAN break silently (and is pinned here) is the option mapping and
  * the `__topic` → per-record `topic` routing that `$send`/`$delay`
  * fan-out depends on. */
class KafkaBusSpec extends SparkSpec {

  private def bus = new KafkaBus("broker1:9092,broker2:9092")

  test("read options carry servers/subscribe/offsets and data-loss posture") {
    val o = bus.readOptions(Seq("orders", "events"),
      maxOffsetsPerTrigger = Some(50000L))
    assert(o("kafka.bootstrap.servers") == "broker1:9092,broker2:9092")
    assert(o("subscribe") == "orders,events")
    assert(o("startingOffsets") == "earliest")
    assert(o("failOnDataLoss") == "false") // reference retries forever
    assert(o("maxOffsetsPerTrigger") == "50000")
    assert(!bus.readOptions(Seq("t")).contains("maxOffsetsPerTrigger"))
    intercept[IllegalArgumentException](bus.readOptions(Nil))
    intercept[IllegalArgumentException](bus.readOptions(Seq("a,b")))
  }

  test("write options set the default topic; kafka.* extras pass through") {
    val s = new KafkaBus("b:9092",
      Map("kafka.security.protocol" -> "SASL_SSL"))
    val o = s.writeOptions(Some("out"))
    assert(o("topic") == "out")
    assert(o("kafka.security.protocol") == "SASL_SSL")
    assert(!s.writeOptions(None).contains("topic"))
  }

  test("__topic routes per record, null falls back, docs drop transport columns") {
    import spark.implicits._
    val batch = Seq(("k1", "a", "t1"), ("k2", "b", null))
      .toDF("key", "_id", "__topic")
    val out = bus.routed(batch, "fallback").collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(out("k1") == (("""{"_id":"a"}""", "t1")))
    assert(out("k2") == (("""{"_id":"b"}""", "fallback"))) // null route
  }

  test("keyless batches fall back to _id, like Messages.toJson") {
    import spark.implicits._
    val out = bus.routed(Seq(("x", 1L)).toDF("_id", "n"), "t").head()
    assert(out.getString(0) == "x")
    assert(out.getString(1) == """{"_id":"x","n":1}""")
    assert(out.getString(2) == "t")
  }

  test("a $send-shaped frame round-trips the engine producer contract") {
    import spark.implicits._
    // the exact frame SinkStages.send hands the producer: doc columns plus
    // a non-null __topic — one produce call must fan out across topics
    val sent = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
    val producer: org.apache.spark.sql.DataFrame => Unit = b =>
      sent ++= bus.routed(b, "default").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val df = Seq(("a", 10L, "audit"), ("b", 20L, "audit"), ("c", 30L, "alerts"))
      .toDF("_id", "v", "__topic")
    producer(df)
    assert(sent.map(_._3).sorted == Seq("alerts", "audit", "audit"))
    assert(sent.forall { case (k, v, _) => v.contains(s""""_id":"$k"""") })
  }

  test("the datasource is addressed by name, so a missing jar fails loudly") {
    import spark.implicits._
    val e = intercept[Exception] {
      bus.producer("t")(Seq(("a", 1L)).toDF("_id", "v"))
    }
    assert(e.getMessage.toLowerCase.contains("kafka") ||
      e.getMessage.toLowerCase.contains("data source"))
  }
}
