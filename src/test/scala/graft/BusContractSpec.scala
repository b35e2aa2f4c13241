package graft

import graft.sources.{FileBus, InMemoryStore, KafkaBus}
import graft.streaming.StreamingPipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** The behavioral contract every message-bus binding must satisfy — the
  * transport assertions the ENGINE relies on (reference topic loop:
  * Pipeline.java:273-299; producer: Context.java:32), run identically
  * against the broker-free [[FileBus]] and (env-gated) a REAL Kafka
  * broker, so the day a broker exists the same suite lights up against it
  * (round-12 verdict #4: the Kafka leg mirrored
  * [[DocumentStoreContractSpec]]'s Mongo leg).
  *
  * Run the Kafka leg with `GRAFT_KAFKA_BOOTSTRAP=host:9092 sbt "testOnly
  * graft.BusContractSpec"`; without the env var those tests CANCEL
  * (reported as canceled, never silently green). The spark-sql-kafka
  * connector jar must be on the session classpath for a live run, and the
  * broker should allow topic auto-creation (or pre-create
  * `graft_contract_*` topics). Topic names are salted per JVM so reruns
  * against a retaining broker stay independent. */
class BusContractSpec extends SparkSpec {
  import spark.implicits._

  /** Minimal common surface of FileBus/KafkaBus (identical signatures, no
    * shared trait in main — the bindings stay dependency-free). */
  private trait Bus {
    def readStream(spark: SparkSession, topics: Seq[String],
        schema: StructType): DataFrame
    def read(spark: SparkSession, topics: Seq[String],
        schema: StructType): DataFrame
    def producer(defaultTopic: String): DataFrame => Unit
  }

  private def fileBus(): Bus = {
    val b = new FileBus(
      java.nio.file.Files.createTempDirectory("graft_buscontract").toString)
    new Bus {
      def readStream(s: SparkSession, t: Seq[String], sc: StructType) =
        b.readStream(s, t, sc)
      def read(s: SparkSession, t: Seq[String], sc: StructType) =
        b.read(s, t, sc)
      def producer(d: String) = b.producer(d)
    }
  }

  private def kafkaBus(): Bus = {
    val servers = sys.env.getOrElse("GRAFT_KAFKA_BOOTSTRAP",
      cancel("set GRAFT_KAFKA_BOOTSTRAP=host:9092 (with the " +
        "spark-sql-kafka jar deployed) to run the live Kafka leg"))
    val b = new KafkaBus(servers)
    new Bus {
      def readStream(s: SparkSession, t: Seq[String], sc: StructType) =
        b.readStream(s, t, sc)
      def read(s: SparkSession, t: Seq[String], sc: StructType) =
        b.read(s, t, sc)
      def producer(d: String) = b.producer(d)
    }
  }

  // per-JVM salt: a retaining broker must not bleed state across runs
  private val salt = java.util.UUID.randomUUID.toString.take(8)
  private def topic(name: String) = s"graft_contract_${name}_$salt"

  private val inSchema = StructType(Seq(
    StructField("_id", StringType), StructField("g", StringType),
    StructField("v", LongType)))
  private val outSchema = StructType(Seq(
    StructField("_id", StringType), StructField("s", LongType)))

  private def contract(busName: String, mk: () => Bus): Unit = {
    test(s"$busName: produce -> bounded read round-trips the message shape") {
      val bus = mk()
      val t = topic(s"rt_$busName")
      bus.producer(t)(Seq(("a", "x", 1L), ("b", "y", 2L)).toDF("_id", "g", "v"))
      val got = bus.read(spark, Seq(t), inSchema)
      assert(got.count() == 2)
      assert(got.select("_id", "g", "v").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet ==
        Set(("a", "x", 1L), ("b", "y", 2L)))
      // transport key defaults to _id (Messages.toJson contract)
      assert(got.select("key").as[String].collect().toSet == Set("a", "b"))
    }

    test(s"$busName: $$send fans one produce call across topics; null passes through") {
      val bus = mk()
      val (red, blue, fb) = (topic(s"red_$busName"), topic(s"blue_$busName"),
        topic(s"fb_$busName"))
      val df = Seq(("d1", red), ("d2", blue), ("d3", red), ("d4", null))
        .toDF("_id", "dest")
      val out = new Pipeline(producer = bus.producer(fb))
        .run(df, """[{"$send": {"topic": "$dest"}}]""")
      // null topic result -> message passes through unsent (Send.java:36-68)
      assert(out.select("_id").as[String].collect().toSet == Set("d4"))
      val destSchema = StructType(Seq(StructField("_id", StringType),
        StructField("dest", StringType)))
      assert(bus.read(spark, Seq(red), destSchema)
        .select("_id").as[String].collect().toSet == Set("d1", "d3"))
      assert(bus.read(spark, Seq(blue), destSchema).count() == 1)
      assert(bus.read(spark, Seq(fb), destSchema).count() == 0)
    }

    test(s"$busName: $$delay produces the parked message to its retry topic") {
      val bus = mk()
      val retry = topic(s"retry_$busName")
      val store = new InMemoryStore(spark)
      val out = new Pipeline(producer = bus.producer(topic(s"dlq_$busName")),
        store = store)
        .run(Seq(("j1", 1000L), ("j2", 1000L)).toDF("_id", "ms"),
          s"""[{"$$delay": {"topic": {"$$literal": "$retry"}, "duration": "$$ms",
               "_clock": {"$$literal": "2026-01-01T00:00:00Z"}}}]""")
      assert(out.count() == 0) // valid messages leave the stream
      // the schedule stamp's exact JSON type is pinned in FileBusSpec via
      // readRaw; the transport contract here is the routed produce itself
      val produced = bus.read(spark, Seq(retry),
        StructType(Seq(StructField("_id", StringType))))
      assert(produced.select("_id").as[String].collect().toSet == Set("j1", "j2"))
    }

    test(s"$busName: topic-to-topic streaming loop survives kill-and-restart") {
      val bus = mk()
      val (in, outT, dlq) = (topic(s"in_$busName"), topic(s"out_$busName"),
        topic(s"dlq2_$busName"))
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_buscontract_ckpt").toString
      def produceIn(rowsIn: Seq[(String, String, Long)]): Unit =
        bus.producer(in)(rowsIn.toDF("_id", "g", "v"))
      def runOnce(): Unit = {
        val stream = bus.readStream(spark, Seq(in), inSchema)
        val sp = new StreamingPipeline(new Pipeline(producer = bus.producer(dlq)))
        val q = sp.start(stream.drop("key"),
          s"""[{"$$deduplicate": {"expression": "$$_id"}},
              {"$$group": {"_id": "$$g", "s": {"$$sum": "$$v"}}},
              {"$$send": {"topic": "$outT"}}]""",
          _ => (), checkpoint = Some(ckpt))
        try q.processAllAvailable() finally q.stop()
      }
      def outLog(): Set[(String, Long)] =
        bus.read(spark, Seq(outT), outSchema).collect()
          .map(r => (r.getAs[String]("_id"), r.getAs[Long]("s"))).toSet

      produceIn(Seq(("m1", "a", 1L), ("m2", "a", 10L), ("m2", "a", 10L),
        ("m3", "b", 5L)))
      runOnce()
      assert(outLog() == Set(("a", 11L), ("b", 5L)))
      // restart from the same checkpoint: restored dedup state drops the
      // replayed m2, group state carries sums, the out topic retains the
      // superseded a=11 record like any append log
      produceIn(Seq(("m2", "a", 10L), ("m4", "a", 2L)))
      runOnce()
      assert(outLog() == Set(("a", 11L), ("b", 5L), ("a", 13L)))
    }
  }

  contract("FileBus", () => fileBus())
  contract("KafkaBus", () => kafkaBus())
}
