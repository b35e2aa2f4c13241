package graft

import graft.sources.FileBus
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.streaming.Trigger

import scala.util.Random

/** The streaming query a soak child runs: FileBus `in` topic →
  * `$deduplicate → $group → $send out` with a checkpoint — the
  * topic-to-topic loop of FileBusSpec, but long-lived, in ITS OWN JVM so
  * the soak can `kill -9` it mid-batch (the restart fuzz in
  * [[StatefulStreamFuzzSpec]] only ever stops queries GRACEFULLY; a real
  * crash can die inside a micro-batch, between state commit and sink, or
  * mid shuffle — exactly what checkpoint recovery must absorb). */
object SoakChild {
  /** The stateful core — the batch replay runs exactly this. */
  val coreJson: String =
    """[{"$deduplicate": {"expression": "$_id"}},
        {"$group": {"_id": "$g", "n": {"$count": {}}, "sv": {"$sum": "$v"}}}]"""
  val pipelineJson: String =
    coreJson.stripSuffix("]") + """, {"$send": {"topic": "out"}}]"""

  val inSchema: StructType = StructType(Seq(
    StructField("_id", StringType), StructField("g", StringType),
    StructField("v", LongType)))

  def main(args: Array[String]): Unit = {
    val busRoot = args(0)
    val ckpt = args(1)
    // optional args(2): state-store provider ("hdfs" default | "rocksdb")
    // — the soak must cover BOTH providers (r15 verdict #4); the conf is
    // captured at query START, so it is set on the builder, before start
    val builder = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val spark = (if (args.length > 2 && args(2) == "rocksdb")
      builder.config("spark.sql.streaming.stateStore.providerClass",
        graft.streaming.StreamingPipeline.RocksDBProvider)
    else builder).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val bus = new FileBus(busRoot)
    val stream = bus.readStream(spark, Seq("in"), inSchema).drop("key")
    val sp = new graft.streaming.StreamingPipeline(
      new Pipeline(producer = bus.producer("dlq")))
    val q = sp.start(stream, pipelineJson, _ => (),
      trigger = Trigger.ProcessingTime(250), checkpoint = Some(ckpt))
    q.awaitTermination()
  }
}

/** Opt-in long soak of the stateful streaming cores (r14 verdict #8) —
  * gated on `GRAFT_SOAK_MINUTES` exactly like the live Kafka/Mongo legs
  * (canceled, never silently green, when unset):
  *
  *   GRAFT_SOAK_MINUTES=30 sbt "testOnly graft.StreamingSoakSpec"
  *
  * Shape: a feeder thread produces small batches to a FileBus `in` topic
  * continuously (fresh docs + verbatim redeliveries of earlier docs); a
  * CHILD JVM runs the `$deduplicate → $group → $send` pipeline against a
  * checkpoint and is `Process.destroyForcibly()`-ed (SIGKILL) on a random
  * cadence (~soak/15, floor 15 s) and relaunched; after the feed stops, a
  * final child drains the backlog. Verification against a batch replay of
  * EVERYTHING fed: the `$send` sink is at-least-once (a killed batch can
  * re-emit), but `n`/`sv` grow monotonically per key (v ≥ 1, dedup state
  * commits exactly-once per micro-batch), so the max-`n` emission per key
  * must equal the batch-replay row for that key, and the emitted key set
  * must match exactly. */
class StreamingSoakSpec extends SparkSpec {
  import spark.implicits._

  private val opens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io", "java.base/java.net",
    "java.base/java.nio", "java.base/java.util",
    "java.base/java.util.concurrent", "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar")
    .flatMap(m => Seq(s"--add-opens=$m=ALL-UNNAMED"))

  test("30-minute kill -9 soak: dedup+group state survives repeated hard kills") {
    val minutes = sys.env.getOrElse("GRAFT_SOAK_MINUTES",
      cancel("set GRAFT_SOAK_MINUTES=30 (or 1 for a smoke) to run the " +
        "kill -9 streaming soak")).toInt
    val busRoot =
      java.nio.file.Files.createTempDirectory("graft_soak_bus").toString
    val ckpt =
      java.nio.file.Files.createTempDirectory("graft_soak_ckpt").toString
    val log =
      java.nio.file.Files.createTempFile("graft_soak", ".log").toFile
    val bus = new FileBus(busRoot)
    val rnd = new Random(20260816L)
    // GRAFT_SOAK_SKEW=1 → zipf-shaped feed (r15 verdict #4, the streaming
    // twin of the batch zipf probe): ONE group key takes ~50% of rows (the
    // $group state's hot partition) and redeliveries concentrate on ONE
    // viral doc (the $deduplicate state's hot read key). Uniform otherwise.
    val skewed = sys.env.get("GRAFT_SOAK_SKEW").contains("1")
    // GRAFT_SOAK_PROVIDER=rocksdb swaps the child's state-store provider
    val provider = sys.env.getOrElse("GRAFT_SOAK_PROVIDER", "hdfs")

    // ---- feeder ----------------------------------------------------------
    val fed = new java.util.concurrent.ConcurrentLinkedQueue[(String, String, Long)]
    @volatile var feeding = true
    val groups = Seq("a", "b", "c", null)
    def pickGroup(): String =
      if (!skewed) groups(rnd.nextInt(groups.size))
      else if (rnd.nextBoolean()) "hot"
      else groups(rnd.nextInt(groups.size)) match {
        case null => null
        case g    => s"$g${rnd.nextInt(8)}"
      }
    val feeder = new Thread(() => {
      var k = 0L
      val sent = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
      while (feeding) {
        val fresh = (0 until 1 + rnd.nextInt(8)).map { _ =>
          k += 1
          (s"m$k", pickGroup(), (k % 7) + 1L)
        }
        // ~30% of ticks redeliver an earlier doc VERBATIM (dedup state must
        // drop it even when the redelivery spans a kill); under skew, half
        // of those redeliveries hit the FIRST doc — one viral dedup key
        val redeliver =
          if (sent.nonEmpty && rnd.nextInt(10) < 3)
            Seq(if (skewed && rnd.nextBoolean()) sent(0)
                else sent(rnd.nextInt(sent.size)))
          else Seq.empty
        val batch = fresh ++ redeliver
        sent ++= fresh
        batch.foreach(fed.add)
        bus.producer("in")(batch.toDF("_id", "g", "v"))
        Thread.sleep(300 + rnd.nextInt(300))
      }
    }, "soak-feeder")

    // ---- child lifecycle -------------------------------------------------
    def launch(): Process = {
      val cmd = (Seq(
        System.getProperty("java.home") + "/bin/java", "-Xmx4g") ++ opens ++
        Seq("-cp", System.getProperty("java.class.path"),
          "graft.SoakChild", busRoot, ckpt, provider)).toArray
      new ProcessBuilder(cmd: _*)
        .redirectErrorStream(true)
        .redirectOutput(log)
        .start()
    }

    val deadline = System.nanoTime() + minutes * 60L * 1_000_000_000L
    val killEveryMs = math.max(15_000L, minutes * 60_000L / 15)
    feeder.start()
    var kills = 0
    try {
      while (System.nanoTime() < deadline) {
        val child = launch()
        val upMs = killEveryMs / 2 + rnd.nextInt(killEveryMs.toInt)
        val until = math.min(System.nanoTime() + upMs * 1_000_000L, deadline)
        while (System.nanoTime() < until && child.isAlive)
          Thread.sleep(500)
        assert(child.isAlive,
          s"soak child died on its own — see ${log.getAbsolutePath}")
        child.destroyForcibly() // SIGKILL, possibly mid-micro-batch
        child.waitFor()
        kills += 1
      }
    } finally feeding = false
    feeder.join()

    // ---- drain + verify --------------------------------------------------
    val allFed = {
      val b = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
      val it = fed.iterator(); while (it.hasNext) b += it.next()
      b.toSeq
    }
    val expected = pipeline
      .run(allFed.toDF("_id", "g", "v"), SoakChild.coreJson)
      .collect()
      .map(r => Option(r.getAs[String]("_id")) ->
        (r.getAs[Long]("n"), r.getAs[Long]("sv"))).toMap
    val outSchema = StructType(Seq(
      StructField("_id", StringType), StructField("n", LongType),
      StructField("sv", LongType)))
    def observed(): Map[Option[String], (Long, Long)] =
      bus.read(spark, Seq("out"), outSchema).collect()
        .map(r => (Option(r.getAs[String]("_id")),
          (r.getAs[Long]("n"), r.getAs[Long]("sv"))))
        .groupBy(_._1)
        .map { case (k, rows) => k -> rows.map(_._2).maxBy(_._1) }
    val drainChild = launch()
    try {
      val drainDeadline = System.nanoTime() + 300L * 1_000_000_000L
      var ok = false
      while (!ok && System.nanoTime() < drainDeadline) {
        assert(drainChild.isAlive,
          s"drain child died — see ${log.getAbsolutePath}")
        ok = observed() == expected
        if (!ok) Thread.sleep(2000)
      }
    } finally { drainChild.destroyForcibly(); drainChild.waitFor() }

    val got = observed()
    assert(got == expected,
      s"final state != batch replay after $kills kills over " +
        s"${allFed.size} docs\n got=$got\n want=$expected")
    info(s"soak green: ${allFed.size} docs fed, $kills hard kills, " +
      s"${expected.size} group keys verified against the batch replay " +
      s"(feed=${if (skewed) "zipf" else "uniform"}, provider=$provider)")
  }
}
