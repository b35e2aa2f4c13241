package graft

import graft.streaming.{DynStreamingPipeline, StreamingPipeline}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import scala.util.Random

/** Streaming STATEFUL fuzz (round-12 verdict #5): seeded random pipelines
  * whose core is a stateful stage — `$deduplicate`, `$group`, or the
  * composed `$deduplicate → $group` — driven through THREE micro-batches
  * and compared against the batch run of the identical pipeline on the
  * identical input. Extends [[StreamingFuzzSpec]] (stateless grammar,
  * 2 batches) the way StreamingSpec's hand scenarios pinned state: but
  * generated, 3 seeds × 100 pipelines, alternating ENGINES (typed/dynamic)
  * and STATE-STORE PROVIDERS (default HDFS-backed / RocksDB) per pipeline.
  *
  * Comparison semantics by core:
  *  - `$deduplicate`: state drops redeliveries across batches, so the
  *    stream's full output multiset must equal the batch multiset. Inputs
  *    duplicate FULL documents (same _id ⇒ same payload), so "keep first"
  *    is order-free and the compare is exact.
  *  - `$group` (update mode): the stream re-emits a key's running
  *    aggregate each batch it changes, so the LAST emission per key must
  *    equal the batch row for that key — and the set of emitted keys must
  *    match. Stateless suffix stages are restricted to non-filtering,
  *    `_id`-preserving shapes so last-per-key stays well-defined;
  *    accumulators are integer-exact (no float whose fold order could
  *    differ between incremental merge and one-pass batch).
  *
  * Reproduce a failure by seed + index; override seeds with
  * `GRAFT_STATEFUZZ_SEED=N` (env var — forked test JVMs don't see sbt
  * -D props). */
class StatefulStreamFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val seeds: Seq[Long] =
    sys.env.get("GRAFT_STATEFUZZ_SEED").map(s => Seq(s.toLong))
      .getOrElse(Seq(20260913L, 20260914L, 20260915L))

  // 3 micro-batches; m2/m5 redeliver VERBATIM in later batches (cross-batch
  // dedup state), m7 duplicates within its batch; groups a/b/c plus null
  private val batches: Seq[Seq[(String, String, Long)]] = Seq(
    Seq(("m1", "a", 1L), ("m2", "a", 10L), ("m2", "a", 10L), ("m3", "b", 5L)),
    Seq(("m2", "a", 10L), ("m4", "c", 2L), ("m5", null, 7L), ("m6", "b", 3L)),
    Seq(("m5", null, 7L), ("m7", "c", 4L), ("m7", "c", 4L), ("m8", "a", 6L)))
  private val allDocs = batches.flatten

  private def dynRow(r: (String, String, Long)): String = {
    val g = if (r._2 == null) "null" else s""""${r._2}""""
    s"""{"_id":"${r._1}","g":$g,"v":${r._3}}"""
  }
  private val dynBatches = batches.map(_.map(dynRow))

  // ---- grammar -------------------------------------------------------------

  private final class Gen(rnd: Random) {
    private def pick[T](xs: Seq[T]): T = xs(rnd.nextInt(xs.size))

    private def numExpr(): String = pick(Seq(
      "\"$v\"",
      s"""{"$$add": ["$$v", ${rnd.nextInt(4)}]}""",
      s"""{"$$multiply": ["$$v", ${1 + rnd.nextInt(3)}]}""",
      s"""{"$$cond": [{"$$gt": ["$$v", ${1 + rnd.nextInt(5)}]}, "$$v", ${rnd.nextInt(3)}]}"""))

    private def prefix(): Seq[String] = rnd.nextInt(3) match {
      case 0 => Seq.empty
      case 1 => Seq(pick(Seq(
        s"""{"$$match": {"v": {"$$gte": ${rnd.nextInt(5)}}}}""",
        s"""{"$$match": {"g": {"$$in": ["a", "b", "c"]}}}""",
        s"""{"$$match": {"$$expr": {"$$lte": [${numExpr()}, ${3 + rnd.nextInt(20)}]}}}""")))
      case 2 => Seq(s"""{"$$addFields": {"w": ${numExpr()}}}""")
    }

    private def dedupStage(): String = pick(Seq(
      """{"$deduplicate": {"expression": "$_id"}}""",
      """{"$deduplicate": {"expression": {"i": "$_id"}}}""",
      """{"$deduplicate": {"expression": {"$concat": ["$_id", "-k"]}}}"""))

    private def groupStage(): String = {
      val id = pick(Seq("\"$g\"", """{"$ifNull": ["$g", "NUL"]}""", "null"))
      val accs = (1 to 1 + rnd.nextInt(3)).map { i =>
        pick(Seq(
          s""""s$i": {"$$sum": ${numExpr()}}""",
          s""""c$i": {"$$count": {}}""",
          s""""mx$i": {"$$max": "$$v"}""",
          s""""mn$i": {"$$min": ${numExpr()}}"""))
      }.distinct.mkString(", ")
      s"""{"$$group": {"_id": $id, $accs}}"""
    }

    /** non-filtering, _id-preserving suffix (see class doc). */
    private def groupSuffix(): Seq[String] = rnd.nextInt(3) match {
      case 0 => Seq.empty
      case 1 => Seq(s"""{"$$addFields": {"z": ${rnd.nextInt(9)}}}""")
      case 2 => Seq("""{"$setKey": {"$toString": "$_id"}}""")
    }

    /** (pipeline, core) — core decides the comparison semantics. */
    def pipeline(): (String, String) = rnd.nextInt(3) match {
      case 0 =>
        ((prefix() :+ dedupStage()).mkString("[", ", ", "]"), "dedup")
      case 1 =>
        ((prefix() ++ Seq(groupStage()) ++ groupSuffix())
          .mkString("[", ", ", "]"), "group")
      case 2 =>
        ((prefix() ++ Seq(dedupStage(), groupStage()))
          .mkString("[", ", ", "]"), "group")
    }
  }

  // ---- harnesses -----------------------------------------------------------

  private def typedStream(json: String): Seq[String] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String, Long)]
    val out = scala.collection.mutable.Buffer.empty[String]
    input.addData(batches.head: _*)
    val q = new StreamingPipeline(pipeline).start(
      input.toDF().toDF("_id", "g", "v"), json,
      df => out.synchronized { out ++= df.toJSON.collect() },
      trigger = Trigger.ProcessingTime(0))
    try {
      q.processAllAvailable()
      batches.drop(1).foreach { b =>
        input.addData(b: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    out.toSeq
  }

  private def typedBatch(json: String): Seq[String] =
    pipeline.run(allDocs.toDF("_id", "g", "v"), json).toJSON.collect().toSeq

  private def dynStream(json: String): Seq[String] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val out = scala.collection.mutable.Buffer.empty[String]
    input.addData(dynBatches.head: _*)
    val q = new DynStreamingPipeline().start(
      input.toDF().toDF("doc"), json,
      df => out.synchronized {
        out ++= df.select("doc").collect().map(_.getString(0))
      },
      trigger = Trigger.ProcessingTime(0))
    try {
      q.processAllAvailable()
      dynBatches.drop(1).foreach { b =>
        input.addData(b: _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    out.toSeq
  }

  private def dynBatch(json: String): Seq[String] =
    graft.dynamic.DynPipeline.run(dynBatches.flatten.toDF("doc"), json)
      .select("doc").collect().map(_.getString(0)).toSeq

  // canonical JSON (dynamic engine may order keys differently per path)
  private def canon(s: String): com.fasterxml.jackson.databind.JsonNode =
    graft.dynamic.DynJson.parse(s)

  private def multiset(xs: Seq[String]) =
    xs.map(canon).groupBy(identity).map { case (k, v) => (k, v.size) }

  /** last emission per `_id` — the update-mode final answer per key. */
  private def lastPerKey(xs: Seq[String]) =
    xs.map(canon).foldLeft(
      Map.empty[com.fasterxml.jackson.databind.JsonNode,
        com.fasterxml.jackson.databind.JsonNode]) { (m, n) =>
      m + (n.path("_id") -> n)
    }

  private def compare(core: String, stream: Seq[String],
      batch: Seq[String]): Unit = core match {
    case "dedup" =>
      assert(multiset(stream) == multiset(batch),
        s"\nstream=${stream.sorted}\nbatch =${batch.sorted}")
    case "group" =>
      val s = lastPerKey(stream)
      val b = lastPerKey(batch)
      assert(b.size == batch.size, "batch group output must be one row per key")
      assert(s == b, s"\nstream last-per-key=$s\nbatch=$b")
  }

  // ---- the fuzz loop -------------------------------------------------------

  seeds.foreach { seed =>
    test(s"seed $seed: 100 random stateful pipelines, stream ≡ batch, " +
      "both engines × both state-store providers") {
      val gen = new Gen(new Random(seed))
      (0 until 100).foreach { i =>
        val (p, core) = gen.pipeline()
        def run(): Unit = withClue(s"seed $seed #$i core=$core $p: ") {
          if (i % 2 == 0) compare(core, typedStream(p), typedBatch(p))
          else compare(core, dynStream(p), dynBatch(p))
        }
        // alternate the state-store provider in a scoped, restored way
        if (i % 4 < 2) run()
        else StreamingPipeline.withStateStoreProvider(
          spark, StreamingPipeline.RocksDBProvider)(run())
      }
    }
  }
}
