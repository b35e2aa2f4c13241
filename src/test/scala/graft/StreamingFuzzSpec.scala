package graft

import graft.streaming.StreamingPipeline
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import scala.util.Random

/** Streaming STATELESS fuzz: seeded random pipelines over the natively-
  * streamable stage set, each driven through `readStream` split across two
  * micro-batches and compared against the batch run of the identical
  * pipeline on the identical input — the generalization of
  * StreamingMatrixSpec's 31 hand-picked cases (round-11 verdict #4).
  *
  * The oracle is ENGINE-INTERNAL (stream multiset ≡ batch multiset), so
  * typed/dynamic cross-engine parity is not needed here — that is
  * DifferentialFuzzSpec's job; pipelines alternate between the engines for
  * coverage at half the streaming-query cost. Grammar: $match / $addFields /
  * $project / $unset / $redact / $setKey / $unwind (all variants) /
  * $replaceWith (terminal — it rewrites the schema), composed 1–4 deep.
  *
  * Determinism: three fixed seeds × 100 pipelines; a failure reproduces by
  * seed + index, and `GRAFT_STREAMFUZZ_SEED=N sbt "testOnly
  * graft.StreamingFuzzSpec"` mines new ground (env var, not a -D prop —
  * tests run in a FORKED jvm that inherits the environment but not
  * sbt-side system properties). */
class StreamingFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val seeds: Seq[Long] =
    sys.env.get("GRAFT_STREAMFUZZ_SEED").map(s => Seq(s.toLong))
      .getOrElse(Seq(20260815L, 20260816L, 20260817L))

  // the matrix input: ids, nullable group string, numeric, array (incl.
  // empty), plus a struct added identically on both paths
  private val docs: Seq[(String, String, Long, Seq[Long])] = Seq(
    ("0", "a", 1L, Seq(1L, 2L)),
    ("1", "b", 2L, Seq(3L)),
    ("2", "a", 3L, Seq.empty),
    ("3", null, 4L, Seq(7L, 8L)))
  private def prep(df: DataFrame): DataFrame =
    df.withColumn("sub", struct(col("g").as("x"), col("v").as("y")))

  private val dynDocs = Seq(
    """{"_id":"0","g":"a","v":1,"arr":[1,2],"sub":{"x":"a","y":1}}""",
    """{"_id":"1","g":"b","v":2,"arr":[3],"sub":{"x":"b","y":2}}""",
    """{"_id":"2","g":"a","v":3,"arr":[],"sub":{"x":"a","y":3}}""",
    """{"_id":"3","g":null,"v":4,"arr":[7,8],"sub":{"x":null,"y":4}}""")

  // ---- grammar -------------------------------------------------------------

  private final class Gen(rnd: Random) {
    private def pick[T](xs: Seq[T]): T = xs(rnd.nextInt(xs.size))

    /** arrOk: after $unwind, `arr` is a scalar — drop the array terminals. */
    def numExpr(depth: Int, arrOk: Boolean): String =
      if (depth <= 0) pick(Seq("\"$v\"", "\"$sub.y\"", s"${rnd.nextInt(5)}"))
      else pick[() => String](Seq(
        () => numExpr(0, arrOk),
        () => s"""{"$$add": [${numExpr(depth - 1, arrOk)}, ${rnd.nextInt(4)}]}""",
        () => s"""{"$$multiply": [${numExpr(depth - 1, arrOk)}, ${1 + rnd.nextInt(3)}]}""",
        () => s"""{"$$subtract": [${numExpr(depth - 1, arrOk)}, "$$v"]}""",
        () => s"""{"$$cond": [{"$$gt": ["$$v", ${1 + rnd.nextInt(3)}]},
                   ${numExpr(depth - 1, arrOk)}, ${numExpr(depth - 1, arrOk)}]}""",
        () => if (arrOk) s"""{"$$size": "$$arr"}""" else "\"$v\""))()

    def strExpr(depth: Int): String =
      if (depth <= 0) pick(Seq("\"$g\"", "\"$sub.x\"", "\"$_id\"", "\"lit\""))
      else pick[() => String](Seq(
        () => strExpr(0),
        () => s"""{"$$toUpper": ${strExpr(depth - 1)}}""",
        () => s"""{"$$concat": [{"$$ifNull": [${strExpr(depth - 1)}, "_"]}, "-t"]}""",
        () => s"""{"$$toString": ${numExpr(depth - 1, arrOk = false)}}"""))()

    def matchStage(arrOk: Boolean): String = pick[() => String](Seq(
      () => s"""{"$$match": {"v": {"$$gte": ${rnd.nextInt(4)}}}}""",
      () => s"""{"$$match": {"g": ${pick(Seq("\"a\"", "\"b\"", "null"))}}}""",
      () => s"""{"$$match": {"$$expr": {"$$gt": [${numExpr(1, arrOk)}, ${rnd.nextInt(5)}]}}}""",
      () => s"""{"$$match": {"_id": {"$$in": ["0", "2", "3"]}}}"""))()

    def addFieldsStage(arrOk: Boolean): String =
      s"""{"$$addFields": {"w": ${numExpr(2, arrOk)}, "t": ${strExpr(2)}}}"""

    def projectStage(arrOk: Boolean): String = pick[() => String](Seq(
      () => """{"$project": {"_id": 1, "v": 1, "g": 1}}""",
      () => s"""{"$$project": {"_id": 1, "w2": ${numExpr(2, arrOk)}}}""",
      () => """{"$project": {"sub": 0}}"""))()

    def unsetStage(): String =
      pick(Seq("""{"$unset": "sub"}""", """{"$unset": ["sub", "g"]}"""))

    def redactStage(arrOk: Boolean): String =
      s"""{"$$redact": {"$$cond": [{"$$gte": [${numExpr(1, arrOk)}, ${rnd.nextInt(3)}]},
           "$$$$KEEP", "$$$$PRUNE"]}}"""

    def setKeyStage(): String = s"""{"$$setKey": ${strExpr(1)}}"""

    def unwindStage(): String = pick[() => String](Seq(
      () => """{"$unwind": "$arr"}""",
      () => """{"$unwind": {"path": "$arr", "includeArrayIndex": "i"}}""",
      () => """{"$unwind": {"path": "$arr", "preserveNullAndEmptyArrays": true}}"""))()

    def replaceWithStage(): String = pick(Seq(
      """{"$replaceWith": "$sub"}""",
      """{"$replaceRoot": {"newRoot": "$sub"}}"""))

    def pipeline(): String = {
      val stages = scala.collection.mutable.ArrayBuffer[String]()
      var arrOk = true
      if (rnd.nextBoolean()) stages += matchStage(arrOk)
      rnd.nextInt(5) match {
        case 0 =>
          stages += addFieldsStage(arrOk)
          if (rnd.nextBoolean()) stages += projectStage(arrOk)
        case 1 =>
          stages += unwindStage(); arrOk = false
          stages += pick[() => String](Seq(
            () => matchStage(arrOk), () => addFieldsStage(arrOk),
            () => projectStage(arrOk)))()
        case 2 =>
          stages += redactStage(arrOk)
          if (rnd.nextBoolean()) stages += projectStage(arrOk)
        case 3 =>
          if (rnd.nextBoolean()) stages += setKeyStage()
          stages += pick[() => String](Seq(
            () => unsetStage(), () => projectStage(arrOk)))()
        case 4 =>
          if (rnd.nextBoolean()) stages += addFieldsStage(arrOk)
          stages += replaceWithStage() // terminal: schema becomes sub's
      }
      if (stages.isEmpty) stages += projectStage(arrOk)
      stages.mkString("[", ", ", "]")
    }
  }

  // ---- harnesses (the StreamingMatrixSpec shape) ---------------------------

  private def typedStream(json: String): Map[String, Int] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String, Long, Seq[Long])]
    val out = scala.collection.mutable.Buffer.empty[String]
    input.addData(docs.take(2): _*)
    val q = new StreamingPipeline(pipeline).start(
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

  private def typedBatch(json: String): Map[String, Int] =
    pipeline.run(prep(docs.toDF("_id", "g", "v", "arr")), json).toJSON.collect()
      .groupBy(identity).map { case (k, v) => (k, v.size) }

  private def dynStream(json: String, tag: String)
      : Map[com.fasterxml.jackson.databind.JsonNode, Int] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val out = graft.dynamic.DynPipeline.run(input.toDF().toDF("doc"), json)
    val name = s"streamfuzz_$tag"
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

  private def dynBatch(json: String)
      : Map[com.fasterxml.jackson.databind.JsonNode, Int] =
    graft.dynamic.DynPipeline.run(dynDocs.toDF("doc"), json)
      .select("doc").collect()
      .map(r => graft.dynamic.DynJson.parse(r.getString(0)))
      .groupBy(identity).map { case (k, v) => (k, v.size) }

  // ---- the fuzz loop -------------------------------------------------------

  seeds.foreach { seed =>
    test(s"seed $seed: 100 random stateless pipelines run stream ≡ batch") {
      val gen = new Gen(new Random(seed))
      (0 until 100).foreach { i =>
        val p = gen.pipeline()
        withClue(s"seed $seed #$i $p: ") {
          if (i % 2 == 0) assert(typedStream(p) == typedBatch(p))
          else assert(dynStream(p, s"s${seed}_$i") == dynBatch(p))
        }
      }
    }
  }
}
