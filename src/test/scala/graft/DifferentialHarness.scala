package graft

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.ObjectNode
import graft.dynamic.{DynJson, DynPipeline}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Shared differential-testing harness: the TYPED engine (spec → Catalyst
  * Columns over a schema) and the DYNAMIC engine (spec → Jackson-tree
  * programs over schemaless JSON) run the SAME pipelines over the SAME
  * rows; outputs must agree document-by-document after normalization
  * (null fields dropped — the typed engine cannot distinguish null from
  * missing in its JSON dump; numeric 1 == 1.0). Used by the hand-written
  * corpus ([[DifferentialSpec]]) and the grammar fuzzer
  * ([[DifferentialFuzzSpec]]).
  */
trait DifferentialHarness { this: SparkSpec =>
  import spark.implicits._

  // null-bearing rows too: to_json drops nulls, so the dynamic engine sees
  // MISSING where the typed engine sees SQL null — the intended equivalence
  protected val diffRows = Seq(
    ("0", Some(1L), Some(1.5), Some("Alpha"), Some(Seq(1L, 2L, 3L)),
      "2024-01-15T10:30:00Z"),
    ("1", Some(-2L), Some(2.5), Some("beta"), Some(Seq(4L)),
      "2024-02-29T23:59:59Z"),
    ("2", Some(3L), Some(-0.5), Some("Gamma gamma"), Some(Seq.empty[Long]),
      "2023-12-31T00:00:00Z"),
    ("3", Some(4L), Some(0.0), Some("delta"), Some(Seq(7L, 8L)),
      "2024-07-04T12:00:00Z"),
    ("4", Some(5L), Some(12.25), Some("Alpha"), Some(Seq(9L)),
      "2024-01-15T10:30:00Z"),
    ("5", None, Some(3.5), None, Some(Seq(1L)), "2024-03-01T08:00:00Z"),
    ("6", Some(7L), None, Some("eta"), None, "2024-03-02T08:00:00Z"))

  protected lazy val typedDf: DataFrame = diffRows
    .toDF("_id", "a", "b", "s", "arr", "d0")
    // the typed engine sees a real timestamp column; the dynamic engine
    // sees the ISO string (JSON has no date type) — same instants
    .withColumn("d", to_timestamp(col("d0"))).drop("d0")
    .coalesce(1)
  protected lazy val dynDf: DataFrame = typedDf
    .select(to_json(struct(typedDf.columns.map(col): _*)).as("doc")).coalesce(1)

  private val isoTs =
    """\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(\.\d+)?Z?""".r

  /** Drop null fields recursively (typed JSON dumps cannot carry them
    * distinctly) and canonicalize numbers via DynJson's comparator. */
  protected def norm(n: JsonNode): JsonNode = n match {
    case o: ObjectNode =>
      val out = DynJson.obj()
      o.fields().asScala.foreach { e =>
        if (!e.getValue.isNull) out.set[JsonNode](e.getKey, norm(e.getValue))
      }
      out
    case a if a.isArray =>
      val out = DynJson.arr()
      a.asScala.foreach(e => out.add(norm(e)))
      out
    case v if v.isNumber => // 1 vs 1.0: canonical decimal form
      if (v.isIntegralNumber) DynJson.parse(v.longValue.toString)
      else if (v.doubleValue == math.rint(v.doubleValue) &&
        math.abs(v.doubleValue) < 9.007199254740992e15)
        DynJson.parse(v.doubleValue.toLong.toString)
      else v
    case v if v.isTextual && isoTs.matches(v.textValue) =>
      // engines render instants differently (trailing .000 etc.)
      DynJson.text(java.time.Instant.parse(
        if (v.textValue.endsWith("Z")) v.textValue else v.textValue + "Z")
        .toString)
    case v => v
  }

  protected def typedOut(pipeline: String): Set[JsonNode] =
    new Pipeline().run(typedDf, pipeline).toJSON.collect()
      .map(s => norm(DynJson.parse(s))).toSet

  protected def dynOut(pipeline: String): Set[JsonNode] =
    DynPipeline.run(dynDf, pipeline).select("doc").collect()
      .map(r => norm(DynJson.parse(r.getString(0)))).toSet

  protected def agree(pipeline: String): Unit = {
    val (t, d) = (typedOut(pipeline), dynOut(pipeline))
    assert(t == d,
      s"engines disagree on $pipeline\n typed: $t\n dynamic: $d")
  }

  // ---- catalog tables for $lookup/$unionWith/$graphLookup -----------------
  // "dim": unique join key k, no chains; "g": a 1->3->4->7->1 CYCLE plus a
  // self-loop, so graphLookup fuzzing exercises cycle-safety and first-visit
  // depths, not just one-hop walks
  protected lazy val dimTyped: DataFrame = Seq(
    (1L, "one", 10L), (3L, "three", 30L), (4L, "four", 40L), (7L, "seven", 70L))
    .toDF("k", "name", "nxt").coalesce(1)
  protected lazy val dimDyn: DataFrame = dimTyped
    .select(to_json(struct(dimTyped.columns.map(col): _*)).as("doc")).coalesce(1)
  protected lazy val gTyped: DataFrame = Seq(
    (1L, 3L, "a"), (3L, 4L, "b"), (4L, 7L, "c"), (7L, 1L, "d"), (5L, 5L, "e"))
    .toDF("k", "nxt", "tag").coalesce(1)
  protected lazy val gDyn: DataFrame = gTyped
    .select(to_json(struct(gTyped.columns.map(col): _*)).as("doc")).coalesce(1)

  protected def agreeCat(pipeline: String): Unit = {
    val t = new Pipeline(catalog = { case "dim" => dimTyped; case "g" => gTyped })
      .run(typedDf, pipeline).toJSON.collect()
      .map(s => norm(DynJson.parse(s))).toSet
    val d = DynPipeline.run(dynDf, pipeline,
      DynPipeline.DynCtx(catalog = { case "dim" => dimDyn; case "g" => gDyn }))
      .select("doc").collect()
      .map(r => norm(DynJson.parse(r.getString(0)))).toSet
    assert(t == d,
      s"engines disagree on $pipeline\n typed: $t\n dynamic: $d")
  }
}
