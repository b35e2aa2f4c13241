package graft

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.ObjectNode
import graft.dynamic.{DynJson, DynPipeline}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Differential testing: the TYPED engine (spec → Catalyst Columns over a
  * schema) and the DYNAMIC engine (spec → Jackson-tree programs over
  * schemaless JSON) run the SAME pipelines over the SAME rows; outputs must
  * agree document-by-document after normalization (null fields dropped —
  * the typed engine cannot distinguish null from missing in its JSON dump;
  * numeric 1 == 1.0). Pipelines with engine-unspecified orders (e.g. $push
  * across partitions) are excluded by construction: group inputs
  * coalesce(1) where encounter order matters.
  */
class DifferentialSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    ("0", 1L, 1.5, "Alpha", Seq(1L, 2L, 3L)),
    ("1", -2L, 2.5, "beta", Seq(4L)),
    ("2", 3L, -0.5, "Gamma gamma", Seq.empty[Long]),
    ("3", 4L, 0.0, "delta", Seq(7L, 8L)),
    ("4", 5L, 12.25, "Alpha", Seq(9L)))

  private lazy val typedDf: DataFrame =
    rows.toDF("_id", "a", "b", "s", "arr").coalesce(1)
  private lazy val dynDf: DataFrame = typedDf
    .select(to_json(struct(typedDf.columns.map(col): _*)).as("doc")).coalesce(1)

  /** Drop null fields recursively (typed JSON dumps cannot carry them
    * distinctly) and canonicalize numbers via DynJson's comparator. */
  private def norm(n: JsonNode): JsonNode = n match {
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
    case v => v
  }

  private def typedOut(pipeline: String): Set[JsonNode] =
    new Pipeline().run(typedDf, pipeline).toJSON.collect()
      .map(s => norm(DynJson.parse(s))).toSet

  private def dynOut(pipeline: String): Set[JsonNode] =
    DynPipeline.run(dynDf, pipeline).select("doc").collect()
      .map(r => norm(DynJson.parse(r.getString(0)))).toSet

  private def agree(pipeline: String): Unit = {
    val (t, d) = (typedOut(pipeline), dynOut(pipeline))
    assert(t == d,
      s"engines disagree on $pipeline\n typed: $t\n dynamic: $d")
  }

  private val pipelines = Seq(
    // projections / transforms
    """[{"$project": {"a": 1, "s": 1}}]""",
    """[{"$project": {"arr": 0, "b": 0}}]""",
    """[{"$addFields": {"c": {"$add": ["$a", 10]},
         "d": {"$multiply": ["$a", "$a"]}}}]""",
    """[{"$addFields": {"t": {"$cond": [{"$gt": ["$a", 2]}, "big", "small"]}}},
        {"$project": {"t": 1}}]""",
    """[{"$addFields": {"u": {"$toUpper": "$s"}, "l": {"$strLenCP": "$s"}}},
        {"$project": {"u": 1, "l": 1}}]""",
    """[{"$addFields": {"h": {"$arrayElemAt": ["$arr", 0]},
         "n": {"$size": "$arr"}}}, {"$unset": ["arr", "s", "b"]}]""",
    """[{"$addFields": {"sl": {"$slice": ["$arr", 2]},
         "sum": {"$sum": "$arr"}}}, {"$project": {"sl": 1, "sum": 1}}]""",
    """[{"$addFields": {"m": {"$map": {"input": "$arr", "as": "x",
         "in": {"$multiply": ["$$x", 2]}}}}}, {"$project": {"m": 1}}]""",
    """[{"$addFields": {"f": {"$filter": {"input": "$arr", "as": "x",
         "cond": {"$gt": ["$$x", 2]}}}}}, {"$project": {"f": 1}}]""",
    """[{"$replaceWith": {"_id": "$_id", "k": {"$concat": ["$s", "!"]}}}]""",
    """[{"$addFields": {"r": {"$round": [{"$divide": ["$b", 3]}, 3]},
         "md": {"$mod": ["$a", 3]}}}, {"$project": {"r": 1, "md": 1}}]""",
    """[{"$addFields": {"sw": {"$switch": {"branches": [
          {"case": {"$lt": ["$a", 0]}, "then": "neg"},
          {"case": {"$eq": ["$a", 1]}, "then": "one"}],
          "default": "other"}}}}, {"$project": {"sw": 1}}]""",
    // match
    """[{"$match": {"a": {"$gte": 3}}}, {"$project": {"a": 1}}]""",
    """[{"$match": {"$or": [{"s": "Alpha"}, {"a": {"$lt": 0}}]}},
        {"$project": {"s": 1}}]""",
    """[{"$match": {"arr": {"$size": 1}}}, {"$project": {"_id": 1}}]""",
    """[{"$match": {"s": {"$regex": "^al", "$options": "i"}}},
        {"$project": {"_id": 1}}]""",
    """[{"$match": {"$expr": {"$gt": [{"$abs": "$b"}, 1.0]}}},
        {"$project": {"_id": 1}}]""",
    """[{"$match": {"arr": {"$all": [1, 2]}}}, {"$project": {"_id": 1}}]""",
    // expansion
    """[{"$unwind": "$arr"}, {"$project": {"arr": 1}}]""",
    """[{"$unwind": {"path": "$arr", "preserveNullAndEmptyArrays": true,
                     "includeArrayIndex": "i"}},
        {"$project": {"arr": 1, "i": 1}}]""",
    // aggregation
    """[{"$group": {"_id": "$s", "n": {"$sum": 1},
                    "tot": {"$sum": "$a"}}}]""",
    """[{"$group": {"_id": null, "mx": {"$max": "$b"}, "mn": {"$min": "$b"},
                    "avg": {"$avg": "$a"}}}]""",
    """[{"$group": {"_id": {"$mod": ["$a", 2]},
                    "n": {"$count": {}}}}]""",
    """[{"$group": {"_id": "$s", "med": {"$median": {"input": "$a",
          "method": "approximate"}}}}]""",
    """[{"$group": {"_id": null, "hi2": {"$maxN": {"input": "$a", "n": 2}},
                    "lo2": {"$minN": {"input": "$a", "n": 2}}}}]""",
    """[{"$group": {"_id": null, "top": {"$top": {"output": "$s",
          "sortBy": {"a": -1}}}}}]""",
    """[{"$sortByCount": "$s"}]""",
    // KNOWN DEVIATION (schema-first): a default of a DIFFERENT type than
    // the boundaries ("rest") makes Catalyst coerce the typed $switch to
    // string, so typed _id would be "0"/"-5" where dynamic keeps numbers —
    // mixed-type _id needs the dynamic engine. Same-type default agrees:
    """[{"$bucket": {"groupBy": "$a", "boundaries": [-5, 0, 3, 10],
          "default": 99, "output": {"n": {"$sum": 1}}}}]""",
    """[{"$count": "total"}]""",
    // windows
    """[{"$setWindowFields": {"partitionBy": "$s", "sortBy": {"a": 1},
          "output": {"rn": {"$documentNumber": {}},
                     "run": {"$sum": "$a", "window":
                       {"documents": ["unbounded", "current"]}},
                     "rest": {"$sum": "$a", "window":
                       {"documents": ["current", "unbounded"]}}}}},
        {"$project": {"rn": 1, "run": 1, "rest": 1}}]""",
    // batch-only stages
    """[{"$sort": {"a": -1}}, {"$limit": 2}, {"$project": {"a": 1}}]""",
    """[{"$sort": {"b": 1}}, {"$skip": 3}, {"$project": {"_id": 1}}]""",
    """[{"$facet": {"pos": [{"$match": {"a": {"$gt": 0}}}, {"$count": "n"}],
                    "neg": [{"$match": {"a": {"$lt": 0}}}, {"$count": "n"}]}},
        {"$unwind": "$pos"}, {"$unwind": "$neg"},
        {"$project": {"p": "$pos.n", "m": "$neg.n"}}]""",
    """[{"$documents": [{"x": 1}, {"x": 2}]},
        {"$addFields": {"y": {"$multiply": ["$x", 3]}}}]""")

  test("typed and dynamic engines agree on the differential pipeline corpus") {
    pipelines.foreach(agree)
  }
}
