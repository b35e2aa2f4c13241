package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Per-stage semantics mirroring the reference's test corpus
  * (/root/reference/src/test/java/net/pincette/mongo/streams/Test*.java —
  * see FIXTURES.md §2 for the document shapes). */
class StagesSpec extends SparkSpec {
  import spark.implicits._

  // flat-scalar fixture (TestGroup/TestMatch/TestBucket shape)
  private def flat = Seq(("0", 0L), ("1", 1L), ("2", 2L), ("3", 3L))
    .toDF("_id", "test")

  // ---- $match (TestMatch.java) -------------------------------------------
  test("$match equality and operators") {
    assert(sorted1[String](
      pipeline.run(flat, """[{"$match": {"test": 2}}]"""), "_id") == List("2"))
    assert(sorted1[String](
      pipeline.run(flat, """[{"$match": {"test": {"$gte": 1, "$lt": 3}}}]"""),
      "_id") == List("1", "2"))
    assert(sorted1[String](
      pipeline.run(flat, """[{"$match": {"$or": [{"test": 0}, {"test": 3}]}}]"""),
      "_id") == List("0", "3"))
    assert(sorted1[String](
      pipeline.run(flat, """[{"$match": {"test": {"$in": [1, 2]}}}]"""),
      "_id") == List("1", "2"))
    assert(sorted1[String](
      pipeline.run(flat, """[{"$match": {"test": {"$not": {"$gt": 1}}}}]"""),
      "_id") == List("0", "1"))
    assert(sorted1[String](
      pipeline.run(flat,
        """[{"$match": {"$expr": {"$eq": [{"$mod": ["$test", 2]}, 0]}}}]"""),
      "_id") == List("0", "2"))
  }

  test("$match missing fields and array-equality semantics") {
    // missing field: equality-null matches, $exists:false matches
    assert(pipeline.run(flat, """[{"$match": {"nope": null}}]""").count() == 4)
    assert(pipeline.run(flat, """[{"$match": {"nope": {"$exists": false}}}]""").count() == 4)
    assert(pipeline.run(flat, """[{"$match": {"nope": 1}}]""").count() == 0)
    // array field equality matches per element (Mongo {f:1} vs f=[0,1])
    val adf = Seq(("0", Seq(0L, 1L)), ("1", Seq(2L))).toDF("_id", "test")
    assert(sorted1[String](
      pipeline.run(adf, """[{"$match": {"test": 1}}]"""), "_id") == List("0"))
  }

  // ---- $addFields (TestAddFields.java: deep merge, dotted paths) ---------
  test("$addFields dotted path creates nested objects") {
    val out = pipeline.run(flat,
      """[{"$addFields": {"test4.test.test1": {"$add": ["$test", 10]},
                          "plain": "x"}}]""")
    val r = out.filter($"_id" === "2").select("test4.test.test1", "plain").head()
    assert(r.getLong(0) == 12L && r.getString(1) == "x")
  }

  test("$addFields overwrites non-object intermediate values") {
    val df = Seq(("0", 1L)).toDF("_id", "a")
    val out = pipeline.run(df, """[{"$addFields": {"a.b": 5}}]""")
    assert(out.select("a.b").head().getInt(0) == 5)
  }

  // ---- $project (TestProject.java) ---------------------------------------
  test("$project include keeps _id unless excluded") {
    val df = Seq(("0", 1L, 2L)).toDF("_id", "test1", "test2")
    assert(pipeline.run(df, """[{"$project": {"test1": 1}}]""").columns.toSeq
      == Seq("_id", "test1"))
    assert(pipeline.run(df, """[{"$project": {"test1": 1, "_id": 0}}]""")
      .columns.toSeq == Seq("test1"))
  }

  test("$project nested include via dotted path and nested spec") {
    val df = Seq(("0", 1L, 2L)).toDF("_id", "t1", "t2")
      .select($"_id", struct($"t1".as("test1"), $"t2".as("test2")).as("test3"))
    val a = pipeline.run(df, """[{"$project": {"test3.test1": 1, "_id": 0}}]""")
    assert(a.select("test3.test1").head().getLong(0) == 1L)
    assert(a.select("test3.*").columns.toSeq == Seq("test1"))
    val b = pipeline.run(df, """[{"$project": {"test3": {"test1": 1}, "_id": 0}}]""")
    assert(b.select("test3.*").columns.toSeq == Seq("test1"))
  }

  test("$project exclude mode and mixed-mode rejection") {
    val df = Seq(("0", 1L, 2L)).toDF("_id", "test1", "test2")
    assert(pipeline.run(df, """[{"$project": {"test2": 0}}]""").columns.toSeq
      == Seq("_id", "test1"))
    intercept[IllegalArgumentException] {
      pipeline.run(df, """[{"$project": {"test1": 1, "test2": 0}}]""")
    }
  }

  test("$project computed + $$REMOVE") {
    val df = Seq(("0", 1L)).toDF("_id", "test")
    val out = pipeline.run(df,
      """[{"$project": {"doubled": {"$multiply": ["$test", 2]},
                        "gone": "$$REMOVE", "_id": 0}}]""")
    assert(out.columns.toSeq == Seq("doubled"))
    assert(out.head().getLong(0) == 2L)
  }

  // ---- $unset (TestUnset.java) -------------------------------------------
  test("$unset drops top-level and nested fields") {
    val df = Seq(("0", 1L, (2L, 3L))).toDF("_id", "a", "b")
    assert(pipeline.run(df, """[{"$unset": "a"}]""").columns.toSeq == Seq("_id", "b"))
    val out = pipeline.run(df, """[{"$unset": ["a", "b._2"]}]""")
    assert(out.select("b.*").columns.toSeq == Seq("_1"))
  }

  // ---- $replaceWith / $replaceRoot (re-key by new _id) -------------------
  test("$replaceWith re-keys by the new document's _id") {
    val df = Seq(("k0", "old", ("inner", 5L))).toDF("key", "_id", "sub")
      .select($"key", $"_id", struct($"sub._1".as("_id"), $"sub._2".as("test")).as("sub"))
    val out = pipeline.run(df, """[{"$replaceWith": "$sub"}]""")
    assert(out.columns.toSeq == Seq("key", "_id", "test"))
    assert(out.head().getString(0) == "inner") // key = new _id (ReplaceWith.java:33-36)
  }

  // ---- $setKey (TestSetKey.java) -----------------------------------------
  test("$setKey stringifies the expression value") {
    val df = Seq(("a", 7L)).toDF("key", "test")
    assert(pipeline.run(df, """[{"$setKey": "$test"}]""")
      .select("key").head().getString(0) == "7")
  }

  // ---- $unwind (TestUnwind.java) -----------------------------------------
  private def arrDf = Seq(("0", Seq(1L, 2L, 3L)), ("1", Seq.empty[Long]))
    .toDF("_id", "test")

  test("$unwind basic drops empty arrays") {
    val out = pipeline.run(arrDf, """[{"$unwind": "$test"}]""")
    assert(sorted1[Long](out, "test") == List(1L, 2L, 3L))
  }

  test("$unwind preserveNullAndEmptyArrays keeps the empty-array doc") {
    val out = pipeline.run(arrDf,
      """[{"$unwind": {"path": "$test", "preserveNullAndEmptyArrays": true}}]""")
    assert(out.count() == 4)
    assert(out.filter($"_id" === "1").select("test").head().isNullAt(0))
  }

  test("$unwind includeArrayIndex") {
    val out = pipeline.run(arrDf,
      """[{"$unwind": {"path": "$test", "includeArrayIndex": "idx"}}]""")
    assert(rows(out.select("test", "idx")) ==
      Set(List(1L, 0L), List(2L, 1L), List(3L, 2L)))
  }

  test("$unwind newIds generates unique _id and re-keys") {
    val df = Seq(("k", "0", Seq(1L, 2L))).toDF("key", "_id", "test")
    val out = pipeline.run(df, """[{"$unwind": {"path": "$test", "newIds": true}}]""")
    val ids = out.select("_id").collect().map(_.getString(0))
    assert(ids.distinct.length == 2)
    assert(rows(out.select("key")) == rows(out.select("_id")))
  }

  test("$unwind nested path replaces the element in place") {
    val df = Seq(("0", Seq(1L, 2L))).toDF("_id", "raw")
      .select($"_id", struct($"raw".as("arr"), lit("z").as("other")).as("sub"))
    val out = pipeline.run(df, """[{"$unwind": "$sub.arr"}]""")
    assert(out.count() == 2)
    assert(sorted1[Long](out.select($"sub.arr".as("v")), "v") == List(1L, 2L))
    assert(out.select("sub.other").head().getString(0) == "z")
  }

  // ---- $group (TestGroup.java) -------------------------------------------
  test("$group accumulators") {
    val df = Seq(("0", "a", 1L), ("1", "a", 2L), ("2", "b", 3L), ("3", "a", 2L))
      .toDF("_id", "g", "v")
    val out = pipeline.run(df,
      """[{"$group": {"_id": "$g",
            "s": {"$sum": "$v"}, "av": {"$avg": "$v"}, "n": {"$count": {}},
            "mx": {"$max": "$v"}, "mn": {"$min": "$v"},
            "set": {"$addToSet": "$v"}, "ps": {"$push": "$v"}}}]""")
    val a = out.filter($"_id" === "a").head()
    assert(a.getAs[Long]("s") == 5L && a.getAs[Double]("av") == 5.0 / 3)
    assert(a.getAs[Long]("n") == 3L && a.getAs[Long]("mx") == 2L && a.getAs[Long]("mn") == 1L)
    assert(a.getSeq[Long](a.fieldIndex("set")).toList == List(1L, 2L)) // sorted (Group.java:130-149)
    assert(a.getSeq[Long](a.fieldIndex("ps")).toList.sorted == List(1L, 2L, 2L))
  }

  test("$group modern-MQL accumulators: median/percentile/maxN/minN/stdDevSamp") {
    val df = Seq(("0", "a", 1.0), ("1", "a", 2.0), ("2", "a", 3.0),
      ("3", "a", 4.0), ("4", "b", 10.0)).toDF("_id", "g", "v")
    val out = pipeline.run(df,
      """[{"$group": {"_id": "$g",
            "med": {"$median": {"input": "$v"}},
            "pct": {"$percentile": {"input": "$v", "p": [0.25, 0.75]}},
            "top2": {"$maxN": {"input": "$v", "n": 2}},
            "low2": {"$minN": {"input": "$v", "n": 2}},
            "sd": {"$stdDevSamp": "$v"}}}]""")
    val a = out.filter($"_id" === "a").head()
    assert(a.getAs[Double]("med") == 2.5)
    assert(a.getSeq[Double](a.fieldIndex("pct")).toList == List(1.75, 3.25))
    assert(a.getSeq[Double](a.fieldIndex("top2")).toList == List(4.0, 3.0))
    assert(a.getSeq[Double](a.fieldIndex("low2")).toList == List(1.0, 2.0))
    assert(math.abs(a.getAs[Double]("sd") - 1.2909944487358056) < 1e-12)
  }

  test("$group $top/$bottom/$topN/$bottomN with directional sortBy") {
    val df = Seq(("0", "a", 1L, "w1"), ("1", "a", 3L, "w3"),
      ("2", "a", 2L, "w2"), ("3", "b", 9L, "w9")).toDF("_id", "g", "v", "w")
    val out = pipeline.run(df,
      """[{"$group": {"_id": "$g",
            "hi":  {"$top":    {"output": "$w", "sortBy": {"v": -1}}},
            "lo":  {"$bottom": {"output": "$w", "sortBy": {"v": -1}}},
            "hi2": {"$topN":   {"output": "$w", "sortBy": {"v": -1}, "n": 2}},
            "lo2": {"$bottomN":{"output": "$w", "sortBy": {"v": -1}, "n": 2}}}}]""")
    val a = out.filter($"_id" === "a").head()
    assert(a.getAs[String]("hi") == "w3" && a.getAs[String]("lo") == "w1")
    assert(a.getSeq[String](a.fieldIndex("hi2")).toList == List("w3", "w2"))
    assert(a.getSeq[String](a.fieldIndex("lo2")).toList == List("w2", "w1"))
  }

  test("$group $firstN/$lastN: first/last n in encounter order") {
    val df = Seq(("0", "a", 1L), ("1", "a", 2L), ("2", "a", 3L), ("3", "b", 9L))
      .toDF("_id", "g", "v").coalesce(1)
    val out = pipeline.run(df,
      """[{"$group": {"_id": "$g",
            "f2": {"$firstN": {"input": "$v", "n": 2}},
            "l2": {"$lastN":  {"input": "$v", "n": 2}}}}]""")
    val a = out.filter($"_id" === "a").head()
    assert(a.getSeq[Long](a.fieldIndex("f2")).toList == List(1L, 2L))
    assert(a.getSeq[Long](a.fieldIndex("l2")).toList == List(2L, 3L))
    val b = out.filter($"_id" === "b").head()
    assert(b.getSeq[Long](b.fieldIndex("l2")).toList == List(9L))
  }

  test("$setWindowFields: running sum, rank family, shift, bounded frame") {
    val df = Seq(("0", "a", 1L, 10.0), ("1", "a", 2L, 20.0), ("2", "a", 3L, 30.0),
      ("3", "b", 1L, 5.0)).toDF("_id", "g", "seq", "v")
    val out = pipeline.run(df,
      """[{"$setWindowFields": {
            "partitionBy": "$g", "sortBy": {"seq": 1},
            "output": {
              "run":  {"$sum": "$v",
                       "window": {"documents": ["unbounded", "current"]}},
              "tot":  {"$sum": "$v"},
              "num":  {"$documentNumber": {}},
              "prev": {"$shift": {"output": "$v", "by": -1, "default": -1}},
              "win2": {"$sum": "$v", "window": {"documents": [-1, "current"]}}}}}]""")
    val rows = out.filter($"g" === "a").orderBy("seq")
      .select("run", "tot", "num", "prev", "win2").collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getInt(2), r.getDouble(3),
        r.getDouble(4))).toList
    // `tot` has no window: Mongo's default is the WHOLE partition even
    // with sortBy — not the SQL cumulative default
    assert(rows == List((10.0, 60.0, 1, -1.0, 10.0), (30.0, 60.0, 2, 10.0, 30.0),
      (60.0, 60.0, 3, 20.0, 50.0)))
  }

  test("$setWindowFields: $median/$percentile window functions (Mongo 7)") {
    val df = Seq(("0", "a", 1L, 10.0), ("1", "a", 2L, 20.0), ("2", "a", 3L, 40.0),
      ("3", "b", 1L, 5.0)).toDF("_id", "g", "seq", "v")
    val out = pipeline.run(df,
      """[{"$setWindowFields": {
            "partitionBy": "$g", "sortBy": {"seq": 1},
            "output": {
              "med":  {"$median": {"input": "$v", "method": "approximate"}},
              "runMed": {"$median": {"input": "$v", "method": "approximate"},
                         "window": {"documents": ["unbounded", "current"]}},
              "pcts": {"$percentile": {"input": "$v", "p": [0.5, 1.0],
                                       "method": "approximate"}}}}}]""")
    val rows = out.filter($"g" === "a").orderBy("seq")
      .select("med", "runMed", "pcts").collect()
    assert(rows.map(_.getDouble(0)).toList == List(20.0, 20.0, 20.0))
    assert(rows.map(_.getDouble(1)).toList == List(10.0, 15.0, 20.0))
    assert(rows.map(_.getSeq[Double](2).toList).toList ==
      List.fill(3)(List(20.0, 40.0)))
  }

  test("$setWindowFields: shrinking [lo, unbounded) frames keep sort-order semantics") {
    // these frames are planned on the REVERSED sort (incremental instead of
    // O(partition^2)); order-sensitive ops must still see the sort order
    val df = Seq(("0", "a", 1L, 10.0), ("1", "a", 2L, 20.0), ("2", "a", 3L, 30.0),
      ("3", "a", 4L, 40.0), ("4", "b", 1L, 5.0)).toDF("_id", "g", "seq", "v")
    val out = pipeline.run(df,
      """[{"$setWindowFields": {
            "partitionBy": "$g", "sortBy": {"seq": 1},
            "output": {
              "restSum": {"$sum": "$v",
                          "window": {"documents": ["current", "unbounded"]}},
              "nxt":  {"$first": "$v",
                       "window": {"documents": [1, "unbounded"]}},
              "fin":  {"$last": "$v",
                       "window": {"documents": ["current", "unbounded"]}},
              "rest": {"$push": "$v",
                       "window": {"documents": ["current", "unbounded"]}},
              "slope": {"$derivative": {"input": "$v"},
                        "window": {"documents": ["current", "unbounded"]}}}}}]""")
    val rows = out.filter($"g" === "a").orderBy("seq")
      .select("restSum", "nxt", "fin", "rest", "slope").collect()
    assert(rows.map(_.getDouble(0)).toList == List(100.0, 90.0, 70.0, 40.0))
    assert(rows.map(r => Option(r.get(1)).map(_.asInstanceOf[Double])).toList ==
      List(Some(20.0), Some(30.0), Some(40.0), None))
    assert(rows.map(_.getDouble(2)).toList == List(40.0, 40.0, 40.0, 40.0))
    assert(rows.map(_.getSeq[Double](3).toList).toList == List(
      List(10.0, 20.0, 30.0, 40.0), List(20.0, 30.0, 40.0),
      List(30.0, 40.0), List(40.0)))
    // derivative over [current, unbounded): (v_last - v_current)/(x_last - x_current)
    assert(rows.map(r => Option(r.get(4)).map(_.asInstanceOf[Double])).toList ==
      List(Some(10.0), Some(10.0), Some(10.0), None))
  }

  test("$setWindowFields: no sortBy = whole-partition frame; global window without partitionBy") {
    val df = Seq(("0", "a", 1.0), ("1", "a", 2.0), ("2", "b", 4.0))
      .toDF("_id", "g", "v")
    val perPart = pipeline.run(df,
      """[{"$setWindowFields": {"partitionBy": "$g",
            "output": {"tot": {"$sum": "$v"}}}}]""")
    assert(perPart.filter($"g" === "a").select("tot").collect()
      .map(_.getDouble(0)).toList == List(3.0, 3.0))
    val global = pipeline.run(df,
      """[{"$setWindowFields": {"output": {"tot": {"$sum": "$v"}}}}]""")
    assert(global.select("tot").collect().map(_.getDouble(0)).toSet == Set(7.0))
  }

  test("$documents replaces the stream; collection-less $unionWith") {
    val df = Seq(("0", 1L)).toDF("_id", "v")
    val docs = pipeline.run(df,
      """[{"$documents": [{"a": 1, "b": "x"}, {"a": 2, "b": "y"}]}]""")
    assert(docs.select("a", "b").collect().map(r => (r.getLong(0), r.getString(1)))
      .toSet == Set((1L, "x"), (2L, "y")))
    val unioned = pipeline.run(df.select(col("v").as("a")),
      """[{"$unionWith": {"pipeline": [{"$documents": [{"a": 7}]}]}}]""")
    assert(unioned.select("a").collect().map(_.getLong(0)).toSet == Set(1L, 7L))
    intercept[IllegalArgumentException] {
      pipeline.run(df, """[{"$unionWith": {"pipeline": [{"$limit": 1}]}}]""")
    }
  }

  test("$sampleRate keeps ~p of docs; $rand is uniform [0,1)") {
    val df = (1 to 2000).map(i => ("" + i, i.toLong)).toDF("_id", "v")
    val kept = pipeline.run(df, """[{"$match": {"$sampleRate": 0.5}}]""").count()
    assert(kept > 600 && kept < 1400, s"$kept of 2000 at rate 0.5")
    assert(pipeline.run(df, """[{"$match": {"$sampleRate": 0}}]""").count() == 0)
    val r = pipeline.run(df.limit(100),
      """[{"$project": {"r": {"$rand": {}}}}]""")
      .select("r").collect().map(_.getDouble(0))
    assert(r.forall(x => x >= 0 && x < 1) && r.distinct.length > 50)
  }

  test("$match $type (schema-static) and $regex with $options") {
    val df = Seq(("0", "Alpha", 1L), ("1", "beta", 2L), ("2", null, 3L))
      .toDF("_id", "s", "n")
    def ids(q: String): Set[String] =
      pipeline.run(df, q).select("_id").collect().map(_.getString(0)).toSet
    assert(ids("""[{"$match": {"s": {"$type": "string"}}}]""") == Set("0", "1"))
    assert(ids("""[{"$match": {"s": {"$type": "null"}}}]""") == Set("2"))
    assert(ids("""[{"$match": {"n": {"$type": ["long", "double"]}}}]""") ==
      Set("0", "1", "2"))
    assert(ids("""[{"$match": {"n": {"$type": "string"}}}]""") == Set.empty)
    assert(ids("""[{"$match": {"s": {"$regex": "^al", "$options": "i"}}}]""") ==
      Set("0"))
    assert(ids("""[{"$match": {"s": {"$regex": "^al"}}}]""") == Set.empty)
  }

  test("$search text: BM25 relevance, only matches survive, $meta searchScore") {
    val df = Seq(
      ("a", "spark spark spark"),
      ("b", "spark and other words here"),
      ("c", "nothing relevant at all")).toDF("_id", "body")
    val out = pipeline.run(df,
      """[{"$search": {"text": {"query": "spark", "path": "body"}}},
          {"$project": {"_id": 1,
            "sc": {"$round": [{"$meta": "searchScore"}, 6]}}}]""")
    val got = out.collect().map(r => (r.getString(0), r.getDouble(1))).toList
    assert(got.map(_._1) == List("a", "b")) // c never matches; a denser
    assert(got.forall(_._2 > 0))
    intercept[IllegalArgumentException] {
      pipeline.run(df, """[{"$search": {"compound": {}}}]""")
    }
  }

  test("$rankFusion: weighted RRF over sort + vectorSearch pipelines, $meta score") {
    val df = Seq(
      ("a", 10.0, Array(1.0f, 0.0f)),
      ("b", 40.0, Array(0.8f, 0.6f)),
      ("c", 30.0, Array(0.0f, 1.0f)),
      ("d", 20.0, Array(-1.0f, 0.0f))).toDF("_id", "pop", "vec")
    val out = pipeline.run(df,
      """[{"$rankFusion": {
            "input": {"pipelines": {
              "byPop": [{"$sort": {"pop": -1}}, {"$limit": 3}],
              "byVec": [{"$vectorSearch": {"path": "vec",
                          "queryVector": [1.0, 0.0], "limit": 3}}]}},
            "combination": {"weights": {"byPop": 2, "byVec": 1}}}},
          {"$project": {"_id": 1,
            "score": {"$round": [{"$meta": "score"}, 6]}}}]""")
    val got = out.collect().map(r => (r.getString(0), r.getDouble(1))).toList
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    // byPop ranks: b,c,d; byVec ranks (cosine vs [1,0]): a,b,c
    val want = List(
      "b" -> r6(2.0 / 61 + 1.0 / 62), // pop rank 1, vec rank 2
      "c" -> r6(2.0 / 62 + 1.0 / 63), // pop rank 2, vec rank 3
      "d" -> r6(2.0 / 63),            // pop rank 3 only
      "a" -> r6(1.0 / 61))            // vec rank 1 only
      .sortBy { case (id, s) => (-s, id) }
    assert(got == want)
    intercept[IllegalArgumentException] { // unbounded pipeline refused
      pipeline.run(df, """[{"$rankFusion": {"input": {"pipelines": {
        "x": [{"$sort": {"pop": 1}}]}}}}]""")
    }
    intercept[IllegalArgumentException] { // non-selection stage refused
      pipeline.run(df, """[{"$rankFusion": {"input": {"pipelines": {
        "x": [{"$project": {"pop": 1}}, {"$limit": 1}]}}}}]""")
    }
  }

  test("$vectorSearch: exact cosine top-k, filter, $meta score") {
    val emb = Seq(("a", Array(1.0f, 0.0f)), ("b", Array(0.6f, 0.8f)),
      ("c", Array(0.0f, 1.0f)), ("d", Array(-1.0f, 0.0f)))
      .toDF("id", "vec")
    val out = pipeline.run(emb,
      """[{"$vectorSearch": {"path": "vec", "queryVector": [1.0, 0.0],
            "limit": 2}},
          {"$project": {"id": 1,
            "score": {"$round": [{"$meta": "vectorSearchScore"}, 4]}}}]""")
    val rows = out.collect().map(r => (r.getString(0), r.getDouble(1))).toList
    assert(rows == List(("a", 1.0), ("b", 0.6)))
    val filtered = pipeline.run(emb,
      """[{"$vectorSearch": {"path": "vec", "queryVector": [1.0, 0.0],
            "limit": 2, "filter": {"id": {"$ne": "a"}}}}]""")
    assert(filtered.select("id").collect().map(_.getString(0)).toList ==
      List("b", "c"))
  }

  test("$graphLookup: BFS depths, cycle termination, maxDepth, restrict") {
    // chain d -> c -> b -> a, plus a 2-cycle x <-> y
    val emp = Seq(("a", null), ("b", "a"), ("c", "b"), ("d", "c"),
      ("x", "y"), ("y", "x")).toDF("name", "boss")
    val p = new Pipeline(catalog = { case "emp" => emp })
    val out = p.run(emp, """[{"$graphLookup": {"from": "emp",
        "startWith": "$boss", "connectFromField": "boss",
        "connectToField": "name", "as": "chain", "depthField": "d"}}]""")
    def chain(n: String): Set[(String, Long)] =
      out.filter($"name" === n).select(explode($"chain")).select("col.name", "col.d")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(chain("d") == Set(("c", 0L), ("b", 1L), ("a", 2L)))
    assert(chain("a") == Set.empty) // null startWith -> empty array
    // cycle: x's bosses are y (0) then x itself (1), visited-dedup stops there
    assert(chain("x") == Set(("y", 0L), ("x", 1L)))
    val capped = p.run(emp, """[{"$graphLookup": {"from": "emp",
        "startWith": "$boss", "connectFromField": "boss",
        "connectToField": "name", "as": "chain", "maxDepth": 0}}]""")
    assert(capped.filter($"name" === "d").select(size($"chain")).head.getInt(0) == 1)
    val restricted = p.run(emp, """[{"$graphLookup": {"from": "emp",
        "startWith": "$boss", "connectFromField": "boss",
        "connectToField": "name", "as": "chain",
        "restrictSearchWithMatch": {"name": {"$ne": "b"}}}}]""")
    // b is excluded from the searchable set: d finds only c (the walk stops)
    assert(restricted.filter($"name" === "d")
      .select(explode($"chain")).select("col.name")
      .collect().map(_.getString(0)).toSet == Set("c"))
  }

  test("$bucketAuto: even-count buckets, tie cohesion, Mongo boundaries") {
    val df = (1 to 7).map(i => (i.toString, i.toDouble)).toDF("_id", "v")
    val out = pipeline.run(df,
      """[{"$bucketAuto": {"groupBy": "$v", "buckets": 2}}]""")
      .select($"_id.min", $"_id.max", $"count").collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2))).sortBy(_._1).toList
    // 7 docs / 2 buckets -> 4 + 3; bucket max = next bucket's min,
    // last max = global max inclusive
    assert(out == List((1.0, 5.0, 4L), (5.0, 7.0, 3L)))
    val ties = Seq("a" -> 1.0, "b" -> 1.0, "c" -> 1.0, "d" -> 1.0, "e" -> 2.0)
      .toDF("_id", "v")
    val out2 = pipeline.run(ties,
      """[{"$bucketAuto": {"groupBy": "$v", "buckets": 2,
            "output": {"n": {"$sum": 1}, "hi": {"$max": "$v"}}}}]""")
      .select($"_id.min", $"_id.max", $"n", $"hi").collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1).toList
    // equal values never split: all four 1.0s stay in bucket 0
    assert(out2 == List((1.0, 2.0, 4L, 1.0), (2.0, 2.0, 1L, 2.0)))
  }

  test("$setWindowFields: calculus + statistics family over one partition") {
    val df = Seq(("0", "a", 1L, Some(0.0)), ("1", "a", 2L, Some(10.0)),
      ("2", "a", 3L, None), ("3", "a", 4L, Some(20.0)))
      .toDF("_id", "g", "x", "v")
    val out = pipeline.run(df,
      """[{"$setWindowFields": {
            "partitionBy": "$g", "sortBy": {"x": 1},
            "output": {
              "slope": {"$derivative": {"input": "$v"},
                        "window": {"documents": [-1, "current"]}},
              "area": {"$integral": {"input": "$v"},
                       "window": {"documents": ["unbounded", "current"]}},
              "fill": {"$linearFill": "$v"},
              "ema": {"$expMovingAvg": {"input": "$v", "N": 3}},
              "sd": {"$stdDevPop": "$v"},
              "cv": {"$covariancePop": [{"$toDouble": "$x"}, "$v"]},
              "rsum": {"$sum": "$v", "window": {"range": [-1, "current"]}}}}}]""")
      .orderBy("x")
    def d(name: String): List[Option[Double]] =
      out.select(name).collect().map(r => Option(r.get(0)).map {
        case x: Double => x; case x: java.lang.Double => x.doubleValue }).toList
    // slope: Δv/Δx over [-1, current]; null frames (single row / null v) stay null
    assert(d("slope") == List(None, Some(10.0), None, None))
    // area: trapezoids (1,2)->5, null-adjacent drop out
    assert(d("area") == List(Some(0.0), Some(5.0), Some(5.0), Some(5.0)))
    // fill: x=3 interpolates 10->20 over x 2->4
    assert(d("fill") == List(Some(0.0), Some(10.0), Some(15.0), Some(20.0)))
    // ema (alpha = 0.5): 0, 5, carry 5, 12.5
    assert(d("ema") == List(Some(0.0), Some(5.0), Some(5.0), Some(12.5)))
    // whole-partition stddev_pop of {0,10,20}
    assert(math.abs(d("sd").head.get - 8.16496580927726) < 1e-12)
    // covar_pop of (x, v) over non-null pairs {(1,0),(2,10),(4,20)} = 10
    assert(d("cv").forall(c => math.abs(c.get - 10.0) < 1e-12))
    // range [-1, current] on x: value-distance frame
    assert(d("rsum") == List(Some(0.0), Some(10.0), Some(10.0), Some(20.0)))
  }

  test("$setWindowFields: range-window $integral integrates only in-frame points") {
    // x: 0,1,2,4,7 with v = 2x; consecutive trapezoid areas 1, 3, 12, 33
    val df = Seq(("0", 0.0, 0.0), ("1", 1.0, 2.0), ("2", 2.0, 4.0),
      ("3", 4.0, 8.0), ("4", 7.0, 14.0)).toDF("_id", "x", "v")
    val out = pipeline.run(df,
      """[{"$setWindowFields": {"sortBy": {"x": 1},
            "output": {
              "back": {"$integral": {"input": "$v"},
                       "window": {"range": [-2, "current"]}},
              "fwd":  {"$integral": {"input": "$v"},
                       "window": {"range": ["current", "unbounded"]}},
              "cum":  {"$integral": {"input": "$v"},
                       "window": {"range": ["unbounded", "current"]}}}}}]""")
      .orderBy("x")
    def d(n: String) = out.select(n).collect().map(_.getDouble(0)).toList
    // back: trapezoids whose BOTH endpoints fall in x ∈ [x_i - 2, x_i] —
    // the entering edge (spanning a point outside the frame) is excluded
    assert(d("back") == List(0.0, 1.0, 4.0, 12.0, 0.0))
    // fwd: x ∈ [x_i, ∞) — the shrinking frame rides the reversed sort order
    assert(d("fwd") == List(49.0, 48.0, 45.0, 33.0, 0.0))
    // cumulative range frame equals the cumulative documents integral
    assert(d("cum") == List(0.0, 1.0, 4.0, 16.0, 49.0))
  }

  test("$fill linear interpolates on the sort field between bracketing points") {
    val df = Seq(("0", 0L, Some(0.0)), ("1", 2L, None), ("2", 3L, None),
      ("3", 4L, Some(8.0)), ("4", 6L, None))
      .toDF("_id", "s", "v")
    val out = pipeline.run(df,
      """[{"$fill": {"sortBy": {"s": 1},
            "output": {"v": {"method": "linear"}}}}]""")
      .orderBy("s").select("v").collect()
      .map(r => Option(r.get(0)).map(_.asInstanceOf[Double])).toList
    // s=2 -> 0 + 8*(2/4) = 4; s=3 -> 6; trailing s=6 has no next -> null
    assert(out == List(Some(0.0), Some(4.0), Some(6.0), Some(8.0), None))
  }

  test("$fill: locf carries forward within partition; value fills with a constant") {
    val df = Seq(("0", "a", 1L, Some(10.0), None: Option[Long]),
      ("1", "a", 2L, None, Some(7L)), ("2", "a", 3L, None, None),
      ("3", "b", 1L, None, None))
      .toDF("_id", "g", "seq", "v", "w")
    val out = pipeline.run(df,
      """[{"$fill": {"partitionBy": "$g", "sortBy": {"seq": 1},
            "output": {"v": {"method": "locf"}, "w": {"value": -1}}}}]""")
      .orderBy("g", "seq")
      .collect().map(r => (Option(r.get(r.fieldIndex("v"))),
        r.getAs[Long]("w"))).toList
    // a: 10 carried through seq 2 and 3; b: leading null stays null
    assert(out == List((Some(10.0), -1L), (Some(10.0), 7L), (Some(10.0), -1L),
      (None, -1L)))
  }

  test("$densify generates gap rows per partition; existing points untouched") {
    val df = Seq(("0", "a", 1L, "x"), ("1", "a", 4L, "y"), ("2", "b", 2L, "z"))
      .toDF("_id", "g", "n", "payload")
    val out = pipeline.run(df,
      """[{"$densify": {"field": "n", "partitionByFields": ["g"],
            "range": {"step": 1, "bounds": "partition"}}}]""")
    val got = out.collect()
      .map(r => (r.getAs[String]("g"), r.getAs[Long]("n"),
        Option(r.getAs[String]("payload")))).toSet
    assert(got == Set(("a", 1L, Some("x")), ("a", 2L, None), ("a", 3L, None),
      ("a", 4L, Some("y")), ("b", 2L, Some("z"))))
  }

  test("$densify explicit [lo, hi) bounds are exclusive of hi") {
    val df = Seq(("0", 1L)).toDF("_id", "n")
    val out = pipeline.run(df,
      """[{"$densify": {"field": "n", "range": {"step": 2, "bounds": [0, 6]}}}]""")
    assert(out.select("n").collect().map(_.getLong(0)).toSet == Set(0L, 1L, 2L, 4L))
  }

  test("$densify date unit: month grid fills the missing months per partition") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.from(java.time.Instant.parse(s))
    val df = Seq(("0", "a", ts("2021-01-31T00:00:00Z")),
                 ("1", "a", ts("2021-04-30T00:00:00Z"))).toDF("_id", "g", "d")
    val out = pipeline.run(df,
      """[{"$densify": {"field": "d", "partitionByFields": ["g"],
            "range": {"step": 1, "unit": "month", "bounds": "partition"}}}]""")
    val got = out.collect().map(r => (Option(r.getAs[String]("_id")),
      r.getAs[Timestamp]("d").toInstant.toString)).toSet
    // grid is lo + k*step (scaled, not iterative): each point clamps from
    // the ORIGIN, so Jan 31 -> Feb 28 -> Mar 31 -> Apr 30
    assert(got == Set(
      (Some("0"), "2021-01-31T00:00:00Z"), (None, "2021-02-28T00:00:00Z"),
      (None, "2021-03-31T00:00:00Z"), (Some("1"), "2021-04-30T00:00:00Z")))
  }

  test("$densify date unit: explicit ISO [lo, hi) bounds, day step") {
    import java.sql.Timestamp
    val df = Seq(("0", Timestamp.from(java.time.Instant.parse("2021-01-02T00:00:00Z"))))
      .toDF("_id", "d")
    val out = pipeline.run(df,
      """[{"$densify": {"field": "d", "range": {"step": 1, "unit": "day",
            "bounds": ["2021-01-01T00:00:00Z", "2021-01-04T00:00:00Z"]}}}]""")
    assert(out.select("d").collect()
      .map(_.getAs[Timestamp](0).toInstant.toString).toSet ==
      Set("2021-01-01T00:00:00Z", "2021-01-02T00:00:00Z", "2021-01-03T00:00:00Z"))
  }

  test("batch stages: $sort/$limit/$skip/$sortByCount/$facet") {
    val df = Seq(("0", "b", 3L), ("1", "a", 1L), ("2", "a", 2L), ("3", "c", 9L))
      .toDF("_id", "g", "v")
    val sorted = pipeline.run(df,
      """[{"$sort": {"v": -1}}, {"$limit": 2}]""")
      .select("_id").collect().map(_.getString(0)).toList
    assert(sorted == List("3", "0"))
    val skipped = pipeline.run(df,
      """[{"$sort": {"v": 1}}, {"$skip": 3}]""")
      .select("_id").collect().map(_.getString(0)).toList
    assert(skipped == List("3"))
    val byCount = pipeline.run(df, """[{"$sortByCount": "$g"}]""")
      .collect().map(r => (r.getString(0), r.getLong(1))).toList
    assert(byCount == List(("a", 2L), ("b", 1L), ("c", 1L)))
    val facet = pipeline.run(df,
      """[{"$facet": {
            "top": [{"$sort": {"v": -1}}, {"$limit": 1}, {"$project": {"_id": 1}}],
            "byG": [{"$sortByCount": "$g"}]}}]""")
    val r = facet.head()
    assert(facet.count() == 1)
    assert(r.getSeq[org.apache.spark.sql.Row](0).map(_.getString(0)) == Seq("3"))
    assert(r.getSeq[org.apache.spark.sql.Row](1).length == 3)
  }

  test("$sample is a deterministic hash-ordered subset (documented deviation)") {
    val df = Seq.tabulate(50)(i => (i.toString, i.toLong)).toDF("_id", "v")
    val a = pipeline.run(df, """[{"$sample": {"size": 10}}]""")
      .collect().map(_.getString(0)).toSet
    val b = pipeline.run(df, """[{"$sample": {"size": 10}}]""")
      .collect().map(_.getString(0)).toSet
    assert(a == b && a.size == 10)
  }

  test("$unionWith concatenates a catalog collection run through its pipeline") {
    val df = Seq(("0", 1L)).toDF("_id", "v")
    val dim = Seq((7L, "x"), (8L, "y")).toDF("k", "label")
    val p = new Pipeline(catalog = { case "dim" => dim })
    val out = p.run(df,
      """[{"$unionWith": {"coll": "dim",
            "pipeline": [{"$project": {"v": "$k"}}]}}]""")
    assert(out.select("v").collect().map(_.getLong(0)).toSet == Set(1L, 7L, 8L))
  }

  test("global $group and $count emit nothing on empty input") {
    val empty = flat.filter($"test" > 100)
    assert(pipeline.run(empty,
      """[{"$group": {"_id": null, "n": {"$count": {}}}}]""").count() == 0)
    assert(pipeline.run(empty, """[{"$count": "n"}]""").count() == 0)
  }

  test("$group literal _id = single global bucket emitted as null") {
    val out = pipeline.run(flat, """[{"$group": {"_id": null, "n": {"$count": {}}}}]""")
    assert(out.count() == 1 && out.head().isNullAt(0) && out.head().getLong(1) == 4L)
  }

  test("$group compound expression-object key") {
    val df = Seq(("0", "x", 1L), ("1", "x", 1L), ("2", "y", 2L)).toDF("_id", "a", "b")
    val out = pipeline.run(df,
      """[{"$group": {"_id": {"f1": "$a", "f2": "$b"}, "n": {"$count": {}}}}]""")
    assert(rows(out.select("_id.f1", "_id.f2", "n")) ==
      Set(List("x", 1L, 2L), List("y", 2L, 1L)))
  }

  test("$group $mergeObjects merges maps, later wins") {
    val df = Seq(
      ("0", "g", Map("a" -> "1", "b" -> "2")),
      ("1", "g", Map("b" -> "3", "c" -> "4"))).toDF("_id", "g", "m")
    val out = pipeline.run(df,
      """[{"$group": {"_id": "$g", "merged": {"$mergeObjects": "$m"}}}]""")
    assert(out.head().getAs[Map[String, String]]("merged") ==
      Map("a" -> "1", "b" -> "3", "c" -> "4"))
  }

  test("$group $mergeObjects over struct docs: per-field latest non-null") {
    val df = Seq(
      ("0", "g", (Some(1L), Option.empty[String])),
      ("1", "g", (Option.empty[Long], Some("x"))),
      ("2", "g", (Some(3L), Option.empty[String])))
      .toDF("_id", "g", "raw")
      .select($"_id", $"g", struct($"raw._1".as("n"), $"raw._2".as("s")).as("doc"))
    val out = pipeline.run(df,
      """[{"$group": {"_id": "$g", "merged": {"$mergeObjects": "$doc"}}}]""")
    val m = out.select("merged.n", "merged.s").head()
    assert(m.getLong(0) == 3L && m.getString(1) == "x")
  }

  test("$group $last and $stdDevPop") {
    val out = pipeline.run(flat,
      """[{"$group": {"_id": null, "sd": {"$stdDevPop": "$test"}}}]""")
    assert(math.abs(out.head().getDouble(1) - math.sqrt(1.25)) < 1e-9)
  }

  // ---- $bucket (TestBucket.java) -----------------------------------------
  test("$bucket counts per boundary pair; validates ordering") {
    val df = (0L until 71L).map(i => (i.toString, i)).toDF("_id", "test")
    val out = pipeline.run(df,
      """[{"$bucket": {"groupBy": "$test", "boundaries": [0, 10, 50, 71]}}]""")
    assert(rows(out.select("_id", "count")) ==
      Set(List(0, 10L), List(10, 40L), List(50, 21L)))
    intercept[IllegalArgumentException] {
      pipeline.run(df, """[{"$bucket": {"groupBy": "$test", "boundaries": [10, 0]}}]""")
    }
  }

  // ---- $count stage (TestCount.java) -------------------------------------
  test("$count stage") {
    val out = pipeline.run(flat, """[{"$count": "total"}]""")
    assert(out.columns.toSeq == Seq("total") && out.head().getLong(0) == 4L)
  }

  test("$lookup sub-pipeline [$match, $project] projects the joined docs") {
    val df = Seq(("0", 1L)).toDF("_id", "local")
    val out = look.run(df,
      """[{"$lookup": {"from": "c", "let": {"lv": "$local"},
            "pipeline": [
              {"$match": {"$expr": {"$eq": ["$test", "$$lv"]}}},
              {"$project": {"t2": {"$multiply": ["$test", 10]}, "_id": 0}}],
            "as": "m", "unwind": true}}]""")
    assert(out.select("m.t2").head().getLong(0) == 10L)
    assert(out.select("m.*").columns.toSeq == Seq("t2"))
  }

  test("$lookup sub-pipeline: uncorrelated prefix + $match + $sort/$limit/$project") {
    // collection rows test=1..6; prefix $match keeps evens; correlated
    // $match keeps >= local; sort desc; top-2; project t10
    val big = (1L to 6L).map(i => (s"m$i", i)).toDF("_id", "test")
    val lk = new Pipeline(catalog = _ => big)
    val df = Seq(("0", 1L)).toDF("_id", "local")
    val out = lk.run(df,
      """[{"$lookup": {"from": "c", "let": {"lv": "$local"},
            "pipeline": [
              {"$match": {"$expr": {"$eq": [{"$mod": ["$test", 2]}, 0]}}},
              {"$match": {"$expr": {"$gte": ["$test", "$$lv"]}}},
              {"$sort": {"test": -1}},
              {"$limit": 2},
              {"$project": {"t10": {"$multiply": ["$test", 10]}, "_id": 0}}],
            "as": "m"}}]""")
    val m = out.select("m").head().getSeq[org.apache.spark.sql.Row](0)
    assert(m.map(_.getAs[Long]("t10")) == Seq(60L, 40L)) // 6,4 desc, limit 2
    assert(m.head.schema.fieldNames.toSeq == Seq("t10"))
  }

  test("$lookup sub-pipeline: '$$name' inside a plain string is not a var reference") {
    val big = (1L to 3L).map(i => (s"m$i", i)).toDF("_id", "test")
    val lk = new Pipeline(catalog = _ => big)
    val df = Seq(("0", 1L)).toDF("_id", "local")
    // the $project writes a literal containing "$$lv" — the rendered-JSON
    // substring scan used to misclassify this uncorrelated stage as
    // correlated and reject it because it is not a $match
    val out = lk.run(df,
      """[{"$lookup": {"from": "c", "let": {"lv": "$local"},
            "pipeline": [
              {"$project": {"tag": {"$literal": "costs $$lv dollars"}, "test": 1, "_id": 0}},
              {"$match": {"$expr": {"$gte": ["$test", "$$lv"]}}}],
            "as": "m"}}]""")
    assert(out.select(size($"m")).head().getInt(0) == 3)
  }

  test("$lookup sub-pipeline: prefix $sort without a trailing $sort is rejected") {
    val big = (1L to 3L).map(i => (s"m$i", i)).toDF("_id", "test")
    val lk = new Pipeline(catalog = _ => big)
    val df = Seq(("0", 1L)).toDF("_id", "local")
    val e = intercept[IllegalArgumentException] {
      lk.run(df,
        """[{"$lookup": {"from": "c", "let": {"lv": "$local"},
              "pipeline": [
                {"$sort": {"test": -1}},
                {"$match": {"$expr": {"$gte": ["$test", "$$lv"]}}}],
              "as": "m"}}]""")
    }
    assert(e.getMessage.contains("$sort"))
  }

  test("$lookup sub-pipeline with no correlated $match attaches the whole collection") {
    val df = Seq(("0", 1L)).toDF("_id", "local")
    val out = look.run(df,
      """[{"$lookup": {"from": "c",
            "pipeline": [{"$match": {"test": {"$gte": 2}}}], "as": "m"}}]""")
    assert(out.select(size($"m")).head().getInt(0) == 1) // only m2 (test=2)
  }

  test("$lookup _rangeJoin bucketed theta matches the plain theta join") {
    val left = (1L to 40L).map(i => (i.toString, i.toDouble)).toDF("_id", "v")
    val right = (1L to 60L).map(i => (s"r$i", i.toDouble * 0.7)).toDF("_id", "x")
    val lk = new Pipeline(catalog = _ => right)
    def q(extra: String) = lk.run(left,
      s"""[{"$$lookup": {"from": "c", "let": {"lv": "$$v"},
            "pipeline": [{"$$match": {"$$expr": {"$$and": [
              {"$$gte": ["$$x", {"$$subtract": ["$$$$lv", 3]}]},
              {"$$lte": ["$$x", {"$$add": ["$$$$lv", 3]}]}]}}}],
            $extra "as": "m"}},
           {"$$project": {"_id": 1, "n": {"$$size": "$$m"}}}]""")
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    val plain = q("")
    val bucketed = q(
      """"_rangeJoin": {"field": "x", "width": 2.5,
          "lo": {"$subtract": ["$v", 3]}, "hi": {"$add": ["$v", 3]}},""")
    assert(plain == bucketed)
    assert(plain.exists(_._2 > 0))
  }

  test("theta $lookup above the broadcast threshold is refused with a _rangeJoin pointer") {
    val left = (1L to 40L).map(i => (i.toString, i.toDouble)).toDF("_id", "v")
    val right = (1L to 60L).map(i => (s"r$i", i.toDouble * 0.7)).toDF("_id", "x")
    val lk = new Pipeline(catalog = _ => right)
    def q(extra: String) = lk.run(left,
      s"""[{"$$lookup": {"from": "c", "let": {"lv": "$$v"},
            "pipeline": [{"$$match": {"$$expr": {"$$and": [
              {"$$gte": ["$$x", {"$$subtract": ["$$$$lv", 3]}]},
              {"$$lte": ["$$x", {"$$add": ["$$$$lv", 3]}]}]}}}],
            $extra "as": "m"}}]""")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1")
    try {
      val e = intercept[IllegalArgumentException](q(""))
      assert(e.getMessage.contains("_rangeJoin"), e.getMessage)
      // the bucketed escape hatch still plans and runs under the same conf
      val ok = q(
        """"_rangeJoin": {"field": "x", "width": 2.5,
            "lo": {"$subtract": ["$v", 3]}, "hi": {"$add": ["$v", 3]}},""")
      assert(ok.count() == 40)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  // ---- $deduplicate (TestDeduplicate.java) -------------------------------
  test("$deduplicate by expression keeps one row per value") {
    val df = Seq(("0", 1L), ("1", 1L), ("2", 2L)).toDF("_id", "test")
    val out = pipeline.run(df, """[{"$deduplicate": {"expression": "$test"}}]""")
    assert(sorted1[Long](out, "test") == List(1L, 2L))
  }

  // ---- $lookup (TestLookup.java) -----------------------------------------
  private def coll = Seq(("m1", 1L), ("m2", 2L)).toDF("_id", "test")
  private def look = new Pipeline(catalog = _ => coll)

  test("$lookup equality form collects matches as array") {
    val df = Seq(("0", 1L), ("1", 3L)).toDF("_id", "local")
    val out = look.run(df,
      """[{"$lookup": {"from": "c", "localField": "local",
                       "foreignField": "test", "as": "m"}}]""")
    assert(out.filter($"_id" === "0").select(size($"m")).head().getInt(0) == 1)
    assert(out.filter($"_id" === "1").select(size($"m")).head().getInt(0) == 0)
  }

  test("$lookup inner drops non-matching; unwind emits scalar per match") {
    val df = Seq(("0", 1L), ("1", 3L)).toDF("_id", "local")
    assert(look.run(df,
      """[{"$lookup": {"from": "c", "localField": "local",
                       "foreignField": "test", "as": "m", "inner": true}}]""")
      .count() == 1)
    val uw = look.run(df,
      """[{"$lookup": {"from": "c", "localField": "local",
                       "foreignField": "test", "as": "m", "unwind": true}}]""")
    assert(uw.count() == 1 && uw.select("m._id").head().getString(0) == "m1")
  }

  test("$lookup array-valued local field joins per element (lookup3)") {
    val df = Seq(("0", Seq(1L, 2L))).toDF("_id", "local")
    val out = look.run(df,
      """[{"$lookup": {"from": "c", "localField": "local",
                       "foreignField": "test", "as": "m"}}]""")
    assert(out.select(size($"m")).head().getInt(0) == 2)
  }

  test("$lookup remote connectionString/database resolves through the second catalog") {
    // Lookup.java:74-78: connectionString + database switch the `from`
    // resolution to another store; the local catalog must NOT be consulted
    val remote = Seq(("r1", 1L), ("r2", 2L)).toDF("_id", "test")
    val seen = scala.collection.mutable.Buffer.empty[(String, String, String)]
    val p = new Pipeline(
      catalog = n => fail(s"local catalog consulted for remote lookup: $n"),
      remoteCatalog = Some((uri, db, coll) => { seen += ((uri, db, coll)); remote }))
    val df = Seq(("0", 1L), ("1", 3L)).toDF("_id", "local")
    val out = p.run(df,
      """[{"$lookup": {"from": "c", "connectionString": "mongodb://dims:27017",
                       "database": "dims", "localField": "local",
                       "foreignField": "test", "as": "m"}}]""")
    assert(out.filter($"_id" === "0").select(size($"m")).head().getInt(0) == 1)
    assert(out.filter($"_id" === "1").select(size($"m")).head().getInt(0) == 0)
    assert(seen.toList == List(("mongodb://dims:27017", "dims", "c")))
    // without a remoteCatalog the default is a connector-native MongoStore —
    // a malformed connection string must fail ITS validation, proving the
    // remote path (not the local catalog) executes
    val e = intercept[IllegalArgumentException] {
      new Pipeline(catalog = _ => remote).run(df,
        """[{"$lookup": {"from": "c", "connectionString": "bogus://x",
                         "database": "dims", "localField": "local",
                         "foreignField": "test", "as": "m"}}]""")
    }
    assert(e.getMessage.contains("not a MongoDB connection string"))
  }

  test("$lookup remote form with let+pipeline resolves through the second catalog") {
    val remote = Seq(("m1", 1L), ("m2", 2L)).toDF("_id", "test")
    val p = new Pipeline(
      catalog = n => fail(s"local catalog consulted: $n"),
      remoteCatalog = Some((_, _, _) => remote))
    val out = p.run(Seq(("0", 2L)).toDF("_id", "local"),
      """[{"$lookup": {"from": "c", "connectionString": "mongodb://dims:27017",
            "database": "dims", "let": {"lv": "$local"},
            "pipeline": [{"$match": {"$expr": {"$gte": ["$test", "$$lv"]}}}],
            "as": "m"}}]""")
    assert(out.select(size($"m")).head().getInt(0) == 1)
  }

  test("$lookup let+pipeline theta join (lookup10)") {
    val df = Seq(("0", 2L)).toDF("_id", "local")
    val out = look.run(df,
      """[{"$lookup": {"from": "c", "let": {"lv": "$local"},
            "pipeline": [{"$match": {"$expr": {"$gte": ["$test", "$$lv"]}}}],
            "as": "m"}}]""")
    assert(out.select(size($"m")).head().getInt(0) == 1)
  }

  // ---- $redact (TestRedact.java: $$KEEP/$$PRUNE/$$DESCEND) ---------------
  test("$redact recursive descent prunes nested objects and array elements") {
    val df = Seq(
      ("0", true, (true, 1L), Seq((true, 10L), (false, 20L))),
      ("1", false, (true, 2L), Seq.empty[(Boolean, Long)]))
      .toDF("_id", "visible", "subRaw", "arrRaw")
      .select($"_id", $"visible",
        struct($"subRaw._1".as("visible"), $"subRaw._2".as("v")).as("sub"),
        expr("transform(arrRaw, e -> struct(e._1 as visible, e._2 as v))").as("arr"))
    val out = pipeline.run(df,
      """[{"$redact": {"$cond": [{"$ifNull": ["$visible", true]},
                                 "$$DESCEND", "$$PRUNE"]}}]""")
    // root with visible=false is dropped entirely (Redact.java:51-53)
    assert(out.count() == 1)
    val r = out.head()
    assert(r.getString(0) == "0")
    assert(out.select("sub.v").head().getLong(0) == 1L)
    // array keeps only the visible element
    assert(out.select(size($"arr")).head().getInt(0) == 1)
    assert(out.select(element_at($"arr", 1).getField("v")).head().getLong(0) == 10L)
  }

  test("$redact $$KEEP stops descending") {
    val df = Seq(("0", true, (false, 5L))).toDF("_id", "visible", "subRaw")
      .select($"_id", $"visible",
        struct($"subRaw._1".as("visible"), $"subRaw._2".as("v")).as("sub"))
    val out = pipeline.run(df, """[{"$redact": "$$KEEP"}]""")
    // KEEP at root: sub survives even though sub.visible=false
    assert(out.select("sub.v").head().getLong(0) == 5L)
  }

  test("_trace registers observe metrics without changing results") {
    val observed = scala.collection.mutable.Map.empty[String, Long]
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
        qe.observedMetrics.foreach { case (k, r) =>
          observed(k) = r.getAs[Long]("rows") }
      override def onFailure(f: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val out = pipeline.run(flat,
        """[{"$match": {"test": {"$gte": 1}}, "_trace": true}]""")
      assert(out.count() == 3)
      // listener delivery is async; poll briefly
      val deadline = System.currentTimeMillis() + 10000
      while (!observed.contains("stage0_match") &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(observed.get("stage0_match").contains(3L))
    } finally spark.listenerManager.unregister(listener)
  }

  // ---- unknown stages ignored (Pipeline.java:265) ------------------------
  test("$throttle paces rows per partition (TestThrottle.java:30-42)") {
    val df = (1L to 100L).toDF("v").coalesce(1)
    val t0 = System.nanoTime()
    val n = pipeline.run(df,
      """[{"$throttle": {"maxPerSecond": 500}}]""").count()
    val elapsed = (System.nanoTime() - t0) / 1e9
    assert(n == 100L)
    // 100 msgs at 500/s = 0.2 s floor; generous ceiling for CI jitter
    assert(elapsed >= 0.19, s"no pacing: $elapsed s")
    assert(elapsed < 3.0, s"over-throttled: $elapsed s")
    // values unchanged, order preserved within the partition
    val vs = pipeline.run(df, """[{"$throttle": {"maxPerSecond": 1000000}}]""")
      .collect().map(_.getLong(0)).toSeq
    assert(vs == (1L to 100L))
  }

  test("unknown stages pass through; extensions apply") {
    assert(pipeline.run(flat, """[{"$nonsense": 1}]""").count() == 4)
    val ext = new Pipeline(extensions = Map(
      "$wait" -> ((df, _) => df.limit(2)))) // Base.java:78-82 style extension
    assert(ext.run(flat, """[{"$wait": {}}]""").count() == 2)
  }

  // ---- $geoNear (MQL, beyond the reference's stage set) ------------------
  test("$geoNear GeoJSON: spherical meters, raw-distance bounds, nearest first") {
    val df = Seq(("rome", 12.5, 41.9), ("milan", 9.19, 45.46),
      ("london", -0.13, 51.5), ("sydney", 151.2, -33.87))
      .toDF("_id", "lon", "lat")
      .withColumn("loc", array($"lon", $"lat")).drop("lon", "lat")
    val out = pipeline.run(df,
      """[{"$geoNear": {"near": {"type": "Point", "coordinates": [12.5, 41.9]},
            "distanceField": "d", "key": "loc",
            "distanceMultiplier": 0.001, "maxDistance": 2000000}}]""")
      .select("_id", "d").collect()
    // sydney (~16,300 km) exceeds maxDistance; rest ascend by distance
    assert(out.map(_.getString(0)).toList == List("rome", "milan", "london"))
    val d = out.map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(d("rome") == 0.0)
    assert(math.abs(d("milan") - 477) < 10, s"milan ${d("milan")}")
    assert(math.abs(d("london") - 1435) < 15, s"london ${d("london")}")
  }

  test("$geoNear legacy pairs: planar units, query prefilter, includeLocs; spherical radians") {
    val df = Seq(("a", 3.0, 4.0, true), ("b", 6.0, 8.0, true),
      ("c", 1.0, 1.0, false))
      .toDF("_id", "x", "y", "keep")
      .withColumn("loc", array($"x", $"y"))
    val out = pipeline.run(df,
      """[{"$geoNear": {"near": [0, 0], "distanceField": "d", "key": "loc",
            "query": {"keep": true}, "includeLocs": "at"}}]""")
      .select("_id", "d", "at").collect()
    assert(out.map(_.getString(0)).toList == List("a", "b")) // c query-filtered
    assert(out.map(_.getDouble(1)).toList == List(5.0, 10.0)) // Euclidean
    assert(out.head.getSeq[Double](2) == Seq(3.0, 4.0)) // includeLocs echoes
    // legacy + spherical -> radians (antipode = pi, quarter = pi/2)
    val sph = Seq(("anti", 180.0, 0.0), ("quarter", 90.0, 0.0))
      .toDF("_id", "x", "y").withColumn("loc", array($"x", $"y"))
    val rads = pipeline.run(sph,
      """[{"$geoNear": {"near": [0, 0], "distanceField": "d", "key": "loc",
            "spherical": true}}]""")
      .select("_id", "d").collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(rads("anti") - math.Pi) < 1e-9)
    assert(math.abs(rads("quarter") - math.Pi / 2) < 1e-9)
  }

  test("$geoNear drops malformed locations; rejects bad specs") {
    val df = Seq(("ok", Seq(1.0, 2.0)), ("short", Seq(1.0)), ("none", null))
      .toDF("_id", "loc")
    val out = pipeline.run(df,
      """[{"$geoNear": {"near": [0, 0], "distanceField": "d", "key": "loc"}}]""")
    assert(sorted1[String](out, "_id") == List("ok"))
    intercept[IllegalArgumentException] { // key is required (no geo index)
      pipeline.run(df, """[{"$geoNear": {"near": [0, 0], "distanceField": "d"}}]""")
    }
    intercept[IllegalArgumentException] { // GeoJSON near is always spherical
      pipeline.run(df,
        """[{"$geoNear": {"near": {"type": "Point", "coordinates": [0, 0]},
              "distanceField": "d", "key": "loc", "spherical": false}}]""")
    }
  }
}
