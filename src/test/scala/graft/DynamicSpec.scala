package graft

import com.fasterxml.jackson.databind.JsonNode
import graft.dynamic.{DynExpr, DynJson, DynMatch, DynPipeline}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** DYNAMIC (schemaless) pipeline mode — semantics mirrored from the
  * reference test corpus on documents with NO schema: mixed-type fields,
  * deep merges, non-object $replaceWith results, cross-type group
  * accumulators (TestAddFields.java, TestReplaceWith.java, TestGroup.java).
  */
class DynamicSpec extends SparkSpec {
  import spark.implicits._

  private def docs(jsons: String*): DataFrame = jsons.toSeq.toDF("doc")

  private def run(df: DataFrame, pipeline: String): DataFrame =
    DynPipeline.run(df, pipeline)

  private def outDocs(df: DataFrame): Set[JsonNode] =
    df.select("doc").collect().map(r => DynJson.parse(r.getString(0))).toSet

  private def node(s: String): JsonNode = DynJson.parse(s)

  // ---- $addFields (TestAddFields.java:18-106) ------------------------------

  test("$addFields 1: dotted paths, in-place replace, literal-dot keys kept") {
    val out = outDocs(run(
      docs("""{"_id":"0","test1":0,"test3":{"test":0},"test.test":0}"""),
      """[{"$addFields": {"test1": 1, "test2": 0, "test3.test": 1,
            "test4.test.test1": 2, "test4.test.test2": 3}}]"""))
    assert(out == Set(node(
      """{"_id":"0","test1":1,"test3":{"test":1},"test.test":0,
         "test2":0,"test4":{"test":{"test1":2,"test2":3}}}""")))
  }

  test("$addFields 2: new nested path on missing parents") {
    val out = outDocs(run(
      docs("""{"_id":"0","test1":0,"test3":{"test":0}}"""),
      """[{"$addFields": {"test4.test.test2": 3}}]"""))
    assert(out == Set(node(
      """{"_id":"0","test1":0,"test3":{"test":0},"test4":{"test":{"test2":3}}}""")))
  }

  test("$addFields 3: merge into existing object") {
    val out = outDocs(run(
      docs("""{"_id":"0","test1":0,"test3":{"test":0}}"""),
      """[{"$addFields": {"test3.test1.test2": 3}}]"""))
    assert(out == Set(node(
      """{"_id":"0","test1":0,"test3":{"test":0,"test1":{"test2":3}}}""")))
  }

  test("$addFields 4: null on the path is replaced by an object") {
    val out = outDocs(run(
      docs("""{"_id":"0","test1":0,"test3":{"test":0,"test1":null}}"""),
      """[{"$addFields": {"test3.test1.test2": 3}}]"""))
    assert(out == Set(node(
      """{"_id":"0","test1":0,"test3":{"test":0,"test1":{"test2":3}}}""")))
  }

  test("$addFields: expressions see the original document; mixed types") {
    val out = outDocs(run(
      docs("""{"_id":"0","a":2,"b":"x"}""", """{"_id":"1","a":"s","b":3}"""),
      """[{"$addFields": {"c": {"$cond": [{"$eq": [{"$type": "$a"}, "long"]},
                                          {"$multiply": ["$a", 10]}, "$b"]},
                          "a": "replaced"}}]"""))
    assert(out == Set(
      node("""{"_id":"0","a":"replaced","b":"x","c":20}"""),
      node("""{"_id":"1","a":"replaced","b":3,"c":3}""")))
  }

  // ---- $replaceWith (ReplaceWith.java:29-36, TestReplaceWith.java) ---------

  test("$replaceWith: object result replaces, non-object passes through") {
    val out = outDocs(run(
      docs("""{"_id":"0","test":{"inner":1},"x":9}""",
           """{"_id":"1","test":"scalar","x":8}"""),
      """[{"$replaceWith": "$test"}]"""))
    assert(out == Set(
      node("""{"inner":1}"""),
      node("""{"_id":"1","test":"scalar","x":8}""")))
  }

  test("$replaceWith: key follows the new _id") {
    val out = run(
      docs("""{"_id":"0","test":{"_id":"new-key","v":1}}"""),
      """[{"$replaceWith": "$test"}]""")
    assert(out.select("key").as[String].collect().toList == List("new-key"))
  }

  test("$replaceRoot newRoot + $mergeObjects") {
    val out = outDocs(run(
      docs("""{"_id":"0","a":{"x":1},"b":{"y":2}}"""),
      """[{"$replaceRoot": {"newRoot": {"$mergeObjects": ["$a", "$b", {"z": 3}]}}}]"""))
    assert(out == Set(node("""{"x":1,"y":2,"z":3}""")))
  }

  // ---- $project / $unset ---------------------------------------------------

  test("$project inclusion with computed and dotted; _id default") {
    val out = outDocs(run(
      docs("""{"_id":"0","a":{"b":1,"c":2},"d":5}"""),
      """[{"$project": {"a.b": 1, "e": {"$add": ["$d", 1]}}}]"""))
    assert(out == Set(node("""{"_id":"0","a":{"b":1},"e":6}""")))
  }

  test("$project exclusion and $unset") {
    val out = outDocs(run(
      docs("""{"_id":"0","a":{"b":1,"c":2},"d":5}"""),
      """[{"$project": {"a.c": 0, "d": 0}}]"""))
    assert(out == Set(node("""{"_id":"0","a":{"b":1}}""")))
    val out2 = outDocs(run(
      docs("""{"_id":"0","a":{"b":1,"c":2},"d":5}"""),
      """[{"$unset": ["a.b", "_id"]}]"""))
    assert(out2 == Set(node("""{"a":{"c":2},"d":5}""")))
  }

  // ---- $match on heterogeneous values --------------------------------------

  test("$match: type brackets, arrays, exists, regex") {
    val d = docs(
      """{"_id":"0","v":5}""",
      """{"_id":"1","v":"5"}""",
      """{"_id":"2","v":[4,5,6]}""",
      """{"_id":"3","w":1}""",
      """{"_id":"4","v":"street"}""")
    def ids(p: String): Set[JsonNode] =
      outDocs(run(d, p)).map(_.get("_id"))
    // numeric comparison only matches numbers (incl. inside arrays)
    assert(ids("""[{"$match": {"v": {"$gt": 4}}}]""") ==
      Set(DynJson.text("0"), DynJson.text("2")))
    // equality matches scalars and array elements
    assert(ids("""[{"$match": {"v": 5}}]""") ==
      Set(DynJson.text("0"), DynJson.text("2")))
    // whole-array equality
    assert(ids("""[{"$match": {"v": [4,5,6]}}]""") == Set(DynJson.text("2")))
    assert(ids("""[{"$match": {"v": {"$exists": false}}}]""") == Set(DynJson.text("3")))
    assert(ids("""[{"$match": {"v": {"$regex": "^st", "$options": "i"}}}]""") ==
      Set(DynJson.text("4")))
    assert(ids("""[{"$match": {"v": {"$type": "string"}}}]""") ==
      Set(DynJson.text("1"), DynJson.text("4")))
    assert(ids("""[{"$match": {"v": {"$size": 3}}}]""") == Set(DynJson.text("2")))
  }

  // ---- $group with cross-type accumulators (TestGroup.java) ----------------

  test("$group: cross-type $max/$min use the BSON bracket order") {
    // numbers < strings in the bracket order, regardless of magnitude
    val d = docs(
      """{"_id":"a","t":999}""",
      """{"_id":"b","t":"zz"}""",
      """{"_id":"c","t":1}""",
      """{"_id":"d","t":"aa"}""")
    val out = outDocs(run(d,
      """[{"$group": {"_id": null, "max": {"$max": "$t"}, "min": {"$min": "$t"}}}]"""))
    assert(out == Set(node("""{"_id":null,"max":"zz","min":1}""")))
  }

  test("$group: integral $sum stays integral; mixed goes double; 1 and 1.0 same group") {
    val d = docs(
      """{"g":1,"v":2}""", """{"g":1.0,"v":3}""", """{"g":2,"v":1.5}""",
      """{"g":2,"v":1}""", """{"g":2,"v":"skip"}""")
    val out = outDocs(run(d,
      """[{"$group": {"_id": "$g", "s": {"$sum": "$v"}, "n": {"$sum": 1}}}]"""))
    assert(out == Set(
      node("""{"_id":1,"s":5,"n":2}"""),
      node("""{"_id":2,"s":2.5,"n":3}""")))
  }

  test("$group: $push/$addToSet/$avg/$first-last/$mergeObjects/stddev") {
    val d = docs(
      """{"g":"x","v":1,"o":{"a":1}}""",
      """{"g":"x","v":1.0,"o":{"b":2}}""",
      """{"g":"x","v":3,"o":{"a":9}}""")
    val out = run(d,
      """[{"$group": {"_id": "$g",
           "set": {"$addToSet": "$v"}, "all": {"$push": "$v"},
           "avg": {"$avg": "$v"}, "merged": {"$mergeObjects": "$o"},
           "sd": {"$stdDevPop": "$v"}}}]""")
    val doc = DynJson.parse(out.select("doc").as[String].collect().head)
    assert(doc.get("set").size == 2)          // 1 == 1.0 dedupes
    assert(doc.get("all").size == 3)
    assert(math.abs(doc.get("avg").doubleValue - 5.0 / 3) < 1e-9)
    assert(doc.get("merged").get("a").intValue == 9)
    assert(doc.get("merged").get("b").intValue == 2)
    assert(math.abs(doc.get("sd").doubleValue - 0.9428090415820634) < 1e-9)
  }

  test("$bucket and $count in dynamic mode") {
    val d = docs("""{"p":1}""", """{"p":5}""", """{"p":12}""", """{"p":7}""")
    val out = outDocs(run(d,
      """[{"$bucket": {"groupBy": "$p", "boundaries": [0, 5, 10],
                       "default": "rest",
                       "output": {"n": {"$sum": 1}}}}]"""))
    assert(out == Set(
      node("""{"_id":0,"n":1}"""),
      node("""{"_id":5,"n":2}"""),
      node("""{"_id":"rest","n":1}""")))
    val counted = outDocs(run(d, """[{"$count": "total"}]"""))
    assert(counted == Set(node("""{"total":4}""")))
  }

  // ---- $unwind / $redact / $setKey / $deduplicate --------------------------

  test("$unwind with index and preserve") {
    val d = docs(
      """{"_id":"0","a":[10,20]}""",
      """{"_id":"1","a":[]}""",
      """{"_id":"2"}""",
      """{"_id":"3","a":7}""")
    val out = outDocs(run(d,
      """[{"$unwind": {"path": "$a", "includeArrayIndex": "i",
                       "preserveNullAndEmptyArrays": true}}]"""))
    assert(out == Set(
      node("""{"_id":"0","a":10,"i":0}"""),
      node("""{"_id":"0","a":20,"i":1}"""),
      node("""{"_id":"1","i":null}"""),
      node("""{"_id":"2","i":null}"""),
      node("""{"_id":"3","a":7,"i":null}""")))
    assert(run(d, """[{"$unwind": "$a"}]""").count() == 3)
  }

  test("$redact DESCEND/PRUNE on mixed trees") {
    val d = docs(
      """{"_id":"0","level":1,"sub":{"level":5,"secret":1},"keep":true}""",
      """{"_id":"1","level":5}""")
    val out = outDocs(run(d,
      """[{"$redact": {"$cond": [{"$lte": ["$level", 3]}, "DESCEND", "PRUNE"]}}]"""))
    assert(out == Set(node("""{"_id":"0","level":1,"sub":null,"keep":true}"""))
      || out == Set(node("""{"_id":"0","level":1,"keep":true}""")))
  }

  test("$setKey and $deduplicate") {
    val d = docs("""{"_id":"a","v":1}""", """{"_id":"a","v":1.0}""", """{"_id":"b","v":2}""")
    val keyed = run(d, """[{"$setKey": "$_id"}]""")
    assert(keyed.select("key").as[String].collect().sorted.toList == List("a", "a", "b"))
    assert(run(d, """[{"$deduplicate": {"expression": "$_id"}}]""").count() == 2)
  }

  // ---- stage fusion ---------------------------------------------------------

  test("consecutive document-local stages fuse into one mapPartitions") {
    val d = docs("""{"_id":"0","a":1}""")
    val out = run(d,
      """[{"$addFields": {"b": {"$add": ["$a", 1]}}},
          {"$match": {"b": 2}},
          {"$project": {"b": 1}},
          {"$unset": "_id"}]""")
    // one SerializeFromObject (one mapPartitions pass) in the whole plan
    val plan = out.queryExecution.executedPlan.toString
    assert("SerializeFromObject".r.findAllIn(plan).size == 1, plan)
    assert(outDocs(out) == Set(node("""{"b":2}""")))
  }

  // ---- expression-level unit checks ----------------------------------------

  private def evalExpr(spec: String, doc: String): JsonNode =
    DynExpr.compile(org.json4s.jackson.JsonMethods.parse(spec))
      .eval(DynExpr.DCtx(DynJson.parse(doc), Map.empty))

  test("DynExpr: integral arithmetic, missing vs null, cross-type compare") {
    assert(evalExpr("""{"$add": [2, 3]}""", "{}") == DynJson.long(5))
    assert(evalExpr("""{"$add": [2, 3.5]}""", "{}") == DynJson.double(5.5))
    assert(evalExpr("""{"$divide": [5, 2]}""", "{}") == DynJson.double(2.5))
    // missing vanishes from object constructors, null does not
    assert(evalExpr("""{"out": "$nope"}""", "{}").toString == "{}")
    assert(evalExpr("""{"out": "$x"}""", """{"x":null}""").toString == """{"out":null}""")
    // cross-type aggregation comparison: numbers < strings
    assert(evalExpr("""{"$lt": [999, "a"]}""", "{}") == DynJson.bool(true))
    assert(evalExpr("""{"$eq": [1, 1.0]}""", "{}") == DynJson.bool(true))
    // $let, $map, $filter, $reduce
    assert(evalExpr(
      """{"$let": {"vars": {"t": 3}, "in": {"$multiply": ["$$t", "$$t"]}}}""",
      "{}") == DynJson.long(9))
    assert(evalExpr(
      """{"$map": {"input": [1, 2], "as": "e", "in": {"$add": ["$$e", 10]}}}""",
      "{}").toString == "[11,12]")
    assert(evalExpr(
      """{"$filter": {"input": [1, "a", 2], "as": "e",
                      "cond": {"$eq": [{"$type": "$$e"}, "long"]}}}""",
      "{}").toString == """[1,2]""")
    assert(evalExpr(
      """{"$reduce": {"input": [1, 2, 3], "initialValue": 0,
                      "in": {"$add": ["$$value", "$$this"]}}}""",
      "{}") == DynJson.long(6))
  }

  test("DynExpr: $filter limit, $sortArray document spec, date arithmetic") {
    // limit: first 2 matches only
    assert(evalExpr(
      """{"$filter": {"input": [1, 2, 3, 4, 5], "as": "e",
                      "cond": {"$gt": ["$$e", 1]}, "limit": 2}}""",
      "{}").toString == "[2,3]")
    // document sortBy: descending by p
    assert(evalExpr(
      """{"$sortArray": {"input": [{"p": 2}, {"p": 1}, {"p": 3}],
                         "sortBy": {"p": -1}}}""",
      "{}").toString == """[{"p":3},{"p":2},{"p":1}]""")
    // date minus date -> millis; date minus number -> shifted instant
    assert(evalExpr(
      """{"$subtract": ["$d", "$e"]}""",
      """{"d":"2024-01-02T00:00:00Z","e":"2024-01-01T00:00:00Z"}""")
      == DynJson.long(86400000L))
    assert(evalExpr(
      """{"$subtract": ["$d", 3600000]}""",
      """{"d":"2024-01-02T00:00:00Z"}""").textValue
      == "2024-01-01T23:00:00Z")
    assert(evalExpr(
      """{"$add": ["$d", 1000, 500]}""",
      """{"d":"2024-01-01T00:00:00Z"}""").textValue
      == "2024-01-01T00:00:01.500Z")
  }

  test("DynExpr: two-arg math null/missing second operand yields null, non-numeric throws") {
    // a null/missing base must yield null, NOT -Infinity/-0.0 garbage
    assert(evalExpr("""{"$log": [8, "$nope"]}""", "{}").isNull)
    assert(evalExpr("""{"$log": [8, null]}""", "{}").isNull)
    assert(evalExpr("""{"$pow": [2, "$nope"]}""", "{}").isNull)
    assert(evalExpr("""{"$atan2": [1, null]}""", "{}").isNull)
    assert(evalExpr("""{"$log": [8, 2]}""", "{}") == DynJson.double(3.0))
    intercept[IllegalArgumentException] {
      evalExpr("""{"$log": [8, "two"]}""", "{}")
    }
  }

  test("DynExpr: date family on ISO strings and epoch millis") {
    def ev(spec: String, doc: String) =
      DynExpr.compile(org.json4s.jackson.JsonMethods.parse(spec))
        .eval(DynExpr.DCtx(DynJson.parse(doc), Map.empty))
    val d = """{"t":"2024-03-15T10:30:45Z","ms":1710498645000}"""
    assert(ev("""{"$year": "$t"}""", d) == DynJson.long(2024))
    assert(ev("""{"$month": "$ms"}""", d) == DynJson.long(3))
    assert(ev("""{"$dayOfMonth": "$t"}""", d) == DynJson.long(15))
    assert(ev("""{"$hour": "$t"}""", d) == DynJson.long(10))
    assert(ev("""{"$dayOfWeek": "$t"}""", d) == DynJson.long(6)) // Friday, 1=Sun
    assert(ev("""{"$dateToString": {"date": "$t", "format": "%Y-%m-%d"}}""", d)
      == DynJson.text("2024-03-15"))
    assert(ev("""{"$dateAdd": {"startDate": "$t", "unit": "day", "amount": 20}}""", d)
      == DynJson.text("2024-04-04T10:30:45Z"))
    assert(ev("""{"$dateDiff": {"startDate": "$t",
                  "endDate": "2024-03-17T00:00:00Z", "unit": "day"}}""", d)
      == DynJson.long(2))
    assert(ev("""{"$dateTrunc": {"date": "$t", "unit": "hour"}}""", d)
      == DynJson.text("2024-03-15T10:00:00Z"))
    assert(ev("""{"$toDate": "$ms"}""", d) == DynJson.text("2024-03-15T10:30:45Z"))
  }

  test("DynExpr: regex, replace, trim, sets, sortArray, zip, firstN") {
    def ev(spec: String, doc: String) =
      DynExpr.compile(org.json4s.jackson.JsonMethods.parse(spec))
        .eval(DynExpr.DCtx(DynJson.parse(doc), Map.empty))
    val d = """{"s":"a1b22c","xs":[3,1,2],"ys":[2,3,4]}"""
    assert(ev("""{"$regexMatch": {"input": "$s", "regex": "b\\d+"}}""", d) == DynJson.bool(true))
    val rf = ev("""{"$regexFind": {"input": "$s", "regex": "(\\d+)c"}}""", d)
    assert(rf.path("match").textValue == "22c" && rf.path("idx").intValue == 3 &&
      rf.path("captures").get(0).textValue == "22")
    assert(ev("""{"$replaceAll": {"input": "$s", "find": "2", "replacement": "X"}}""", d)
      == DynJson.text("a1bXXc"))
    assert(ev("""{"$replaceOne": {"input": "$s", "find": "2", "replacement": "X"}}""", d)
      == DynJson.text("a1bX2c"))
    assert(ev("""{"$ltrim": {"input": "xxhixx", "chars": "x"}}""", "{}")
      == DynJson.text("hixx"))
    assert(ev("""{"$rtrim": {"input": "xxhixx", "chars": "x"}}""", "{}")
      == DynJson.text("xxhi"))
    assert(ev("""{"$setUnion": ["$xs", "$ys"]}""", d).toString == "[1,2,3,4]")
    assert(ev("""{"$setIntersection": ["$xs", "$ys"]}""", d).toString == "[2,3]")
    assert(ev("""{"$setDifference": ["$xs", "$ys"]}""", d).toString == "[1]")
    assert(ev("""{"$setIsSubset": [[1, 2], "$xs"]}""", d) == DynJson.bool(true))
    assert(ev("""{"$setEquals": [[1, 2, 3], "$xs"]}""", d) == DynJson.bool(true))
    assert(ev("""{"$allElementsTrue": ["$xs"]}""", d) == DynJson.bool(true))
    assert(ev("""{"$anyElementTrue": [[0, false, 1]]}""", "{}") == DynJson.bool(true))
    assert(ev("""{"$sortArray": {"input": "$xs", "sortBy": -1}}""", d).toString == "[3,2,1]")
    assert(ev("""{"$indexOfArray": ["$xs", 1]}""", d) == DynJson.long(1))
    assert(ev("""{"$zip": {"inputs": ["$xs", "$ys"]}}""", d).toString == "[[3,2],[1,3],[2,4]]")
    assert(ev("""{"$firstN": {"input": "$xs", "n": 2}}""", d).toString == "[3,1]")
    assert(ev("""{"$lastN": {"input": "$xs", "n": 2}}""", d).toString == "[1,2]")
    assert(ev("""{"$isArray": ["$xs"]}""", d) == DynJson.bool(true))
    assert(ev("""{"$isNumber": "$s"}""", d) == DynJson.bool(false))
  }

  test("DynMatch: elemMatch, all, mod, nin") {
    def m(spec: String, doc: String): Boolean =
      DynMatch.compile(org.json4s.jackson.JsonMethods.parse(spec))
        .test(DynExpr.DCtx(DynJson.parse(doc), Map.empty))
    assert(m("""{"a": {"$elemMatch": {"$gte": 2, "$lt": 4}}}""", """{"a":[1,3,9]}"""))
    assert(!m("""{"a": {"$elemMatch": {"$gte": 4, "$lt": 6}}}""", """{"a":[1,3,9]}"""))
    assert(m("""{"a": {"$elemMatch": {"b": 1}}}""", """{"a":[{"b":1},{"b":2}]}"""))
    assert(m("""{"a": {"$all": [1, 3]}}""", """{"a":[1,2,3]}"""))
    assert(!m("""{"a": {"$all": [1, 4]}}""", """{"a":[1,2,3]}"""))
    assert(m("""{"a": {"$mod": [3, 1]}}""", """{"a":7}"""))
    assert(m("""{"a": {"$nin": [2, 3]}}""", """{"a":1}"""))
    assert(!m("""{"a": {"$nin": [1]}}""", """{"a":1}"""))
  }

  // ---- $jslt full-language dynamic mode (TestScript.java jslt2) -----------

  test("$jslt dynamic: reference test {\"test\": 1, *: .} rewrites and re-keys") {
    val out = outDocs(run(
      docs("""{"_id":"0","test":0}"""),
      """[{"$jslt": "{\"test\": 1, *: .}"}]"""))
    assert(out == Set(node("""{"test":1,"_id":"0"}""")))
  }

  test("$jslt dynamic: computed keys and object-for") {
    val out = outDocs(run(
      docs("""{"_id":"0","k":"name","v":7,"m":{"a":1,"b":2}}"""),
      """[{"$jslt": "{\"_id\": ._id, .k : .v, \"doubled\": {for (.m) .key : .value * 2}}"}]"""))
    assert(out == Set(node(
      """{"_id":"0","name":7,"doubled":{"a":2,"b":4}}""")))
  }

  test("$jslt dynamic: recursive user function (static mode rejects it)") {
    val fact = """def fact(n) if ($n < 2) 1 else $n * fact($n - 1)
                  {"_id": ._id, "f": fact(.n)}"""
    val out = outDocs(run(
      docs("""{"_id":"0","n":5}""", """{"_id":"1","n":1}"""),
      s"""[{"$$jslt": ${org.json4s.jackson.JsonMethods.compact(
        org.json4s.jackson.JsonMethods.render(org.json4s.JString(fact)))}}]"""))
    assert(out == Set(node("""{"_id":"0","f":120}"""),
                      node("""{"_id":"1","f":1}""")))
    // the same script statically: clear compile error, not a wrong answer
    val e = intercept[graft.operators.JsltCompiler.JsltCompileError] {
      graft.operators.JsltCompiler.compileProgram(fact,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("n",
            org.apache.spark.sql.types.LongType))))
    }
    assert(e.getMessage.contains("recursive"))
  }

  test("$jslt dynamic: null-valued pairs are dropped (JSLT object rule)") {
    val out = outDocs(run(
      docs("""{"_id":"0","a":1}"""),
      """[{"$jslt": "{\"_id\": ._id, \"a\": .a, \"gone\": .missing}"}]"""))
    assert(out == Set(node("""{"_id":"0","a":1}""")))
  }

  test("$jslt dynamic: get-key with fallback on unknown objects") {
    val out = outDocs(run(
      docs("""{"_id":"0","o":{"x":5},"k":"x"}""", """{"_id":"1","o":{"y":1},"k":"x"}"""),
      """[{"$jslt": "{\"_id\": ._id, \"v\": get-key(.o, .k, 0)}"}]"""))
    assert(out == Set(node("""{"_id":"0","v":5}"""), node("""{"_id":"1","v":0}""")))
  }

  // ---- $jq full-language dynamic mode -------------------------------------

  test("$jq dynamic: reference test . + {test: 1} (TestScript jq2)") {
    val out = outDocs(run(
      docs("""{"_id":"0","test":0}"""),
      """[{"$jq": ". + {test: 1}"}]"""))
    assert(out == Set(node("""{"_id":"0","test":1}""")))
  }

  test("$jq dynamic: .[] iteration, reduce, as-binding") {
    val out = outDocs(run(
      docs("""{"_id":"0","xs":[1,2,3],"base":10}"""),
      """[{"$jq": ".base as $b | {\"_id\": ._id, \"total\": (reduce .xs[] as $x ($b; . + $x)), \"n\": (.xs | length)}"}]"""))
    assert(out == Set(node("""{"_id":"0","total":16,"n":3}""")))
  }

  test("$jq dynamic: recursive def (static mode rejects it)") {
    val script = """def fact: if . < 2 then 1 else . * (. - 1 | fact) end;
                    {"_id": ._id, "f": (.n | fact)}"""
    val out = outDocs(run(
      docs("""{"_id":"0","n":5}"""),
      s"""[{"$$jq": ${org.json4s.jackson.JsonMethods.compact(
        org.json4s.jackson.JsonMethods.render(org.json4s.JString(script)))}}]"""))
    assert(out == Set(node("""{"_id":"0","f":120}""")))
    val e = intercept[graft.operators.JqCompiler.JqCompileError] {
      graft.operators.JqCompiler.compileProgram(script,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("n",
            org.apache.spark.sql.types.LongType))))
    }
    assert(e.getMessage.contains("recursive"))
  }

  test("$jq dynamic: def with filter param is call-by-name") {
    val out = outDocs(run(
      docs("""{"_id":"0","xs":[1,2,3]}"""),
      """[{"$jq": "def second(g): [.xs[] | g] | .[1]; {\"_id\": ._id, \"y\": second(. * 10)}"}]"""))
    assert(out == Set(node("""{"_id":"0","y":20}""")))
  }

  test("$jq dynamic: empty output stream drops the message (select)") {
    val out = outDocs(run(
      docs("""{"_id":"0","v":1}""", """{"_id":"1","v":5}"""),
      """[{"$jq": "select(.v > 3)"}]"""))
    assert(out == Set(node("""{"_id":"1","v":5}""")))
  }

  test("$jq dynamic: include loads module defs (Features.jqModuleLoader)") {
    val out = outDocs(run(
      docs("""{"_id":"0","n":4,"xs":[1,2]}"""),
      """[{"$jq": "include \"resource:/mod.jq\"; {\"_id\": ._id, \"i\": (.n | inc), \"s\": sumxs}"}]"""))
    assert(out == Set(node("""{"_id":"0","i":5,"s":3}""")))
  }

  test("dynamic expr: trig/bitwise/ISO-date/maxN parity with the typed engine") {
    val out = outDocs(run(
      docs("""{"_id":"0","x":6,"y":3,"s":"abc","ts":"2021-03-04T05:06:07Z","a":[3,1,null,4]}"""),
      """[{"$addFields": {
            "band": {"$bitAnd": ["$x", "$y"]},
            "bnot": {"$bitNot": "$x"},
            "blen": {"$strLenBytes": "$s"},
            "iw": {"$isoWeek": "$ts"},
            "idw": {"$isoDayOfWeek": "$ts"},
            "iwy": {"$isoWeekYear": "$ts"},
            "top2": {"$maxN": {"input": "$a", "n": 2}},
            "c": {"$cos": 0},
            "ash": {"$asinh": 0}}},
          {"$project": {"band": 1, "bnot": 1, "blen": 1, "iw": 1, "idw": 1,
                        "iwy": 1, "top2": 1, "c": 1, "ash": 1}}]"""))
    assert(out == Set(node(
      """{"_id":"0","band":2,"bnot":-7,"blen":3,"iw":9,"idw":4,"iwy":2021,
         "top2":[4,3],"c":1.0,"ash":0.0}""".replaceAll("\\s+", ""))))
  }

  test("sortableKey: unsigned-lexicographic byte order matches DynJson.compare") {
    import graft.dynamic.DynJson
    val rnd = new scala.util.Random(99)
    val nodes: Seq[com.fasterxml.jackson.databind.JsonNode] =
      Seq(DynJson.MISSING, DynJson.nodes.nullNode(),
        DynJson.nodes.booleanNode(true), DynJson.nodes.booleanNode(false)) ++
      Seq.fill(40)(DynJson.nodes.numberNode(rnd.nextLong(2000) - 1000)) ++
      Seq.fill(40)(DynJson.nodes.numberNode(rnd.nextDouble() * 2000 - 1000)) ++
      Seq.fill(40)(DynJson.nodes.textNode(rnd.alphanumeric.take(rnd.nextInt(6)).mkString))
    def unsignedCmp(a: Array[Byte], b: Array[Byte]): Int = {
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n) {
        val d = (a(i) & 0xff) - (b(i) & 0xff)
        if (d != 0) return Integer.signum(d)
        i += 1
      }
      Integer.compare(a.length, b.length)
    }
    for (x <- nodes; y <- nodes) {
      val want = Integer.signum(DynJson.compare(x, y))
      val got = unsignedCmp(DynJson.sortableKey(x), DynJson.sortableKey(y))
      assert(got == want, s"order mismatch: $x vs $y (got $got want $want)")
    }
  }

  test("dynamic $setWindowFields: running sum, rank, shift over cross-type sort keys") {
    // sort key "s" is heterogeneous: numbers sort before strings (BSON
    // bracket order), carried through the window by the binary sortableKey
    val out = outDocs(run(
      docs("""{"_id":"0","g":"a","s":2,"v":10}""",
        """{"_id":"1","g":"a","s":"x","v":5}""",
        """{"_id":"2","g":"a","s":1,"v":2.5}""",
        """{"_id":"3","g":"b","s":1,"v":7}"""),
      """[{"$setWindowFields": {
            "partitionBy": "$g", "sortBy": {"s": 1},
            "output": {
              "run": {"$sum": "$v",
                      "window": {"documents": ["unbounded", "current"]}},
              "num": {"$documentNumber": {}},
              "prev": {"$shift": {"output": "$v", "by": -1, "default": "none"}},
              "hi": {"$max": "$v",
                     "window": {"documents": ["unbounded", "current"]}},
              "tot": {"$sum": "$v"}}}},
          {"$project": {"run": 1, "num": 1, "prev": 1, "hi": 1, "tot": 1}}]"""))
    // group a sort order: s=1 (v=2.5), s=2 (v=10), s="x" (v=5); `hi` is a
    // RUNNING max (explicit frame); window-less `tot` is Mongo's default
    // whole-partition frame even with sortBy
    assert(out == Set(
      node("""{"_id":"2","run":2.5,"num":1,"prev":"none","hi":2.5,"tot":17.5}"""),
      node("""{"_id":"0","run":12.5,"num":2,"prev":2.5,"hi":10,"tot":17.5}"""),
      node("""{"_id":"1","run":17.5,"num":3,"prev":10,"hi":10,"tot":17.5}"""),
      node("""{"_id":"3","run":7,"num":1,"prev":"none","hi":7,"tot":7}""")))
  }

  test("dynamic $setWindowFields: calculus + statistics family") {
    val out = outDocs(run(
      docs("""{"_id":"0","g":"a","x":1,"v":0}""",
        """{"_id":"1","g":"a","x":2,"v":10}""",
        """{"_id":"2","g":"a","x":3,"v":null}""",
        """{"_id":"3","g":"a","x":4,"v":20}"""),
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
              "cv": {"$covariancePop": ["$x", "$v"]},
              "rsum": {"$sum": "$v", "window": {"range": [-1, "current"]}},
              "set": {"$addToSet": {"$mod": ["$x", 2]},
                      "window": {"documents": ["unbounded", "current"]}}}}},
          {"$project": {"slope": 1, "area": 1, "fill": 1, "ema": 1,
                        "sd": {"$round": ["$sd", 6]},
                        "cv": 1, "rsum": 1, "set": 1}}]"""))
    assert(out == Set(
      node("""{"_id":"0","slope":null,"area":0.0,"fill":0.0,"ema":0.0,
              "sd":8.164966,"cv":10.0,"rsum":0,"set":[1]}"""),
      node("""{"_id":"1","slope":10.0,"area":5.0,"fill":10.0,"ema":5.0,
              "sd":8.164966,"cv":10.0,"rsum":10,"set":[0,1]}"""),
      node("""{"_id":"2","slope":null,"area":5.0,"fill":15.0,"ema":5.0,
              "sd":8.164966,"cv":10.0,"rsum":10,"set":[0,1]}"""),
      node("""{"_id":"3","slope":null,"area":5.0,"fill":20.0,"ema":12.5,
              "sd":8.164966,"cv":10.0,"rsum":20,"set":[0,1]}""")))
  }

  test("dynamic $setWindowFields: range-window $integral matches the typed engine") {
    val input = docs(
      """{"_id":"0","x":0,"v":0}""", """{"_id":"1","x":1,"v":2}""",
      """{"_id":"2","x":2,"v":4}""", """{"_id":"3","x":4,"v":8}""",
      """{"_id":"4","x":7,"v":14}""")
    val out = outDocs(run(input,
      """[{"$setWindowFields": {"sortBy": {"x": 1},
            "output": {
              "back": {"$integral": {"input": "$v"},
                       "window": {"range": [-2, "current"]}},
              "fwd":  {"$integral": {"input": "$v"},
                       "window": {"range": ["current", "unbounded"]}}}}},
          {"$project": {"back": 1, "fwd": 1}}]"""))
    assert(out == Set(
      node("""{"_id":"0","back":0.0,"fwd":49.0}"""),
      node("""{"_id":"1","back":1.0,"fwd":48.0}"""),
      node("""{"_id":"2","back":4.0,"fwd":45.0}"""),
      node("""{"_id":"3","back":12.0,"fwd":33.0}"""),
      node("""{"_id":"4","back":0.0,"fwd":0.0}""")))
  }

  test("dynamic window calculus: `unit` on a NUMERIC sort axis is rejected") {
    val input = docs("""{"_id":"0","x":1,"v":2}""", """{"_id":"1","x":2,"v":3}""")
    val ex = intercept[Exception] {
      run(input,
        """[{"$setWindowFields": {"sortBy": {"x": 1},
              "output": {"d": {"$derivative": {"input": "$v", "unit": "second"}}}}}]""")
        .collect()
    }
    def causes(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: causes(t.getCause)
    assert(causes(ex).exists(c =>
      Option(c.getMessage).exists(_.contains("only valid for a date"))))
  }

  test("dynamic $project: any truthy number is plain inclusion, incl. _id") {
    val input = docs("""{"_id":"7","a":1,"b":2}""")
    // {"_id": 2} / {"a": 1.0} are inclusion flags, NOT computed literals
    assert(outDocs(run(input, """[{"$project": {"_id": 2, "a": 1.0}}]""")) ==
      Set(node("""{"_id":"7","a":1}""")))
    // 0.0 excludes like 0
    assert(outDocs(run(input, """[{"$project": {"_id": 0.0, "b": true}}]""")) ==
      Set(node("""{"b":2}""")))
  }

  test("dynamic hidden search scores are stripped from the final output") {
    val input = docs(
      """{"_id":"0","emb":[1.0,0.0],"t":"alpha"}""",
      """{"_id":"1","emb":[0.0,1.0],"t":"beta"}""")
    // pipeline ends right after $vectorSearch — __vsScore must NOT leak
    val out = outDocs(run(input,
      """[{"$vectorSearch": {"path": "emb", "queryVector": [1.0, 0.0],
             "limit": 2}}]"""))
    assert(out == Set(
      node("""{"_id":"0","emb":[1.0,0.0],"t":"alpha"}"""),
      node("""{"_id":"1","emb":[0.0,1.0],"t":"beta"}""")))
  }

  test("dynamic $setWindowFields: integral sums stay integers; push keeps frame order") {
    val out = outDocs(run(
      docs("""{"_id":"0","k":1,"v":2}""", """{"_id":"1","k":2,"v":3}"""),
      """[{"$setWindowFields": {"sortBy": {"k": 1},
            "output": {"tot": {"$sum": "$v",
                         "window": {"documents": ["unbounded", "current"]}},
                       "seen": {"$push": "$v",
                         "window": {"documents": ["unbounded", "current"]}}}}},
          {"$project": {"tot": 1, "seen": 1}}]"""))
    assert(out == Set(
      node("""{"_id":"0","tot":2,"seen":[2]}"""),
      node("""{"_id":"1","tot":5,"seen":[2,3]}""")))
  }

  test("dynamic window frames: every (lo, hi) bound combo matches a brute-force oracle") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(45)(i => (i, "g" + (i % 3), rnd.between(-50, 50)))
    val input = docs(rows.map { case (i, g, v) =>
      s"""{"_id":"$i","g":"$g","q":$i,"v":$v}""" }: _*)
    val byGroup: Map[String, IndexedSeq[(Int, Int)]] =
      rows.groupBy(_._2).view.mapValues(
        _.map(t => (t._1, t._3)).sortBy(_._1).toIndexedSeq).toMap
    val bounds = Seq("\"unbounded\"", "-2", "\"current\"", "1")
    for (lo <- bounds; hi <- bounds if bounds.indexOf(lo) <= bounds.indexOf(hi)) {
      val out = run(input,
        s"""[{"$$setWindowFields": {
              "partitionBy": "$$g", "sortBy": {"q": 1},
              "output": {
                "s": {"$$sum": "$$v", "window": {"documents": [$lo, $hi]}},
                "f": {"$$first": "$$v", "window": {"documents": [$lo, $hi]}},
                "l": {"$$last": "$$v", "window": {"documents": [$lo, $hi]}},
                "p": {"$$push": "$$v", "window": {"documents": [$lo, $hi]}}}}}]""")
      def bound(b: String, i: Int, n: Int, isLo: Boolean): Int = b match {
        case "\"unbounded\"" => if (isLo) 0 else n - 1
        case "\"current\""   => i
        case d               => i + d.toInt
      }
      for (d <- outDocs(out)) {
        val (g, q) = (d.path("g").textValue, d.path("q").intValue)
        val part = byGroup(g)
        val i = part.indexWhere(_._1 == q)
        val from = math.max(0, bound(lo, i, part.length, isLo = true))
        val to = math.min(part.length - 1, bound(hi, i, part.length, isLo = false))
        val frame = if (from > to) IndexedSeq.empty
                    else part.slice(from, to + 1).map(_._2)
        assert(d.path("s").longValue == frame.sum.toLong,
          s"sum [$lo,$hi] g=$g q=$q")
        assert((if (d.path("f").isNull) None else Some(d.path("f").intValue)) ==
          frame.headOption, s"first [$lo,$hi] g=$g q=$q")
        assert((if (d.path("l").isNull) None else Some(d.path("l").intValue)) ==
          frame.lastOption, s"last [$lo,$hi] g=$g q=$q")
        assert(d.path("p").asScala.map(_.intValue).toList == frame.toList,
          s"push [$lo,$hi] g=$g q=$q")
      }
    }
  }

  test("dynamic window $median/$percentile ride the numeric value column") {
    val out = outDocs(run(
      docs("""{"_id":"0","g":"a","q":1,"v":10}""",
        """{"_id":"1","g":"a","q":2,"v":20}""",
        """{"_id":"2","g":"a","q":3,"v":40}"""),
      """[{"$setWindowFields": {
            "partitionBy": "$g", "sortBy": {"q": 1},
            "output": {
              "med": {"$median": {"input": "$v", "method": "approximate"}},
              "run": {"$median": {"input": "$v", "method": "approximate"},
                      "window": {"documents": ["unbounded", "current"]}},
              "pcts": {"$percentile": {"input": "$v", "p": [0.5, 1.0],
                                       "method": "approximate"}}}}},
          {"$project": {"med": 1, "run": 1, "pcts": 1}}]"""))
    assert(out == Set(
      node("""{"_id":"0","med":20.0,"run":10.0,"pcts":[20.0,40.0]}"""),
      node("""{"_id":"1","med":20.0,"run":15.0,"pcts":[20.0,40.0]}"""),
      node("""{"_id":"2","med":20.0,"run":20.0,"pcts":[20.0,40.0]}""")))
  }

  test("dynamic shrinking [lo, unbounded) frames keep sort-order semantics") {
    // planned on the REVERSED sort (incremental, not O(partition^2)):
    // order-sensitive ops must still see the ascending sort order
    val out = outDocs(run(
      docs("""{"_id":"0","g":"a","q":1,"v":10}""",
        """{"_id":"1","g":"a","q":2,"v":20}""",
        """{"_id":"2","g":"a","q":3,"v":30}""",
        """{"_id":"3","g":"a","q":4,"v":40}"""),
      """[{"$setWindowFields": {
            "partitionBy": "$g", "sortBy": {"q": 1},
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
                        "window": {"documents": ["current", "unbounded"]}}}}},
          {"$project": {"q": 1, "restSum": 1, "nxt": 1, "fin": 1,
                        "rest": 1, "slope": 1}}]"""))
    assert(out == Set(
      node("""{"_id":"0","q":1,"restSum":100,"nxt":20,"fin":40,
              "rest":[10,20,30,40],"slope":10.0}"""),
      node("""{"_id":"1","q":2,"restSum":90,"nxt":30,"fin":40,
              "rest":[20,30,40],"slope":10.0}"""),
      node("""{"_id":"2","q":3,"restSum":70,"nxt":40,"fin":40,
              "rest":[30,40],"slope":10.0}"""),
      node("""{"_id":"3","q":4,"restSum":40,"nxt":null,"fin":40,
              "rest":[40],"slope":null}""")))
  }

  test("dynamic $documents, collection-less $unionWith, field accessors") {
    val out = outDocs(run(docs("""{"_id":"z"}"""),
      """[{"$documents": [{"a.b": 1, "c": {"d": 2}}, {"a.b": 3}]},
          {"$addFields": {
            "got": {"$getField": "a.b"},
            "set": {"$setField": {"field": "x.y", "input": "$c", "value": 9}},
            "cut": {"$unsetField": {"field": "d", "input": "$c"}}}}]"""))
    assert(out == Set(
      node("""{"a.b":1,"c":{"d":2},"got":1,"set":{"d":2,"x.y":9},"cut":{}}"""),
      // missing input: $setField/$unsetField return null (Mongo semantics)
      node("""{"a.b":3,"got":3,"set":null,"cut":null}""")))
    val unioned = outDocs(run(docs("""{"_id":"z","a":1}"""),
      """[{"$project": {"a": 1, "_id": 0}},
          {"$unionWith": {"pipeline": [{"$documents": [{"a": 7}]}]}}]"""))
    assert(unioned == Set(node("""{"a":1}"""), node("""{"a":7}""")))
    val sampled = run(docs((1 to 400).map(i => s"""{"_id":"$i"}"""): _*),
      """[{"$match": {"$sampleRate": 0.5}}]""").count()
    assert(sampled > 80 && sampled < 320, s"$sampled of 400 at rate 0.5")
  }

  test("dynamic $search text: BM25 over path fields, matches only, rankFusion source") {
    val input = docs(
      """{"_id":"a","body":"spark spark spark","title":""}""",
      """{"_id":"b","body":"spark and other words here","title":"spark"}""",
      """{"_id":"c","body":"nothing relevant","title":"none"}""")
    val out = run(input,
      """[{"$search": {"text": {"query": "spark", "path": ["body", "title"]}}},
          {"$project": {"sc": {"$round": [{"$meta": "searchScore"}, 6]}}}]""")
    val got = outDocs(out).map(d =>
      (d.path("_id").textValue, d.path("sc").doubleValue))
    assert(got.map(_._1) == Set("a", "b") && got.forall(_._2 > 0))
    // a bounded $search pipeline ranks inside $rankFusion
    val fused = outDocs(run(input,
      """[{"$rankFusion": {"input": {"pipelines": {
            "s": [{"$search": {"text": {"query": "spark", "path": "body"}}},
                  {"$limit": 2}]}}}},
          {"$project": {"score": {"$round": [{"$meta": "score"}, 6]}}}]"""))
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(fused.map(d => (d.path("_id").textValue,
      d.path("score").doubleValue)) ==
      Set(("a", r6(1.0 / 61)), ("b", r6(1.0 / 62))))
  }

  test("dynamic $rankFusion: weighted RRF, cross-type sort ranks, $meta score") {
    val input = docs(
      """{"_id":"a","pop":10,"vec":[1,0]}""",
      """{"_id":"b","pop":40,"vec":[0.8,0.6]}""",
      """{"_id":"c","pop":30,"vec":[0,1]}""",
      """{"_id":"d","pop":20,"vec":[-1,0]}""")
    val out = outDocs(run(input,
      """[{"$rankFusion": {
            "input": {"pipelines": {
              "byPop": [{"$sort": {"pop": -1}}, {"$limit": 3}],
              "byVec": [{"$vectorSearch": {"path": "vec",
                          "queryVector": [1, 0], "limit": 3}}]}},
            "combination": {"weights": {"byPop": 2, "byVec": 1}}}},
          {"$project": {"score": {"$round": [{"$meta": "score"}, 6]}}}]"""))
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(out.map(d => (d.path("_id").textValue,
      d.path("score").doubleValue)) == Set(
      ("b", r6(2.0 / 61 + 1.0 / 62)), ("c", r6(2.0 / 62 + 1.0 / 63)),
      ("d", r6(2.0 / 63)), ("a", r6(1.0 / 61))))
    intercept[IllegalArgumentException] { // unbounded pipeline refused
      run(input, """[{"$rankFusion": {"input": {"pipelines": {
        "x": [{"$sort": {"pop": 1}}]}}}}]""")
    }
  }

  test("dynamic $vectorSearch: top-k, filter, $meta score") {
    val out = outDocs(run(
      docs("""{"_id":"a","vec":[1,0]}""", """{"_id":"b","vec":[0.6,0.8]}""",
        """{"_id":"c","vec":[0,1]}""", """{"_id":"d","vec":[-1,0]}"""),
      """[{"$vectorSearch": {"path": "vec", "queryVector": [1, 0], "limit": 2}},
          {"$project": {"score": {"$round": [{"$meta": "vectorSearchScore"}, 4]}}}]"""))
    assert(out.map(d => (d.path("_id").textValue,
      d.path("score").doubleValue)) == Set(("a", 1.0), ("b", 0.6)))
    val filtered = run(
      docs("""{"_id":"a","vec":[1,0]}""", """{"_id":"b","vec":[0.6,0.8]}""",
        """{"_id":"c","vec":[0,1]}"""),
      """[{"$vectorSearch": {"path": "vec", "queryVector": [1, 0],
            "limit": 2, "filter": {"_id": {"$ne": "a"}}}}]""")
    assert(outDocs(filtered).map(_.path("_id").textValue) == Set("b", "c"))
  }

  test("dynamic $bucketAuto: even-count cross-type buckets, Mongo boundaries") {
    val out = outDocs(run(
      docs((1 to 7).map(i => s"""{"_id":"$i","v":$i}"""): _*),
      """[{"$bucketAuto": {"groupBy": "$v", "buckets": 2,
            "output": {"n": {"$sum": 1}}}}]"""))
    assert(out == Set(
      node("""{"_id":{"min":1,"max":5},"n":4}"""),
      node("""{"_id":{"min":5,"max":7},"n":3}""")))
  }

  test("dynamic $graphLookup: BFS depths over schemaless docs, cycles, restrict") {
    val emp = docs(
      """{"_id":"a","name":"a","boss":null}""",
      """{"_id":"b","name":"b","boss":"a"}""",
      """{"_id":"c","name":"c","boss":"b"}""",
      """{"_id":"d","name":"d","boss":"c"}""",
      """{"_id":"x","name":"x","boss":"y"}""",
      """{"_id":"y","name":"y","boss":"x"}""")
    val ctx = graft.dynamic.DynPipeline.DynCtx(catalog = { case "emp" => emp })
    val out = graft.dynamic.DynPipeline.run(emp,
      org.json4s.jackson.JsonMethods.parse(
        """[{"$graphLookup": {"from": "emp", "startWith": "$boss",
              "connectFromField": "boss", "connectToField": "name",
              "as": "chain", "depthField": "dep"}}]"""), ctx)
    def chain(n: String): Set[(String, Long)] =
      outDocs(out).find(_.path("name").textValue == n).get.path("chain")
        .asScala.map(e => (e.path("name").textValue, e.path("dep").longValue)).toSet
    assert(chain("d") == Set(("c", 0L), ("b", 1L), ("a", 2L)))
    assert(chain("a") == Set.empty) // null startWith
    assert(chain("x") == Set(("y", 0L), ("x", 1L))) // cycle stops on visited
  }

  test("dynamic $sort orders cross-type by BSON bracket; $limit applies") {
    val out = run(
      docs("""{"_id":"0","v":"a"}""", """{"_id":"1","v":2}""", """{"_id":"2","v":1}"""),
      """[{"$sort": {"v": 1}}, {"$limit": 2}]""")
    val got = out.select("doc").collect()
      .map(r => graft.dynamic.DynJson.parse(r.getString(0)).path("_id").textValue).toList
    // numbers sort before strings: v=1, v=2, then "a" is cut by the limit
    assert(got == List("2", "1"))
  }

  test("dynamic $densify generates stub docs for partition gaps") {
    val out = outDocs(run(
      docs("""{"_id":"0","g":"a","n":1}""", """{"_id":"1","g":"a","n":4}"""),
      """[{"$densify": {"field": "n", "partitionByFields": ["g"],
            "range": {"step": 1, "bounds": "partition"}}}]"""))
    assert(out == Set(
      node("""{"_id":"0","g":"a","n":1}"""), node("""{"_id":"1","g":"a","n":4}"""),
      node("""{"g":"a","n":2}"""), node("""{"g":"a","n":3}""")))
  }

  test("dynamic $densify date unit: day grid stubs ISO dates") {
    val out = outDocs(run(
      docs("""{"_id":"0","d":"2021-01-01T00:00:00Z"}""",
           """{"_id":"1","d":"2021-01-04T00:00:00Z"}"""),
      """[{"$densify": {"field": "d",
            "range": {"step": 1, "unit": "day", "bounds": "full"}}}]"""))
    assert(out == Set(
      node("""{"_id":"0","d":"2021-01-01T00:00:00Z"}"""),
      node("""{"_id":"1","d":"2021-01-04T00:00:00Z"}"""),
      node("""{"d":"2021-01-02T00:00:00Z"}"""),
      node("""{"d":"2021-01-03T00:00:00Z"}""")))
  }

  test("dynamic $sortByCount and $facet") {
    val byCount = outDocs(run(
      docs("""{"_id":"0","t":"x"}""", """{"_id":"1","t":"x"}""", """{"_id":"2","t":"y"}"""),
      """[{"$sortByCount": "$t"}]"""))
    assert(byCount == Set(node("""{"_id":"x","count":2}"""),
      node("""{"_id":"y","count":1}""")))
    val facet = outDocs(run(
      docs("""{"_id":"0","v":5}"""),
      """[{"$facet": {"cnt": [{"$count": "n"}],
                      "ids": [{"$project": {"_id": 1}}]}}]"""))
    assert(facet == Set(node("""{"cnt":[{"n":1}],"ids":[{"_id":"0"}]}""")))
  }

  test("dynamic $fill: locf over schemaless docs; value via $ifNull") {
    val out = outDocs(run(
      docs("""{"_id":"0","g":"a","s":1,"v":10}""",
        """{"_id":"1","g":"a","s":2,"v":null}""",
        """{"_id":"2","g":"a","s":3}""",
        """{"_id":"3","g":"b","s":1,"w":null}"""),
      """[{"$fill": {"partitionBy": "$g", "sortBy": {"s": 1},
            "output": {"v": {"method": "locf"}, "w": {"value": "x"}}}},
          {"$project": {"v": 1, "w": 1}}]"""))
    assert(out == Set(
      node("""{"_id":"0","v":10,"w":"x"}"""),
      node("""{"_id":"1","v":10,"w":"x"}"""),
      node("""{"_id":"2","v":10,"w":"x"}"""),
      node("""{"_id":"3","v":null,"w":"x"}""")))
  }

  test("dynamic expr: $regexFindAll returns every {match, idx, captures}") {
    val out = outDocs(run(
      docs("""{"_id":"0","s":"a1b22"}"""),
      """[{"$project": {"m": {"$regexFindAll": {"input": "$s", "regex": "([0-9]+)"}}}}]"""))
    assert(out == Set(node(
      """{"_id":"0","m":[{"match":"1","idx":1,"captures":["1"]},
          {"match":"22","idx":3,"captures":["22"]}]}""".replaceAll("\\n\\s*", ""))))
  }

  test("dynamic expr: $dateSubtract mirrors $dateAdd") {
    val out = outDocs(run(
      docs("""{"_id":"0","ts":"2021-03-04T05:06:07Z"}"""),
      """[{"$project": {"back": {"$dateSubtract":
            {"startDate": "$ts", "unit": "day", "amount": 3}}}}]"""))
    assert(out == Set(node("""{"_id":"0","back":"2021-03-01T05:06:07Z"}""")))
  }

  test("$jslt dynamic: fallback() skips null and missing") {
    val out = outDocs(run(
      docs("""{"_id":"0","a":null,"b":2}"""),
      """[{"$jslt": "{\"_id\": ._id, \"v\": fallback(.a, .b, 9), \"w\": fallback(.x, .y)}"}]"""))
    // all-null fallback -> null -> the key is omitted (JSLT object rule)
    assert(out == Set(node("""{"_id":"0","v":2}""")))
  }

  test("$jq dynamic: test/sub/gsub regex builtins") {
    val out = outDocs(run(
      docs("""{"_id":"0","s":"a1b2c3"}"""),
      """[{"$jq": "{\"_id\": ._id, \"t\": (.s | test(\"[0-9]\")), \"one\": (.s | sub(\"[0-9]\"; \"_\")), \"all\": (.s | gsub(\"[0-9]\"; \"_\"))}"}]"""))
    assert(out == Set(node("""{"_id":"0","t":true,"one":"a_b2c3","all":"a_b_c_"}""")))
  }

  test("$jq dynamic: named captures in sub/gsub, capture and match builtins") {
    val out = outDocs(run(
      docs("""{"_id":"0","s":"a1b22c"}"""),
      """[{"$jq": "{\"_id\": ._id, \"sw\": (.s | gsub(\"(?<d>[0-9]+)\"; \"<\\(.d)>\")), \"cap\": (.s | capture(\"(?<hd>[a-z])(?<n>[0-9]+)\")), \"m\": (.s | match(\"b(?<x>[0-9]+)\") | {off: .offset, x: (.captures[0].string)})}"}]"""))
    assert(out == Set(node(
      """{"_id":"0","sw":"a<1>b<22>c","cap":{"hd":"a","n":"1"},"m":{"off":2,"x":"22"}}""")))
  }

  test("$jq dynamic: namespaced import (import \"m\" as ns; ns::f)") {
    val out = outDocs(run(
      docs("""{"_id":"0","n":4,"xs":[1,2]}"""),
      """[{"$jq": "import \"resource:/mod.jq\" as m; {\"_id\": ._id, \"i\": (.n | m::inc), \"s\": m::sumxs}"}]"""))
    assert(out == Set(node("""{"_id":"0","i":5,"s":3}""")))
  }

  test("$jq dynamic: to_entries/from_entries round-trip with transform") {
    val out = outDocs(run(
      docs("""{"_id":"0","m":{"a":1,"b":2}}"""),
      """[{"$jq": "{\"_id\": ._id, \"m\": (.m | to_entries | map({key: .key, value: (.value * 2)}) | from_entries)}"}]"""))
    assert(out == Set(node("""{"_id":"0","m":{"a":2,"b":4}}""")))
  }

  // ---- dynamic sink / store stages ----------------------------------------

  private def dynCtx(sent: scala.collection.mutable.Buffer[DataFrame] = null,
      store: graft.sources.DocumentStore = null,
      catalog: String => DataFrame = null) =
    DynPipeline.DynCtx(
      producer = if (sent == null) _ => () else df => sent += df,
      store = store,
      catalog = if (catalog == null)
        n => throw new IllegalArgumentException(s"no catalog: $n") else catalog)

  private def tmpStore() = new graft.sources.BucketedParquetStore(spark,
    java.nio.file.Files.createTempDirectory("graft_dyn").toString, numBuckets = 8)

  test("dynamic $send: string topic sends per message, non-string passes through") {
    val sent = scala.collection.mutable.Buffer.empty[DataFrame]
    val out = outDocs(DynPipeline.run(
      docs("""{"_id":"0","t":"a"}""", """{"_id":"1","t":5}""", """{"_id":"2","t":"b"}"""),
      """[{"$send": {"topic": "$t"}}]""", dynCtx(sent)))
    assert(out == Set(node("""{"_id":"1","t":5}"""))) // non-string stays
    val produced = sent.head.select("__topic").collect().map(_.getString(0)).toSet
    assert(produced == Set("a", "b"))
  }

  test("dynamic $per batches docs into {as: [...]} with fresh keys (Per.java:28-49)") {
    val out = DynPipeline.run(
      docs("""{"a":1}""", """{"a":2}""", """{"a":3}""").repartition(1),
      """[{"$per": {"amount": 2, "as": "batch"}}]""")
    val got = out.select("doc").collect()
      .map(r => DynJson.parse(r.getString(0)).path("batch").size).sorted.toList
    assert(got == List(1, 2))
    assert(out.select("key").collect().forall(_.getString(0) != null)) // UUID keys
  }

  test("dynamic $delay parks per topic; redeliverDue pops due docs") {
    val st = tmpStore()
    val out = DynPipeline.run(
      docs("""{"_id":"a","d":60000,"at":1704067200000}""",
           """{"_id":"b","d":7200000,"at":1704067200000}"""),
      """[{"$delay": {"duration": "$d", "topic": "later", "_clock": "$at"}}]""",
      dynCtx(store = st))
    assert(out.count() == 0)
    val due = SinkStages.redeliverDue(st, "later",
      lit("2024-01-01 01:00:00").cast("timestamp")) // epoch 1704070800
    val ids = due.select("doc").collect()
      .map(r => DynJson.parse(r.getString(0)).path("_id").textValue).toSet
    assert(ids == Set("a")) // b due at 02:00
  }

  test("dynamic $probe counts complete event-time minutes") {
    val sent = scala.collection.mutable.Buffer.empty[DataFrame]
    val out = DynPipeline.run(
      docs("""{"at":1704067210000}""", """{"at":1704067250000}""",
           """{"at":1704067270000}""", """{"at":1704067325000}"""),
      """[{"$probe": {"name": "p", "topic": "m", "_clock": "$at"}}]""",
      dynCtx(sent))
    assert(out.count() == 4) // passthrough
    val got = sent.head.select("name", "count").collect()
      .map(r => (r.getString(0), r.getLong(1))).toList.sorted
    assert(got == List(("p", 1L), ("p", 2L))) // last minute still open
  }

  test("dynamic $out then $merge: bucketed upsert, modes, echo re-key") {
    val st = tmpStore()
    // create the collection via $out (replace/insert on _id)
    DynPipeline.run(
      docs("""{"_id":"a","v":1,"w":10}""", """{"_id":"b","v":2,"w":20}"""),
      """[{"$out": {"into": "t"}}]""", dynCtx(store = st)).count()
    // merge: overlay v for a, insert c; keep b untouched
    val echo = DynPipeline.run(
      docs("""{"_id":"a","v":100}""", """{"_id":"c","v":3}"""),
      """[{"$merge": {"into": "t", "on": "_id",
                      "whenMatched": "merge", "whenNotMatched": "insert"}}]""",
      dynCtx(store = st))
    val echoed = echo.collect().map(r => (r.getString(0),
      DynJson.parse(r.getString(1)))).toMap
    assert(echoed.keySet == Set("a", "c"))
    assert(echoed("a") == node("""{"_id":"a","v":100,"w":10}""")) // overlay keeps w
    val coll = st.read("t").select("doc").collect()
      .map(r => DynJson.parse(r.getString(0))).toSet
    assert(coll == Set(
      node("""{"_id":"a","v":100,"w":10}"""),
      node("""{"_id":"b","v":2,"w":20}"""),
      node("""{"_id":"c","v":3}""")))
    // incremental: the second write touched a strict subset of buckets
    assert(st.manifest("t").nonEmpty)
  }

  test("dynamic $delete removes matching docs, drops keyless messages") {
    val st = tmpStore()
    DynPipeline.run(
      docs("""{"_id":"a","v":1}""", """{"_id":"b","v":2}""", """{"_id":"c","v":3}"""),
      """[{"$out": {"into": "t"}}]""", dynCtx(store = st)).count()
    val out = DynPipeline.run(
      docs("""{"_id":"b"}""", """{"x":1}"""), // second lacks _id -> dropped
      """[{"$delete": {"from": "t", "on": "_id"}}]""", dynCtx(store = st))
    assert(outDocs(out) == Set(node("""{"_id":"b"}""")))
    val left = st.read("t").select("doc").collect()
      .map(r => DynJson.parse(r.getString(0)).path("_id").textValue).toSet
    assert(left == Set("a", "c"))
  }

  test("dynamic $lookup equality form: array attach, unwind, inner") {
    val dims = docs("""{"k":1,"name":"one"}""", """{"k":1,"name":"uno"}""",
                    """{"k":2,"name":"two"}""")
    val ctx = dynCtx(catalog = _ => dims)
    val out = outDocs(DynPipeline.run(
      docs("""{"_id":"a","fk":1}""", """{"_id":"b","fk":9}"""),
      """[{"$lookup": {"from": "d", "localField": "fk", "foreignField": "k",
                       "as": "m"}}]""", ctx))
    val byId = out.map(d => d.path("_id").textValue -> d.path("m").size).toMap
    assert(byId == Map("a" -> 2, "b" -> 0))
    val unwound = outDocs(DynPipeline.run(
      docs("""{"_id":"a","fk":2}"""),
      """[{"$lookup": {"from": "d", "localField": "fk", "foreignField": "k",
                       "as": "m", "unwind": true}}]""", ctx))
    assert(unwound == Set(node("""{"_id":"a","fk":2,"m":{"k":2,"name":"two"}}""")))
    val inner = outDocs(DynPipeline.run(
      docs("""{"_id":"a","fk":1}""", """{"_id":"b","fk":9}"""),
      """[{"$lookup": {"from": "d", "localField": "fk", "foreignField": "k",
                       "as": "m", "inner": true}}]""", ctx))
    assert(inner.map(_.path("_id").textValue) == Set("a"))
  }

  test("dynamic $lookup remote connectionString/database uses the second catalog") {
    // Lookup.java:74-78 — the local catalog must NOT be consulted, and the
    // remote resolver receives the exact (uri, database, from) triple
    val dims = docs("""{"k":1,"name":"one"}""", """{"k":2,"name":"two"}""")
    val seen = scala.collection.mutable.Buffer.empty[(String, String, String)]
    val ctx = DynPipeline.DynCtx(
      catalog = n => throw new IllegalArgumentException(s"local catalog hit: $n"),
      remoteCatalog = Some((u, d, c) => { seen += ((u, d, c)); dims }))
    val out = outDocs(DynPipeline.run(
      docs("""{"_id":"a","fk":1}""", """{"_id":"b","fk":9}"""),
      """[{"$lookup": {"from": "d", "connectionString": "mongodb://dims:27017",
            "database": "dims", "localField": "fk", "foreignField": "k",
            "as": "m"}}]""", ctx))
    val byId = out.map(d => d.path("_id").textValue -> d.path("m").size).toMap
    assert(byId == Map("a" -> 1, "b" -> 0))
    assert(seen.toList == List(("mongodb://dims:27017", "dims", "d")))
    // pipeline form routes through the same resolver
    val out2 = outDocs(DynPipeline.run(
      docs("""{"_id":"a","fk":1}"""),
      """[{"$lookup": {"from": "d", "connectionString": "mongodb://dims:27017",
            "database": "dims", "let": {"v": "$fk"},
            "pipeline": [{"$match": {"$expr": {"$eq": ["$k", "$$v"]}}}],
            "as": "m"}}]""", ctx))
    assert(out2.head.path("m").size == 1)
  }

  test("dynamic $lookup pipeline form: prefix + eq-correlated $match + trailing stages") {
    val dims = docs(
      """{"k":1,"v":30,"tag":"x"}""", """{"k":1,"v":10,"tag":"keep"}""",
      """{"k":1,"v":20,"tag":"keep"}""", """{"k":2,"v":5,"tag":"keep"}""")
    val ctx = dynCtx(catalog = _ => dims)
    val out = outDocs(DynPipeline.run(
      docs("""{"_id":"a","fk":1}""", """{"_id":"b","fk":2}"""),
      """[{"$lookup": {"from": "d", "let": {"lk": "$fk"},
            "pipeline": [
              {"$match": {"tag": "keep"}},
              {"$match": {"$expr": {"$eq": ["$$lk", "$k"]}}},
              {"$sort": {"v": -1}}, {"$limit": 2},
              {"$project": {"v": 1, "_id": 0}}],
            "as": "m"}}]""", ctx))
    val byId = out.map(d => d.path("_id").textValue ->
      d.path("m").elements().asScala.map(_.path("v").intValue).toList).toMap
    assert(byId == Map("a" -> List(20, 10), "b" -> List(5)))
  }

  test("dynamic $lookup pipeline form: no correlated $match attaches everything") {
    val dims = docs("""{"x":1}""", """{"x":2}""")
    val out = outDocs(DynPipeline.run(
      docs("""{"_id":"a"}"""),
      """[{"$lookup": {"from": "d",
            "pipeline": [{"$match": {"x": {"$gte": 2}}}], "as": "m"}}]""",
      dynCtx(catalog = _ => dims)))
    assert(out.head.path("m").size == 1)
  }

  test("dynamic $lookup pipeline form: theta correlation broadcasts and matches") {
    val dims = docs("""{"k":1,"v":"lo"}""", """{"k":5,"v":"hi"}""")
    val out = outDocs(DynPipeline.run(
      docs("""{"_id":"a","fk":1}""", """{"_id":"b","fk":9}"""),
      """[{"$lookup": {"from": "d", "let": {"lk": "$fk"},
            "pipeline": [{"$match": {"$expr": {"$gte": ["$$lk", "$k"]}}}],
            "as": "m"}}]""", dynCtx(catalog = _ => dims)))
    val byId = out.map(d => d.path("_id").textValue ->
      d.path("m").elements().asScala.map(_.path("v").textValue).toList).toMap
    // fk=1 matches only k=1; fk=9 matches both (k <= lk)
    assert(byId == Map("a" -> List("lo"), "b" -> List("lo", "hi")))
  }

  test("dynamic $lookup theta correlation refuses an over-threshold `from` side") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "16b")
    try {
      val e = intercept[IllegalArgumentException] {
        DynPipeline.run(docs("""{"_id":"a","fk":1}"""),
          """[{"$lookup": {"from": "d", "let": {"lk": "$fk"},
                "pipeline": [{"$match": {"$expr": {"$gte": ["$$lk", "$k"]}}}],
                "as": "m"}}]""",
          dynCtx(catalog = _ => docs(
            """{"k":1,"pad":"xxxxxxxxxxxxxxxxxxxxxxxx"}""")))
          .count()
      }
      assert(e.getMessage.contains("_rangeJoin"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("dynamic $group modern accumulators: median/percentile/maxN/minN/top/bottom/firstN") {
    val input = docs(
      """{"_id":"0","g":"a","v":10,"w":"w10"}""",
      """{"_id":"1","g":"a","v":30,"w":"w30"}""",
      """{"_id":"2","g":"a","v":20,"w":"w20"}""",
      """{"_id":"3","g":"a","v":40,"w":"w40"}""",
      """{"_id":"4","g":"b","v":5,"w":"w5"}""")
    val out = outDocs(run(input,
      """[{"$group": {"_id": "$g",
            "med":  {"$median": {"input": "$v", "method": "approximate"}},
            "pcts": {"$percentile": {"input": "$v", "p": [0.25, 1.0],
                                     "method": "approximate"}},
            "hi2":  {"$maxN": {"input": "$v", "n": 2}},
            "lo2":  {"$minN": {"input": "$v", "n": 2}},
            "top":  {"$top":    {"output": "$w", "sortBy": {"v": -1}}},
            "bot":  {"$bottom": {"output": "$w", "sortBy": {"v": -1}}},
            "top2": {"$topN":   {"output": "$w", "sortBy": {"v": -1}, "n": 2}},
            "bot2": {"$bottomN":{"output": "$w", "sortBy": {"v": -1}, "n": 2}}}}]"""))
    assert(out == Set(
      node("""{"_id":"a","med":25.0,"pcts":[17.5,40.0],"hi2":[40,30],
              "lo2":[10,20],"top":"w40","bot":"w10",
              "top2":["w40","w30"],"bot2":["w20","w10"]}"""),
      node("""{"_id":"b","med":5.0,"pcts":[5.0,5.0],"hi2":[5],"lo2":[5],
              "top":"w5","bot":"w5","top2":["w5"],"bot2":["w5"]}""")))
    // encounter-order accumulators on a single partition: deterministic
    val fl = outDocs(run(input.coalesce(1),
      """[{"$group": {"_id": "$g", "f2": {"$firstN": {"input": "$v", "n": 2}},
                      "l2": {"$lastN": {"input": "$v", "n": 2}}}}]"""))
    assert(fl == Set(
      node("""{"_id":"a","f2":[10,30],"l2":[20,40]}"""),
      node("""{"_id":"b","f2":[5],"l2":[5]}""")))
  }

  test("dynamic $convert (onError/onNull), $dateFromParts carry, $dateToParts") {
    val out = outDocs(run(
      docs("""{"_id":"0","s":"42","bad":"x","none":null}"""),
      """[{"$project": {
            "n": {"$convert": {"input": "$s", "to": "long"}},
            "e": {"$convert": {"input": "$bad", "to": 16, "onError": -1}},
            "z": {"$convert": {"input": "$none", "to": "double", "onNull": 0}},
            "d": {"$dateFromParts": {"year": 2023, "month": 13, "day": 2,
                                     "hour": 5}},
            "p": {"$dateToParts": {"date": "2024-02-29T10:20:30.400Z"}},
            "iso": {"$dateToParts": {"date": "2024-01-01T00:00:00Z",
                                     "iso8601": true}}}}]"""))
    assert(out == Set(node(
      """{"_id":"0","n":42,"e":-1,"z":0,
          "d":"2024-01-02T05:00:00Z",
          "p":{"year":2024,"month":2,"day":29,"hour":10,"minute":20,
               "second":30,"millisecond":400},
          "iso":{"isoWeekYear":2024,"isoWeek":1,"isoDayOfWeek":1,
                 "hour":0,"minute":0,"second":0,"millisecond":0}}""")))
  }

  test("dynamic stage extensions run; built-ins win on a name clash") {
    val ext = Map[String, (DataFrame, org.json4s.JValue, DynPipeline.DynCtx) => DataFrame](
      "$wait" -> ((df, _, _) => df), // mirrors the reference's test $wait stage
      "$match" -> ((_, _, _) => fail("built-in $match must win")))
    val out = outDocs(DynPipeline.run(
      docs("""{"a":1}""", """{"a":2}"""),
      """[{"$wait": {}}, {"$match": {"a": 2}}]""",
      DynPipeline.DynCtx(extensions = ext)))
    assert(out == Set(node("""{"a":2}""")))
  }

  test("dynamic kitchen sink: addFields|lookup|unwind|jq|match|group|out") {
    val st = tmpStore()
    val dims = docs("""{"cat":"a","mult":2}""", """{"cat":"b","mult":10}""")
    val input = docs(
      """{"_id":"1","cat":"a","vals":[1,2]}""",
      """{"_id":"2","cat":"b","vals":[3]}""",
      """{"_id":"3","cat":"a","vals":[5,0]}""")
    val out = DynPipeline.run(input,
      """[
        {"$addFields": {"n": {"$size": "$vals"}}},
        {"$lookup": {"from": "d", "localField": "cat", "foreignField": "cat",
                     "as": "dim", "unwind": true}},
        {"$unwind": {"path": "$vals"}},
        {"$jq": "{_id: ._id, cat: .cat, n: .n, x: (.vals * .dim.mult)}"},
        {"$match": {"x": {"$gt": 0}}},
        {"$group": {"_id": "$cat", "sx": {"$sum": "$x"}, "c": {"$sum": 1}}},
        {"$out": {"into": "res"}}
      ]""", dynCtx(store = st, catalog = _ => dims))
    out.count() // drive the sink
    val res = st.read("res").select("doc").collect()
      .map(r => DynJson.parse(r.getString(0))).toSet
    // a: (1+2+5)*2 = 16 over 3 surviving unwound rows; b: 3*10 = 30 over 1
    assert(res == Set(
      node("""{"_id":"a","sx":16,"c":3}"""),
      node("""{"_id":"b","sx":30,"c":1}""")))
  }

  test("dynamic mode: $throttle paces rows unchanged") {
    val out = outDocs(DynPipeline.run(
      docs("""{"a":1}""", """{"a":2}"""),
      """[{"$throttle": {"maxPerSecond": 1000000}}]"""))
    assert(out == Set(node("""{"a":1}"""), node("""{"a":2}""")))
  }

  test("dynamic $merge whenMatched UPDATE PIPELINE: $set with $$new, $unset, $replaceWith") {
    val st = new graft.sources.InMemoryStore(spark)
    val ctx = dynCtx(store = st)
    DynPipeline.run(docs(
      """{"_id":"a","v":10,"tag":"keep"}""", """{"_id":"b","v":20,"tag":"t"}"""),
      """[{"$out": {"into": "c"}}]""", ctx).count()
    DynPipeline.run(docs("""{"_id":"a","v":5}""", """{"_id":"z","v":7}"""),
      """[{"$merge": {"into": "c", "whenMatched": [
            {"$set": {"v": {"$add": ["$v", "$$new.v"]},
                      "n": {"$add": [{"$ifNull": ["$n", 0]}, 1]}}},
            {"$unset": "tag"}]}}]""", ctx).count()
    val out = st.read("c").select("doc").collect()
      .map(r => DynJson.parse(r.getString(0))).toSet
    assert(out == Set(
      node("""{"_id":"a","v":15,"n":1}"""),      // matched: summed + counted, tag unset
      node("""{"_id":"b","v":20,"tag":"t"}"""),  // untouched
      node("""{"_id":"z","v":7}""")))            // plain insert
    // $replaceWith $$new behaves like whenMatched replace
    DynPipeline.run(docs("""{"_id":"b","fresh":true}"""),
      """[{"$merge": {"into": "c",
            "whenMatched": [{"$replaceWith": "$$new"}]}}]""", ctx).count()
    val out2 = st.read("c").select("doc").collect()
      .map(r => DynJson.parse(r.getString(0))).toSet
    assert(out2.contains(node("""{"_id":"b","fresh":true}""")))
  }

  test("dynamic $geoNear: spherical meters, query/bounds, GeoJSON locations, order") {
    val input = docs(
      """{"_id":"rome","seg":"y","loc":[12.5,41.9]}""",
      """{"_id":"milan","seg":"y","loc":{"type":"Point","coordinates":[9.19,45.46]}}""",
      """{"_id":"london","seg":"y","loc":[-0.13,51.5]}""",
      """{"_id":"sydney","seg":"y","loc":[151.2,-33.87]}""",
      """{"_id":"skip","seg":"n","loc":[12.5,41.9]}""",
      """{"_id":"bad","seg":"y","loc":[12.5]}""")
    val out = DynPipeline.run(input,
      """[{"$geoNear": {"near": {"type": "Point", "coordinates": [12.5, 41.9]},
            "distanceField": "d", "key": "loc", "spherical": true,
            "query": {"seg": "y"}, "maxDistance": 2000000,
            "distanceMultiplier": 0.001}}]""")
      .select("doc").collect().map(r => DynJson.parse(r.getString(0)))
    // sydney out of range, skip query-filtered, bad location dropped;
    // survivors ascend by distance (GeoJSON loc object accepted)
    assert(out.map(_.path("_id").textValue).toList ==
      List("rome", "milan", "london"))
    val d = out.map(n => n.path("_id").textValue -> n.path("d").doubleValue).toMap
    assert(d("rome") == 0.0)
    assert(math.abs(d("milan") - 477) < 10)
    assert(math.abs(d("london") - 1435) < 15)
  }
}
