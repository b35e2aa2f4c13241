package graft

import graft.mongo.{ExprCtx, MongoExpr}
import org.json4s.jackson.JsonMethods
import org.apache.spark.sql.functions._

/** Expression-language unit tests (SURVEY.md §2.9 surface). Each case
  * evaluates a Mongo expression against a one-row document. */
class ExprSpec extends SparkSpec {
  import spark.implicits._

  private def eval(exprJson: String): Any = {
    val df = Seq((2L, 3L, "Hello World", Seq(1L, 2L, 3L, 4L)))
      .toDF("a", "b", "s", "arr")
    implicit val ctx: ExprCtx = ExprCtx()
    df.select(MongoExpr.compile(JsonMethods.parse(exprJson)).as("r")).head().get(0)
  }

  test("arithmetic") {
    assert(eval("""{"$add": ["$a", "$b", 1]}""") == 6L)
    assert(eval("""{"$subtract": ["$b", "$a"]}""") == 1L)
    assert(eval("""{"$multiply": ["$a", "$b"]}""") == 6L)
    assert(eval("""{"$divide": ["$b", 2]}""") == 1.5)
    assert(eval("""{"$mod": ["$b", 2]}""") == 1L)
    assert(eval("""{"$abs": {"$subtract": [0, "$a"]}}""") == 2L)
    assert(eval("""{"$pow": ["$a", 3]}""") == 8.0)
    assert(eval("""{"$floor": 2.7}""") == 2L)
    assert(eval("""{"$ceil": 2.2}""") == 3L)
    assert(eval("""{"$round": [2.567, 2]}""") == 2.57)
    assert(eval("""{"$trunc": [2.567, 2]}""") == 2.56)
    assert(eval("""{"$sqrt": 9}""") == 3.0)
  }

  test("comparison returns booleans; $cmp returns -1/0/1") {
    assert(eval("""{"$eq": ["$a", 2]}""") == true)
    assert(eval("""{"$ne": ["$a", 2]}""") == false)
    assert(eval("""{"$gt": ["$b", "$a"]}""") == true)
    assert(eval("""{"$lte": ["$a", "$b"]}""") == true)
    assert(eval("""{"$cmp": ["$a", "$b"]}""") == -1)
  }

  test("boolean + conditional") {
    assert(eval("""{"$and": [{"$gt": ["$a", 1]}, {"$lt": ["$b", 4]}]}""") == true)
    assert(eval("""{"$or": [{"$gt": ["$a", 5]}, true]}""") == true)
    assert(eval("""{"$not": [{"$gt": ["$a", 5]}]}""") == true)
    assert(eval("""{"$cond": [{"$gt": ["$a", 1]}, "yes", "no"]}""") == "yes")
    assert(eval("""{"$cond": {"if": false, "then": 1, "else": 2}}""") == 2)
    assert(eval("""{"$ifNull": ["$missing_is_null", "dflt"]}""".replace(
      "$missing_is_null", "$s")) == "Hello World")
    assert(eval(
      """{"$switch": {"branches": [
           {"case": {"$eq": ["$a", 1]}, "then": "one"},
           {"case": {"$eq": ["$a", 2]}, "then": "two"}], "default": "?"}}""")
      == "two")
  }

  test("strings") {
    assert(eval("""{"$concat": ["$s", "!"]}""") == "Hello World!")
    assert(eval("""{"$toUpper": "$s"}""") == "HELLO WORLD")
    assert(eval("""{"$toLower": "$s"}""") == "hello world")
    assert(eval("""{"$strLenCP": "$s"}""") == 11)
    assert(eval("""{"$substrCP": ["$s", 6, 5]}""") == "World")
    assert(eval("""{"$split": ["$s", " "]}""") == Seq("Hello", "World"))
    assert(eval("""{"$indexOfCP": ["$s", "World"]}""") == 6)
    assert(eval("""{"$indexOfCP": ["$s", "zzz"]}""") == -1)
    assert(eval("""{"$replaceOne": {"input": "$s", "find": "l", "replacement": "L"}}""")
      == "HeLlo World")
    assert(eval("""{"$replaceAll": {"input": "$s", "find": "l", "replacement": "L"}}""")
      == "HeLLo WorLd")
    assert(eval("""{"$regexMatch": {"input": "$s", "regex": "^Hello"}}""") == true)
    assert(eval("""{"$trim": {"input": "  x  "}}""") == "x")
    assert(eval("""{"$toString": "$a"}""") == "2")
  }

  test("arrays") {
    assert(eval("""{"$arrayElemAt": ["$arr", 0]}""") == 1L)
    assert(eval("""{"$arrayElemAt": ["$arr", -1]}""") == 4L)
    assert(eval("""{"$arrayElemAt": ["$arr", 99]}""") == null)
    assert(eval("""{"$size": "$arr"}""") == 4)
    assert(eval("""{"$slice": ["$arr", 2]}""") == Seq(1L, 2L))
    assert(eval("""{"$slice": ["$arr", -2]}""") == Seq(3L, 4L))
    assert(eval("""{"$slice": ["$arr", 1, 2]}""") == Seq(2L, 3L))
    assert(eval("""{"$in": [2, "$arr"]}""") == true)
    assert(eval("""{"$concatArrays": ["$arr", [9]]}""") == Seq(1L, 2L, 3L, 4L, 9L))
    assert(eval("""{"$reverseArray": "$arr"}""") == Seq(4L, 3L, 2L, 1L))
    assert(eval("""{"$range": [0, 6, 2]}""") == Seq(0L, 2L, 4L))
    assert(eval("""{"$range": [5, 5]}""") == Seq())
    assert(eval("""{"$first": "$arr"}""") == 1L)
    assert(eval("""{"$last": "$arr"}""") == 4L)
    assert(eval("""{"$filter": {"input": "$arr", "as": "x",
                   "cond": {"$gt": ["$$x", 2]}}}""") == Seq(3L, 4L))
    assert(eval("""{"$map": {"input": "$arr", "in":
                   {"$multiply": ["$$this", 10]}}}""") == Seq(10L, 20L, 30L, 40L))
    assert(eval("""{"$reduce": {"input": "$arr", "initialValue": 0,
                   "in": {"$add": ["$$value", "$$this"]}}}""") == 10L)
    assert(eval("""{"$reduce": {"input": {"$map": {"input": "$arr", "in":
                   {"$strLenCP": {"$toString": "$$this"}}}}, "initialValue": 0,
                   "in": {"$add": ["$$value", "$$this"]}}}""") == 4L)
    assert(eval("""{"$isArray": ["$arr"]}""") == true)
    assert(eval("""{"$isArray": ["$s"]}""") == false)
    assert(eval("""{"$zip": {"inputs": ["$arr", "$arr"]}}""") ==
      Seq(Seq(1L, 1L), Seq(2L, 2L), Seq(3L, 3L), Seq(4L, 4L)))
  }

  test("set and N-ary array operators") {
    assert(eval("""{"$firstN": {"input": "$arr", "n": 2}}""") == Seq(1L, 2L))
    assert(eval("""{"$lastN": {"input": "$arr", "n": 2}}""") == Seq(3L, 4L))
    assert(eval("""{"$indexOfArray": ["$arr", 3]}""") == 2)
    assert(eval("""{"$indexOfArray": ["$arr", 99]}""") == -1)
    assert(eval("""{"$sortArray": {"input": {"$reverseArray": "$arr"}, "sortBy": 1}}""")
      == Seq(1L, 2L, 3L, 4L))
    assert(eval("""{"$sortArray": {"input": "$arr", "sortBy": -1}}""")
      == Seq(4L, 3L, 2L, 1L))
    assert(eval("""{"$setUnion": ["$arr", [4, 9]]}""") == Seq(1L, 2L, 3L, 4L, 9L))
    assert(eval("""{"$setIntersection": ["$arr", [2, 9]]}""") == Seq(2L))
    assert(eval("""{"$setDifference": ["$arr", [1, 2]]}""") == Seq(3L, 4L))
    assert(eval("""{"$setEquals": [[2, 1], [1, 2]]}""") == true)
    assert(eval("""{"$setIsSubset": [[1, 2], "$arr"]}""") == true)
    assert(eval("""{"$setIsSubset": [[1, 9], "$arr"]}""") == false)
    assert(eval("""{"$allElementsTrue": [[true, true]]}""") == true)
    assert(eval("""{"$allElementsTrue": [[true, false]]}""") == false)
    assert(eval("""{"$anyElementTrue": [[false, false, true]]}""") == true)
  }

  test("$setField / $unsetField / $dateTrunc / $dateToParts / $dateFromParts") {
    assert(eval("""{"$getField": {"input": {"$setField":
      {"input": {"a": 1}, "field": "b", "value": 5}}, "field": "b"}}""") == 5)
    assert(eval("""{"$unsetField": {"input": {"a": 1, "b": 2}, "field": "b"}}""")
      match { case r: org.apache.spark.sql.Row => r.length == 1; case _ => false })
  }

  test("types + conversion") {
    assert(eval("""{"$toInt": "42"}""") == 42)
    assert(eval("""{"$toLong": "42"}""") == 42L)
    assert(eval("""{"$toDouble": "4.5"}""") == 4.5)
    assert(eval("""{"$toBool": 1}""") == true)
    assert(eval("""{"$convert": {"input": "abc", "to": "int", "onError": -1}}""") == -1)
    assert(eval("""{"$isNumber": ["$a"]}""") == true)
    assert(eval("""{"$isNumber": ["$s"]}""") == false)
    assert(eval("""{"$type": "$s"}""") == "string")
    assert(eval("""{"$type": "$a"}""") == "long")
  }

  test("array-context $sum/$avg/$max/$min and trig") {
    // Mongo $sum preserves the integral element type (10, not 10.0)
    val s = eval("""{"$sum": ["$arr"]}""")
    assert(s == 10L && s.isInstanceOf[Long])
    assert(eval("""{"$avg": ["$arr"]}""") == 2.5)
    assert(eval("""{"$max": ["$arr"]}""") == 4L)
    assert(eval("""{"$min": ["$arr"]}""") == 1L)
    assert(eval("""{"$sin": 0}""") == 0.0)
    assert(eval("""{"$cos": 0}""") == 1.0)
    assert(eval("""{"$atan2": [0, 1]}""") == 0.0)
    assert(eval("""{"$radiansToDegrees": 3.141592653589793}""") == 180.0)
    assert(eval("""{"$degreesToRadians": 180}""") == 3.141592653589793)
  }

  test("$let and expression objects and $literal") {
    assert(eval("""{"$let": {"vars": {"t": {"$add": ["$a", 1]}},
                   "in": {"$multiply": ["$$t", 2]}}}""") == 6L)
    assert(eval("""{"f1": "$a", "f2": {"$add": ["$b", 1]}}""") match {
      case r: org.apache.spark.sql.Row => r.getLong(0) == 2L && r.getLong(1) == 4L
      case _ => false
    })
    assert(eval("""{"$literal": "$a"}""") == "$a")
  }

  test("$$ROOT via pipeline group last") {
    import spark.implicits._
    val df = Seq(("0", 1L), ("1", 2L)).toDF("_id", "test")
    val out = pipeline.run(df,
      """[{"$group": {"_id": null, "doc": {"$last": "$$ROOT"}}}]""")
    assert(out.select("doc.test").head().getLong(0) == 2L)
  }

  test("dates") {
    val df = Seq("2021-03-04 05:06:07").toDF("raw")
      .select(to_timestamp($"raw").as("ts"))
    implicit val ctx: ExprCtx = ExprCtx()
    def ev(e: String): Any =
      df.select(MongoExpr.compile(JsonMethods.parse(e)).as("r")).head().get(0)
    assert(ev("""{"$year": "$ts"}""") == 2021)
    assert(ev("""{"$month": "$ts"}""") == 3)
    assert(ev("""{"$dayOfMonth": "$ts"}""") == 4)
    assert(ev("""{"$hour": "$ts"}""") == 5)
    assert(ev("""{"$minute": "$ts"}""") == 6)
    assert(ev("""{"$second": "$ts"}""") == 7)
    assert(ev("""{"$dateToString": {"format": "%Y-%m-%d %H:%M:%S", "date": "$ts"}}""")
      == "2021-03-04 05:06:07")
    assert(ev("""{"$dateToString": {"format": "%Y-%m-%dT%H:%M:%S", "date": "$ts"}}""")
      == "2021-03-04T05:06:07") // literal letters must not be pattern fields
    assert(ev("""{"$dateFromString": {"dateString": "2021-03-04"}}""")
      .toString.startsWith("2021-03-04"))
    assert(ev("""{"$dateAdd": {"startDate": "$ts", "unit": "day", "amount": 2}}""")
      .toString.startsWith("2021-03-06"))
    assert(ev("""{"$dateDiff": {"startDate": "$ts",
                  "endDate": {"$dateAdd": {"startDate": "$ts", "unit": "hour",
                                           "amount": 48}}, "unit": "day"}}""") == 2L)
    assert(ev("""{"$dateSubtract": {"startDate": "$ts", "unit": "day",
                                    "amount": 3}}""")
      .toString.startsWith("2021-03-01"))
  }

  test("$regexFindAll returns Mongo's full {match, idx, captures} documents") {
    val out = eval("""{"$regexFindAll": {"input": "$s", "regex": "[A-Z]"}}""")
      .asInstanceOf[scala.collection.Seq[org.apache.spark.sql.Row]]
    assert(out.map(r => (r.getString(0), r.getInt(1))) == Seq(("H", 0), ("W", 6)))
    assert(out.forall(_.getSeq[String](2).isEmpty))
    // case-insensitive options flag reaches the matcher
    val ci = eval("""{"$regexFindAll": {"input": "$s", "regex": "^h",
      "options": "i"}}""").asInstanceOf[scala.collection.Seq[org.apache.spark.sql.Row]]
    assert(ci.map(_.getString(0)) == Seq("H"))
    // non-participating capture groups are null (not ""), like Mongo
    val caps = eval("""{"$regexFind": {"input": "$s", "regex": "(H)|(Q)"}}""")
      .asInstanceOf[org.apache.spark.sql.Row]
    assert(caps.getSeq[String](2) == Seq("H", null))
  }

  test("inverse hyperbolics, bytes length, bitwise, maxN/minN") {
    assert(eval("""{"$asinh": 0}""") == 0.0)
    assert(eval("""{"$acosh": 1}""") == 0.0)
    assert(eval("""{"$atanh": 0}""") == 0.0)
    assert(eval("""{"$strLenBytes": "$s"}""") == 11)
    assert(eval("""{"$bitAnd": [6, 3]}""") == 2L)
    assert(eval("""{"$bitOr": [6, 3, 8]}""") == 15L)
    assert(eval("""{"$bitXor": [6, 3]}""") == 5L)
    assert(eval("""{"$bitNot": 0}""") == -1L)
    assert(eval("""{"$maxN": {"input": "$arr", "n": 2}}""") == Seq(4L, 3L))
    assert(eval("""{"$minN": {"input": "$arr", "n": 2}}""") == Seq(1L, 2L))
  }

  test("$binarySize / $bsonSize (hand-computed BSON encodings)") {
    assert(eval("""{"$binarySize": "$s"}""") == 11)
    assert(eval("""{"$binarySize": {"$concat": ["é", "$s"]}}""") == 13)
    // {k: int64}: 4 + (1 + 2 + 8) + 1
    assert(eval("""{"$bsonSize": {"k": "$a"}}""") == 16)
    // + {nm: "Hello World"}: element 1 + 3 + (4 + 11 + 1)
    assert(eval("""{"$bsonSize": {"k": "$a", "nm": "$s"}}""") == 36)
    // {xs: [1,2,3,4]}: array doc 4 + 4*(1+2+8) + 1 = 49; element 1+3+49
    assert(eval("""{"$bsonSize": {"xs": "$arr"}}""") == 58)
  }

  test("$bsonSize rejects non-string map keys at ANALYSIS time, not per-row") {
    val df = Seq(Tuple1(Map(1 -> 2L))).toDF("m")
    val err = intercept[Exception] {
      df.select(graft.functions.BsonSizeExpr.bsonSize(col("m")).as("n")).collect()
    }
    assert(err.getMessage.toLowerCase.contains("keys must be strings")
      || err.getMessage.contains("unsupported type"), err.getMessage)
    // nested non-string-key map inside a struct also fails analysis
    val df2 = Seq(Tuple1(Tuple1(Map(1 -> 2L)))).toDF("doc")
    val err2 = intercept[Exception] {
      df2.select(graft.functions.BsonSizeExpr.bsonSize(col("doc")).as("n")).collect()
    }
    assert(err2.getMessage.toLowerCase.contains("keys must be strings")
      || err2.getMessage.contains("unsupported type"), err2.getMessage)
  }

  test("ISO date parts and millisecond") {
    def ev(json: String): Any = {
      // 2021-03-04 is a Thursday, ISO week 9 of ISO year 2021
      val df = Seq(Tuple1(java.sql.Timestamp.valueOf("2021-03-04 05:06:07.123")))
        .toDF("ts")
      implicit val ctx: ExprCtx = ExprCtx()
      df.select(MongoExpr.compile(JsonMethods.parse(json)).as("r")).head().get(0)
    }
    assert(ev("""{"$isoWeek": "$ts"}""") == 9)
    assert(ev("""{"$isoDayOfWeek": "$ts"}""") == 4)
    assert(ev("""{"$isoWeekYear": "$ts"}""") == 2021)
    assert(ev("""{"$millisecond": "$ts"}""") == 123)
  }
}
