package graft

import graft.mongo.{ExprCtx, MongoExpr}
import org.json4s.jackson.JsonMethods

/** Property-style tests (seeded random inputs, deterministic): the compiled
  * Mongo expression/match operators agree with directly-computed expectations
  * on random documents (SURVEY §5 "ours"). Many rows per Spark job — one
  * DataFrame of random docs per property, not one job per case. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)
  private val pairs = Seq.fill(200)((rnd.between(-1000L, 1000L), rnd.between(-1000L, 1000L)))
  private val words = Seq.fill(200)(
    (rnd.alphanumeric.take(rnd.nextInt(8)).mkString,
      rnd.alphanumeric.take(rnd.nextInt(8)).mkString))

  private def evalAll(json: String): Array[Any] = {
    implicit val ctx: ExprCtx = ExprCtx()
    pairs.toDF("a", "b")
      .select(MongoExpr.compile(JsonMethods.parse(json)).as("r"))
      .collect().map(_.get(0))
  }

  test("arithmetic operators match JVM semantics on 200 random pairs") {
    assert(evalAll("""{"$add": ["$a", "$b"]}""").toSeq ==
      pairs.map { case (a, b) => a + b })
    assert(evalAll("""{"$subtract": ["$a", "$b"]}""").toSeq ==
      pairs.map { case (a, b) => a - b })
    assert(evalAll("""{"$multiply": ["$a", "$b"]}""").toSeq ==
      pairs.map { case (a, b) => a * b })
    assert(evalAll("""{"$abs": "$a"}""").toSeq == pairs.map(p => math.abs(p._1)))
    assert(evalAll("""{"$mod": ["$a", 7]}""").toSeq == pairs.map(_._1 % 7))
  }

  test("comparison operators match JVM semantics on 200 random pairs") {
    assert(evalAll("""{"$eq": ["$a", "$b"]}""").toSeq ==
      pairs.map { case (a, b) => a == b })
    assert(evalAll("""{"$lt": ["$a", "$b"]}""").toSeq ==
      pairs.map { case (a, b) => a < b })
    assert(evalAll("""{"$gte": ["$a", "$b"]}""").toSeq ==
      pairs.map { case (a, b) => a >= b })
    assert(evalAll("""{"$cmp": ["$a", "$b"]}""").toSeq ==
      pairs.map { case (a, b) => java.lang.Long.compare(a, b).sign })
  }

  test("string operators match JVM semantics on 200 random words") {
    implicit val ctx: ExprCtx = ExprCtx()
    val df = words.toDF("s", "t")
    val got = df.select(
      MongoExpr.compile(JsonMethods.parse("""{"$toUpper": "$s"}""")).as("u"),
      MongoExpr.compile(JsonMethods.parse("""{"$strLenCP": "$s"}""")).as("l"),
      MongoExpr.compile(JsonMethods.parse("""{"$concat": ["$s", "$t"]}""")).as("c"))
      .collect()
    words.zip(got).foreach { case ((s, t), r) =>
      assert(r.getString(0) == s.toUpperCase)
      assert(r.getInt(1) == s.length)
      assert(r.getString(2) == s + t)
    }
  }

  test("$match predicate agrees with in-memory filtering") {
    val vs = Seq.fill(100)(rnd.between(-100L, 100L))
    val df = vs.zipWithIndex.map { case (v, i) => (i.toString, v) }.toDF("_id", "test")
    for (pivot <- Seq(-50L, 0L, 42L)) {
      val got = pipeline
        .run(df, s"""[{"$$match": {"test": {"$$gte": $pivot}}}]""")
        .select("test").collect().map(_.getLong(0)).sorted.toSeq
      assert(got == vs.filter(_ >= pivot).sorted)
    }
  }

  test("$group sums agree with in-memory group-by") {
    val rows = Seq.fill(300)((rnd.nextInt(5).toString, rnd.between(-100L, 100L)))
    val df = rows.toDF("g", "v")
    val got = pipeline
      .run(df, """[{"$group": {"_id": "$g", "s": {"$sum": "$v"}}}]""")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    assert(got == want)
  }

  test("window frames: every (lo, hi) bound combo matches a brute-force oracle") {
    // pins the shrinking-frame -> reversed-sort rewrite: for each frame the
    // compiled $setWindowFields output must equal a direct per-row frame
    // computation over the sorted partition (ties avoided via unique seq)
    val docs = Seq.tabulate(60) { i =>
      (i.toString, "g" + (i % 3), i.toLong, rnd.between(-50, 50).toDouble)
    }
    val df = docs.toDF("_id", "g", "seq", "v")
    val byGroup: Map[String, IndexedSeq[(Long, Double)]] =
      docs.groupBy(_._2).view.mapValues(
        _.map(t => (t._3, t._4)).sortBy(_._1).toIndexedSeq).toMap
    val bounds = Seq("\"unbounded\"", "-2", "\"current\"", "1")
    for (lo <- bounds; hi <- bounds if bounds.indexOf(lo) <= bounds.indexOf(hi)) {
      val out = new Pipeline().run(df,
        s"""[{"$$setWindowFields": {
              "partitionBy": "$$g", "sortBy": {"seq": 1},
              "output": {
                "s": {"$$sum": "$$v", "window": {"documents": [$lo, $hi]}},
                "f": {"$$first": "$$v", "window": {"documents": [$lo, $hi]}},
                "l": {"$$last": "$$v", "window": {"documents": [$lo, $hi]}},
                "p": {"$$push": "$$v", "window": {"documents": [$lo, $hi]}}}}}]""")
        .select("g", "seq", "s", "f", "l", "p").collect()
        .map(r => (r.getString(0), r.getLong(1),
          (r.getDouble(2), Option(r.get(3)).map(_.asInstanceOf[Double]),
            Option(r.get(4)).map(_.asInstanceOf[Double]),
            r.getSeq[Double](5).toList))).toList
      def bound(b: String, i: Int, n: Int, isLo: Boolean): Int = b match {
        case "\"unbounded\"" => if (isLo) 0 else n - 1
        case "\"current\""   => i
        case d               => i + d.toInt
      }
      for ((g, seq, got) <- out) {
        val part = byGroup(g)
        val i = part.indexWhere(_._1 == seq)
        val from = math.max(0, bound(lo, i, part.length, isLo = true))
        val to = math.min(part.length - 1, bound(hi, i, part.length, isLo = false))
        val frame = if (from > to) IndexedSeq.empty
                    else part.slice(from, to + 1).map(_._2)
        val want = (frame.sum, frame.headOption, frame.lastOption, frame.toList)
        assert(got == want, s"frame [$lo, $hi] g=$g seq=$seq: got $got want $want")
      }
    }
  }
}
