package graft

import graft.operators.{AsOfJoin, Sessionize}

/** Seeded-random differential tests: the distributed as-of join and
  * sessionization agree with a brute-force in-memory reference on hundreds
  * of random keys/timestamps (incl. duplicate timestamps across sides). */
class TemporalPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(1234)

  test("AsOfJoin matches the brute-force latest-at-or-before reference") {
    // small time domain forces collisions: equal times across sides and
    // (rarely) within the right side — right is deduped to keep it defined
    val lefts = (0 until 400).map(i => (i.toLong,
      rnd.nextInt(8).toLong, rnd.nextInt(50).toLong))
    val rights0 = Seq.fill(300)((rnd.nextInt(8).toLong,
      rnd.nextInt(50).toLong, rnd.nextInt(100000) / 100.0))
    val rights = rights0.groupBy(r => (r._1, r._2)).map(_._2.max).toSeq

    val got = AsOfJoin(
      lefts.toDF("lid", "k", "t"), rights.toDF("k", "t", "v"),
      "k", "t", Seq("v"))
      .collect()
      .map(r => (r.getLong(0), Option(r.get(3)).map(_.asInstanceOf[Double])))
      .toMap

    val byKey = rights.groupBy(_._1)
    val want = lefts.map { case (lid, k, t) =>
      lid -> byKey.getOrElse(k, Seq.empty).filter(_._2 <= t)
        .sortBy(r => (r._2, r._3)).lastOption.map(_._3)
    }.toMap
    assert(got == want)
  }

  test("Sessionize matches the brute-force gap-split reference") {
    val gap = 10L
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val events = Seq.fill(600)((rnd.nextInt(6).toLong,
      rnd.nextInt(500).toLong, rnd.nextInt(10000) / 100.0))

    val df = events.map { case (u, s, v) =>
      (u, new java.sql.Timestamp(base + s * 1000), v) }
      .toDF("user_id", "ts", "value")
    val got = Sessionize(df, "user_id", "ts", "value", gapSeconds = gap)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
      .toSet

    val t0 = base / 1000
    val want = events.groupBy(_._1).toSeq.flatMap { case (u, evs) =>
      val sorted = evs.map(e => (t0 + e._2, e._3)).sortBy(_._1)
      // split where the gap exceeds `gap`
      val sessions = sorted.tail.foldLeft(Vector(Vector(sorted.head))) {
        case (acc, e) =>
          if (e._1 - acc.last.last._1 > gap) acc :+ Vector(e)
          else acc.init :+ (acc.last :+ e)
      }
      sessions.zipWithIndex.map { case (ss, i) =>
        val sum = BigDecimal(ss.map(e => BigDecimal(e._2)).sum.toDouble)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        (u, (i + 1).toLong, ss.head._1, ss.last._1, ss.size.toLong, sum)
      }
    }.toSet
    assert(got == want)
  }
}
