package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private val trades = Seq(
    (100L, 1L, 10L), // before any quote -> null
    (101L, 1L, 20L), // exactly at quote t=20 -> inclusive
    (102L, 1L, 35L), // between quotes 20 and 40 -> 20's payload
    (103L, 2L, 50L)) // other key, quote at 45
    .toDF("trade_id", "k", "t")
  private val quotes = Seq(
    (1L, 20L, 2.0), (1L, 40L, 4.0), (2L, 45L, 4.5), (2L, 60L, 6.0))
    .toDF("k", "t", "px")

  test("backward as-of join picks the latest quote at or before each trade") {
    val got = AsOfJoin(trades, quotes, "k", "t", Seq("px"))
      .collect()
      .map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Double]))
      .toMap
    assert(got == Map(
      100L -> None, 101L -> Some(2.0), 102L -> Some(2.0), 103L -> Some(4.5)))
  }

  test("as-of join carries every left column and prefixes the payload") {
    val out = AsOfJoin(trades, quotes, "k", "t", Seq("px"), prefix = "q_")
    assert(out.columns.toSeq == Seq("trade_id", "k", "t", "q_px"))
  }

  test("as-of join plans one key shuffle + one window, no nested loop") {
    val p = AsOfJoin(trades, quotes, "k", "t", Seq("px"))
      .queryExecution.executedPlan.toString
    assert(p.contains("Exchange hashpartitioning(__k"), p)
    assert(!p.contains("NestedLoop") && !p.contains("CartesianProduct"), p)
    // union feeds ONE window: both sides share the exchange/sort
    assert("Window ".r.findAllIn(p).size == 1, p)
  }
}
