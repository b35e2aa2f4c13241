package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: every left row picks up the payload of the most
  * recent right row with the same key and `right.time <= left.time`
  * (inclusive) — the quotes-to-trades temporal join Spark has no built-in
  * for.
  *
  * Implementation is the union-plus-window formulation, NOT a range join:
  * tag right rows side=0 and left rows side=1, union them, and run ONE
  * window per key ordered by (time, side) where `last(payload, ignoreNulls)`
  * carries the latest right payload forward into each left row. Cost is a
  * single hash shuffle of both inputs on the key plus a per-key sort —
  * exactly what a 1000-executor cluster wants (no broadcast requirement on
  * either side, no O(n·m) nested loop, skew bounded per key). Side 0 sorts
  * before side 1 so a right row AT the left row's timestamp is visible,
  * matching ASOF `>=` semantics.
  *
  * Right rows must be unique per (key, time); if not, which payload wins
  * among equal timestamps is tie-order-dependent — pre-aggregate the right
  * side (e.g. `max_by`) when that matters.
  */
object AsOfJoin {

  def apply(left: DataFrame, right: DataFrame, keyCol: String,
      timeCol: String, payloadCols: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    val payloadT = right.select(struct(payloadCols.map(col): _*)).schema.head.dataType
    val rowT = left.select(struct(left.columns.map(col): _*)).schema.head.dataType
    val l = left.select(col(keyCol).as("__k"), col(timeCol).as("__t"),
      lit(1).as("__side"), lit(null).cast(payloadT).as("__p"),
      struct(left.columns.map(col): _*).as("__row"))
    val r = right.select(col(keyCol).as("__k"), col(timeCol).as("__t"),
      lit(0).as("__side"), struct(payloadCols.map(col): _*).as("__p"),
      lit(null).cast(rowT).as("__row"))
    val w = Window.partitionBy("__k").orderBy("__t", "__side")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn("__asof", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val outCols = left.columns.map(c => col(s"__row.$c").as(c)) ++
      payloadCols.map(c => col(s"__asof.$c").as(s"$prefix$c"))
    carried.select(outCols: _*)
  }
}
