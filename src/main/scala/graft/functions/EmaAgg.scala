package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.graftops.ColumnBridge
import org.apache.spark.sql.types._

/** Exponential moving average (`$expMovingAvg`) as an incremental window
  * aggregate: EMA := α·x + (1-α)·EMA, one fused multiply-add per row.
  *
  * Why custom (SURVEY §4 "custom Catalyst inventory"): the composable
  * alternative is `aggregate(collect_list(x) over growing-frame, fold)`,
  * which materializes the cumulative history for EVERY row — O(frame²)
  * time and memory churn per partition. Spark's growing-frame window
  * processor (`UnboundedPrecedingWindowFunctionFrame`) feeds a
  * DeclarativeAggregate one `update` per row, so this runs in O(frame)
  * with a single double of state.
  *
  * Null inputs keep the previous EMA (Mongo's carry-forward rule for
  * non-numeric values); the value before the first numeric input is null.
  * Merging partial EMAs is mathematically undefined — sorted window frames
  * never merge buffers; a grouped-aggregation misuse surfaces as null, and
  * the only call site ([[graft.Stages]] `$expMovingAvg`) is window-only.
  */
case class EmaAgg(child: Expression, alpha: Double)
    extends DeclarativeAggregate {

  override def children: Seq[Expression] = child :: Nil
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "exp_moving_avg"

  private lazy val ema = AttributeReference("ema", DoubleType)()
  private def x: Expression = Cast(child, DoubleType)

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(ema)
  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(null, DoubleType))
  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(IsNull(x), ema,
      If(IsNull(ema), x,
        Add(Multiply(x, Literal(alpha)),
          Multiply(ema, Literal(1d - alpha))))))
  override lazy val mergeExpressions: Seq[Expression] =
    Seq(Literal(null, DoubleType))
  override lazy val evaluateExpression: Expression = ema
}

object EmaAgg {
  /** `ema(x, α)` — use over a sorted window with a growing frame. */
  def ema(c: Column, alpha: Double): Column =
    ColumnBridge.column(
      EmaAgg(ColumnBridge.expression(c), alpha).toAggregateExpression())
}
