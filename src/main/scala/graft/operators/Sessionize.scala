package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization over an event stream: consecutive events of the
  * same user belong to one session while the gap between them is at most
  * `gapSeconds`; a larger gap starts a new session.
  *
  * Distributed shape: ONE shuffle on the user column (the same hash
  * partitioning a 1000-executor cluster would use), then a per-user sort
  * inside the partition — the classic lag/flag/running-sum formulation, all
  * window functions over the same (partition, order), so Catalyst plans a
  * single Window exec. Nothing is driver-side and per-user state is bounded
  * by that user's events.
  *
  * Tie safety: rows with identical timestamps get engine-dependent `lag`
  * neighbours, but exactly one of a tie group can flag a new session and the
  * running sum's default RANGE frame gives every tied row the same session
  * id, so the grouped output is deterministic.
  */
object Sessionize {

  def apply(events: DataFrame, userCol: String, tsCol: String,
      valueCol: String, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(tsCol)
    val sec = unix_timestamp(col(tsCol))
    val prevSec = lag(sec, 1).over(w)
    val newSession = when(prevSec.isNull || sec - prevSec > gapSeconds, 1L)
      .otherwise(0L)
    events
      .withColumn("__sec", sec)
      .withColumn("__new", newSession)
      .withColumn("session_seq", sum(col("__new")).over(w))
      .groupBy(col(userCol), col("session_seq"))
      .agg(
        min(col("__sec")).as("start_s"),
        max(col("__sec")).as("end_s"),
        count(lit(1)).as("n_events"),
        // inputs have 2 decimals, so 4 digits is exact-decimal-width safe
        round(sum(col(valueCol)), 4).as("sum_value"))
  }
}
