package graft.operators

import org.apache.spark.sql.Observation

import scala.concurrent.Await
import scala.concurrent.duration._

/** Bounded wait on an [[Observation]] whose action has already completed
  * (ADVICE r16): the fused-job designs (ckptCompact, ckptWithParts, the
  * GlobalRank/prCurve partition stats, the dedup pair-budget guard) rest on
  * eager `localCheckpoint` delivering CollectMetrics — a probed but
  * undocumented guarantee. `Observation.get` waits forever; if the metrics
  * ever fail to arrive, the caller must fall back to the explicit job it
  * fused away instead of hanging the driver. */
object Obs {
  val DefaultTimeoutSec = 300L

  /** The observed row as a by-name map, or None after `timeoutSec` —
    * callers supply the pre-fusion job via `.getOrElse`. */
  def tryMap(obs: Observation,
      timeoutSec: Long = DefaultTimeoutSec): Option[Map[String, Any]] =
    try {
      val row = Await.result(obs.future, timeoutSec.seconds)
      Some(row.schema.fieldNames.zip(row.toSeq).toMap)
    } catch { case _: java.util.concurrent.TimeoutException => None }
}
