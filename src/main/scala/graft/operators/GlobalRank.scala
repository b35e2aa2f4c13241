package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed global rank — the scale-safe replacement for
  * `rank().over(Window.orderBy(k))`, which plans an `Exchange
  * SinglePartition` and serializes the whole input through ONE reducer.
  *
  * Shape: range-repartition on the key (ties co-locate, the ordering is
  * total across partitions) + an in-partition sort, localCheckpoint so the
  * sort runs once, one cheap job for per-partition row counts, then a
  * single per-partition pass stamping `rank = partitionOffset + localRank`
  * with the offsets broadcast. Ranks match SQL `rank()` exactly (ties share
  * the minimum rank) because equal keys can never straddle a range
  * boundary. Used by `$bucketAuto` in both engines.
  */
object GlobalRank {

  /** Returns `df` plus `rkName` = rank() over (ORDER BY `key` ASC NULLS
    * FIRST) and `nName` = total row count, without a single-partition
    * exchange. The result is materialized (localCheckpoint). */
  def withRank(df: DataFrame, key: String, rkName: String, nName: String): DataFrame = {
    val spark = df.sparkSession
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // Per-partition row counts ride the checkpoint job as an Observation
    // (r17 — was a separate groupBy+collect job; the per-job fixed cost is
    // the dominant term for every metadata-scale caller): one conditional
    // sum per partition, `parts` longs total. Falls back to the separate
    // count job when `parts` is large enough that `parts` aggregate
    // expressions would bloat codegen (the observe is a win only in the
    // fixed-cost regime anyway).
    val fuseCounts = parts <= 128
    val obs = org.apache.spark.sql.Observation()
    val sorted0 = df
      .repartitionByRange(parts, col(key).asc)
      .sortWithinPartitions(col(key).asc)
      .withColumn("__grank_pid", spark_partition_id())
    val sorted = (if (fuseCounts)
        { val aggs = (0 until parts).map(p =>
            sum(when(col("__grank_pid") === p, 1L).otherwise(0L))
              .as(s"c$p"))
          sorted0.observe(obs, aggs.head, aggs.tail: _*) }
      else sorted0)
      .localCheckpoint()
    val pidIdx = sorted.schema.fieldIndex("__grank_pid")
    val keyIdx = sorted.schema.fieldIndex(key)
    def countsJob(): Map[Int, Long] =
      sorted.groupBy(col("__grank_pid")).count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val counts: Map[Int, Long] =
      if (fuseCounts)
        // bounded wait; fallback = the pre-fusion count job (ADVICE r16)
        Obs.tryMap(obs).map(row =>
          (0 until parts).map(p => p -> row(s"c$p").asInstanceOf[Long])
            .filter(_._2 > 0).toMap)
          .getOrElse(countsJob())
      else countsJob()
    val total = counts.values.sum
    val offsets: Map[Int, Long] = {
      var acc = 0L
      (0 until parts).map { pid =>
        val o = pid -> acc; acc += counts.getOrElse(pid, 0L); o
      }.toMap
    }
    val bcOffsets = spark.sparkContext.broadcast(offsets)
    val outSchema = StructType(
      sorted.schema.fields.filterNot(_.name == "__grank_pid") ++ Seq(
        StructField(rkName, LongType, nullable = false),
        StructField(nName, LongType, nullable = false)))
    def sameKey(a: Any, b: Any): Boolean = (a, b) match {
      case (x: Array[Byte], y: Array[Byte]) => java.util.Arrays.equals(x, y)
      case _                                => a == b
    }
    sorted.mapPartitions { it =>
      var pos = 0L
      var rank = 0L
      var offset = 0L
      var prev: Any = null
      it.map { r =>
        if (pos == 0L) offset = bcOffsets.value(r.getInt(pidIdx))
        pos += 1
        val k = r.get(keyIdx)
        if (pos == 1L || !sameKey(k, prev)) rank = offset + pos
        prev = k
        Row.fromSeq(r.toSeq.patch(pidIdx, Nil, 1) :+ rank :+ total)
      }
    }(Encoders.row(outSchema))
  }
}
