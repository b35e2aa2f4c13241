package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc profiler for dynamic $setWindowFields ops (dev-only). */
object ScratchDyn {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val docs = s.read.parquet(s"$dir/events.parquet").select(to_json(struct(
      col("event_id").as("_id"), col("event_type").as("et"),
      when(col("user_id") % 10 === 0, lit(null))
        .otherwise(col("value")).as("v"))).as("doc"))
      .localCheckpoint()
    def time(name: String, out: String): Unit = {
      val p = s"""[{"$$setWindowFields": {
            "partitionBy": "$$et", "sortBy": {"_id": 1},
            "output": {$out}}}]"""
      val t0 = System.nanoTime()
      val n = graft.dynamic.DynPipeline.run(docs, p).count()
      println(f"DYNTIME $name rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def timeP(name: String, part: String, out: String): Unit = {
      val p = s"""[{"$$setWindowFields": {
            "partitionBy": $part, "sortBy": {"_id": 1},
            "output": {$out}}}]"""
      val t0 = System.nanoTime()
      val n = graft.dynamic.DynPipeline.run(docs, p).count()
      println(f"DYNTIME $name rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("warmup", """"rn": {"$documentNumber": {}}""")
    time("docnum", """"rn": {"$documentNumber": {}}""")
    time("slope", """"slope": {"$derivative": {"input": "$v"},
                     "window": {"documents": [-1, "current"]}}""")
    time("fill", """"fill": {"$linearFill": "$v"}""")
    timeP("fill_tiny_parts", """{"$mod": ["$_id", 997]}""",
      """"fill": {"$linearFill": "$v"}""")
    time("locf_back", """"l": {"$locf": "$v"}""")
    time("first_fwd", """"f": {"$first": "$v",
                     "window": {"documents": ["current", "unbounded"]}}""")
    time("ema", """"ema": {"$expMovingAvg": {"input": "$v", "N": 5}}""")
    s.stop()
  }
}
