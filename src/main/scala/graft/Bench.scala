package graft

import org.apache.spark.sql.SparkSession
import java.util.concurrent.Executors
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Benchmark main: runs every SparkEntry query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Queries are independent, so they run concurrently
  * (FAIR pool): total = wall-clock of the whole set, which overlaps each
  * query's one-time codegen/planning with the others' execution — the same
  * way a real cluster pipelines independent jobs. Per-query numbers are
  * wall times inside the concurrent run.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // cpus/2 workers: per-query wall time is dominated by one-time Janino
    // codegen + planning (driver-side, parallel across queries), so more
    // in-flight queries overlap compilation with other queries' execution
    val pool = Executors.newFixedThreadPool(math.max(4, cpus.toInt / 2))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val t0 = System.nanoTime()
    val futures = SparkEntry.queries.toSeq.map { case (name, fn) =>
      Future {
        val q0 = System.nanoTime()
        // a crashed query must NOT read as a fast success: -1 in the
        // artifact, never the time-to-exception
        try { fn(spark, sfDir).count(); name -> (System.nanoTime() - q0) / 1e9 }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          name -> -1d
        }
      }
    }
    val results = Await.result(Future.sequence(futures), Duration.Inf).toMap
    val total = (System.nanoTime() - t0) / 1e9
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    // Per-query walls above are CONTENTION artifacts (the whole set shares
    // the executor): re-time the slowest 8 SEQUENTIALLY (warm plans) so the
    // artifact carries clean per-query numbers for exactly the queries
    // someone would investigate.
    val poleSeq = results.toSeq.sortBy(-_._2).take(8).map { case (name, _) =>
      val q0 = System.nanoTime()
      try { SparkEntry.queries(name)(spark, sfDir).count()
        name -> (System.nanoTime() - q0) / 1e9 }
      catch { case e: Throwable =>
        System.err.println(s"[bench] poles_seq $name failed: ${e.getMessage}")
        name -> -1d
      }
    }
    val ps = poleSeq.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    println(s"""{"metric":"poles_seq","unit":"sec","queries":$ps,"sf":"$sfDir"}""")
    // the driver tail-captures the END of stdout and the first line leads
    // with the total, so a long per-query map can push it off the capture —
    // repeat a short total-only line LAST so the total always survives.
    // sec_per_query normalizes across rounds: the total drifts upward with
    // query-count growth (27.6 s/142 → 43.8 s/213) while per-query wall is
    // flat — compare THIS number round-over-round, not the raw total.
    val secPerQuery = if (results.nonEmpty) total / results.size else 0d
    println(s"""{"metric":"total_sec","value":$total,"unit":"sec","nQueries":${results.size},"sec_per_query":$secPerQuery,"sf":"$sfDir"}""")
    pool.shutdown()
    spark.stop()
  }
}
