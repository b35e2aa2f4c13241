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
  /** 1-minute load average from /proc/loadavg (-1 when unreadable). */
  private def load1(): Double =
    try scala.io.Source.fromFile("/proc/loadavg").mkString
      .split("\\s+")(0).toDouble
    catch { case _: Throwable => -1d }

  /** (stealTicks, totalTicks) from /proc/stat's aggregate cpu line —
    * hypervisor STEAL is the one load source neither load1 nor otherJvms
    * can see (r16: same-tree quiet-stamped runs spread 53.8-90.6 s while
    * /proc/stat showed heavy steal), so the artifact embeds the steal
    * fraction measured across its own run. (-1, -1) when unreadable. */
  private def stealTicks(): (Long, Long) =
    try {
      val f = scala.io.Source.fromFile("/proc/stat").getLines()
        .find(_.startsWith("cpu ")).get.trim.split("\\s+").drop(1)
        .map(_.toLong)
      // total = user..steal (first 8 fields) only: guest/guest_nice are
      // already folded into user/nice by the kernel, so summing them too
      // double-counts and understates steal_pct (r16 advice)
      (if (f.length > 7) f(7) else 0L, f.take(8).sum)
    } catch { case _: Throwable => (-1L, -1L) }

  /** Live JVMs on the box OTHER than this one and its ancestors —
    * concurrent sbt/Spark JVMs are the proven 35-40% cross-round drift
    * source (r14 A/B). Ancestors are excluded (r15 advice): the sbt
    * wrapper that launched Bench itself is a java process, so without the
    * exclusion the field reads ≥1 even on an otherwise-quiet box. */
  private def otherJvms(): Long =
    try {
      val self = ProcessHandle.current().pid()
      val anc = scala.collection.mutable.Set[Long]()
      var p = ProcessHandle.current().parent()
      while (p.isPresent) { anc += p.get.pid(); p = p.get.parent() }
      ProcessHandle.allProcesses().filter { h =>
        h.pid() != self && !anc.contains(h.pid()) &&
          h.info().command().map[Boolean](_.endsWith("java")).orElse(false)
      }.count()
    } catch { case _: Throwable => -1L }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Self-evidencing artifact (r14 verdict #1): every cross-round bench
    // comparison so far began with an archaeology session because host load
    // dominates the numbers (94.3 s loaded vs 53.9 s idle, same code, same
    // hour). Embed the evidence in the JSON line itself and annotate loudly
    // when the box is not quiet — the artifact then carries its own
    // comparability verdict.
    // Quiet BY CONSTRUCTION (r15 verdict #2): the r15 artifact embedded
    // its load evidence and promptly confessed to being captured on a
    // loaded box — self-labeling works, but the driver snapshots the
    // artifact and no human reads a stderr warning there. So don't just
    // label: WAIT. When the box is loud (load1 > 1.5 — typically the
    // previous correctness run's load still decaying — or a foreign JVM
    // alive), sleep-poll until it goes quiet or the wait budget expires,
    // THEN measure. GRAFT_BENCH_REQUIRE_QUIET=0 bypasses the wait;
    // GRAFT_BENCH_QUIET_WAIT_SEC bounds it (default 300 s — 1-min load
    // decays e^(-t/60), so even a fully loaded 32-core box reads < 1.5
    // within ~3 minutes of going idle; a longer stall would risk any
    // caller-side timeout for little gain).
    // the WAIT threshold is stricter than the 1.5 the stamp documents:
    // r16 measured 53.8 s (start load1 0.65) vs 86.7 s (start load1 1.41)
    // on the same tree — residual decaying load inside the old gate still
    // dominated every optimization delta. Waiting to 0.8 costs ~40 extra
    // seconds of decay and makes runs actually comparable; the stamp keeps
    // its documented ≤ 1.5 semantics.
    def quietNow(): (Boolean, Double, Long) = {
      val l = load1(); val j = otherJvms()
      (l >= 0 && l <= 0.8 && j == 0, l, j)
    }
    // -1 means "metric unreadable" (no /proc/loadavg, ProcessHandle denied)
    // — a box that can't be measured must not wait the whole budget for a
    // quiet it can never observe; it starts immediately and stamps
    // quiet=false, the pre-r16 behavior
    val measurable = load1() >= 0 && otherJvms() >= 0
    if (measurable &&
        sys.env.getOrElse("GRAFT_BENCH_REQUIRE_QUIET", "1") != "0") {
      val budgetSec =
        sys.env.getOrElse("GRAFT_BENCH_QUIET_WAIT_SEC", "300").toInt
      val deadline = System.nanoTime() + budgetSec * 1000000000L
      var st = quietNow()
      while (!st._1 && System.nanoTime() < deadline) {
        System.err.println(s"[bench] box not quiet " +
          s"(load1=${st._2}, other_jvms=${st._3}) — waiting for it to settle")
        Thread.sleep(10000)
        st = quietNow()
      }
    }
    val startLoad1 = load1()
    val startJvms = otherJvms()
    val startSteal = stealTicks()
    // BOTH components gate the stamp (r15 advice: momentarily-idle foreign
    // JVMs passed a load-only predicate, then woke up mid-measure)
    val quiet = startLoad1 >= 0 && startLoad1 <= 1.5 && startJvms == 0
    if (!quiet) System.err.println(
      s"[bench] WARNING: box not quiet (load1=$startLoad1, other_jvms=$startJvms)" +
        " — numbers below are NOT comparable across rounds")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // Scheduler mode: FAIR. The r17 A/B at 32 cores, quiet, same tree
      // (OPTIMIZATION_r17.md) measured FIFO at 83.1s vs FAIR 62.4s — FIFO
      // head-of-line-blocks every other chain's tiny jobs behind long
      // stages, so guide §2.6's back-fill intuition loses here where 6
      // heterogeneous query chains share the pool. Env knob kept for probes.
      .config("spark.scheduler.mode",
        sys.env.getOrElse("GRAFT_BENCH_SCHED", "FAIR"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // In-flight query count (guide §2.6: "2-3 jobs in flight is plenty —
    // enough to fill the tail, not so many that they fight"). r16 ran
    // cpus/2 (16 at 32 cores) and the driver's 32-core protocol run
    // regressed to 173.8 s while the SAME tree ran 88.6 s at 8 cores
    // (pool 4): per-query isolated walls are sub-second, so the wall is
    // almost pure scheduler/memo-blocking contention, and it grows with
    // the pool, not with the work. r17 A/B at 32 cores, quiet, same tree:
    // pool 16 = 92.7 s, pool 6 = see OPTIMIZATION_r17.md — the pool is now
    // a small constant (6) independent of cores, env-overridable for
    // probes. More cores then help the queries that can use them instead
    // of admitting more rivals.
    val poolN = sys.env.getOrElse("GRAFT_BENCH_POOL", "6").toInt
    val pool = Executors.newFixedThreadPool(poolN)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    // Submission order stays the queries map's own iteration order — r16
    // A/B'd longest-chain-first (classic LPT) against it at equal start
    // load and LPT LOST (71.5 s vs 53.8 s): the long chains are sequences
    // of tiny jobs that starve each OTHER when front-loaded together, while
    // the map order interleaves them with the short-query tail.
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
    val (stealEnd, totEnd) = stealTicks()
    val stealPct =
      if (startSteal._1 < 0 || stealEnd < 0 || totEnd <= startSteal._2) -1d
      else 100d * (stealEnd - startSteal._1) / (totEnd - startSteal._2)
    val loadEvidence =
      s""""load1":$startLoad1,"other_jvms":$startJvms,"load1_end":${load1()},""" +
        s""""steal_pct":${math.round(stealPct * 100) / 100d},"quiet":$quiet"""
    println(s"""{"metric":"total","value":$total,"unit":"sec",$loadEvidence,"queries":$qs,"sf":"$sfDir"}""")
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
    // poles_seq rides under its OWN key: r15/r16 printed it as a second
    // "queries" line AFTER the full map, and the driver's parser takes the
    // LAST queries-bearing line — two rounds of per-query comparison went
    // blind on an 8-entry shadow map (PERF_r16 n_common=0). The final line
    // below is now the only "queries" line that follows the full map.
    println(s"""{"metric":"poles_seq","unit":"sec","poles_seq":$ps,"sf":"$sfDir"}""")
    // FINAL line = the driver's line: total + the FULL per-query map
    // (restores the per-query bench contract, r16 verdict #2).
    // sec_per_query normalizes across rounds: the total drifts upward with
    // query-count growth (27.6 s/142 → 43.8 s/213) while per-query wall is
    // flat — compare THIS number round-over-round, not the raw total.
    val secPerQuery = if (results.nonEmpty) total / results.size else 0d
    println(s"""{"metric":"total_sec","value":$total,"unit":"sec","nQueries":${results.size},"sec_per_query":$secPerQuery,$loadEvidence,"queries":$qs,"sf":"$sfDir"}""")
    pool.shutdown()
    spark.stop()
  }
}
