package graft
import org.apache.spark.sql.SparkSession

/** Dev utility (test scope, not shipped): run/inspect a single SparkEntry
  * query.
  *
  *  - `Test/runMain graft.Scratch entry`                      — flagship smoke
  *  - `Test/runMain graft.Scratch time <name> [sfDir] [reps]` — isolated wall time
  *  - `Test/runMain graft.Scratch explain <name> [sfDir]`     — formatted physical plan
  *  - `Test/runMain graft.Scratch <name> [sfDir]`             — show rows
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (args(0) == "entry") { val d = SparkEntry.entry(spark); d.show(10, false); println(s"entry rows=${d.count()}") }
    else if (args(0) == "time") { // time <name> [sfDir] [reps]: isolated wall time per run
      val q = SparkEntry.queries(args(1))
      val dir = if (args.length > 2) args(2) else "/root/testdata/sf0.001"
      val reps = if (args.length > 3) args(3).toInt else 2
      for (i <- 1 to reps) {
        val t0 = System.nanoTime()
        val n = q(spark, dir).count()
        println(f"TIME ${args(1)} run$i rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    else if (args(0) == "timeseq") {
      // timeseq <name,csv|ALL> <sfDir> [reps]: sequential isolated walls for
      // many queries in ONE warm JVM (run1 = cold plan, run2+ = warm)
      val dir = args(2)
      val reps = if (args.length > 3) args(3).toInt else 2
      val names =
        if (args(1) == "ALL") SparkEntry.queries.keys.toSeq.sorted
        else args(1).split(",").toSeq
      for (name <- names; i <- 1 to reps) {
        val t0 = System.nanoTime()
        try {
          val n = SparkEntry.queries(name)(spark, dir).count()
          println(f"TIMESEQ $name run$i rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
        } catch { case e: Throwable =>
          println(s"TIMESEQ $name run$i FAILED ${e.getMessage}")
        }
      }
    }
    else if (args(0) == "skewprobe") {
      // skewprobe <name,csv> <dirA> <dirB> [reps]: same queries on a
      // uniform vs a zipf-skewed replica of equal volume (r15 verdict #1)
      val names = args(1).split(",").toSeq
      val dirs = Seq(args(2), args(3))
      val reps = if (args.length > 4) args(4).toInt else 2
      for (name <- names; dir <- dirs; i <- 1 to reps) {
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, dir).count()
        println(f"SKEWPROBE $name $dir run$i rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    else if (args(0) == "skewjoin") {
      // skewjoin <dir> [reps]: force the orders⋈customer join onto the
      // shuffle path (broadcast off) so AQE's skew-split has something to
      // do, then print whether it fired (`skew=true` on the SMJ node)
      import org.apache.spark.sql.functions._
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val dir = args(1)
      val reps = if (args.length > 2) args(2).toInt else 2
      // optional 4th arg: AQE skew threshold (default 256MB targets
      // production partitions; the probe's hot partition is ~60MB, so
      // pass e.g. 8m to see the split fire at replica scale)
      if (args.length > 3) {
        spark.conf.set(
          "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", args(3))
        spark.conf.set(
          "spark.sql.adaptive.advisoryPartitionSizeInBytes", args(3))
        // the SMJ here is mid-plan (an agg follows), so vanilla AQE skips
        // the split to avoid the extra shuffle — force it so the probe
        // demonstrates the mechanism the way a root-stage join gets it
        spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
        // the replica is ONE parquet file = one mapper, and AQE splits a
        // skewed reducer partition by MAPPER ranges — give the scan
        // several mappers or there is nothing to split (probe find, r15)
        spark.conf.set("spark.sql.files.maxPartitionBytes", "4m")
      }
      println("adaptive.enabled=" +
        spark.conf.get("spark.sql.adaptive.enabled") +
        " skewJoin.enabled=" +
        spark.conf.get("spark.sql.adaptive.skewJoin.enabled"))
      for (i <- 1 to reps) {
        val o = spark.read.parquet(s"$dir/orders.parquet")
        val c = spark.read.parquet(s"$dir/customer.parquet")
        // ROOT-level join (no agg above): the canonical skew-split shape
        val j = o.join(c, o("o_custkey") === c("c_custkey"))
          .select(o("o_orderkey"), o("o_totalprice"), c("c_mktsegment"))
        val t0 = System.nanoTime()
        // collect() executes THIS queryExecution's AdaptiveSparkPlanExec
        // instance (count()/rdd/write each wrap a NEW execution, leaving
        // j's own AQE state unfinalized — probe find, r15)
        val n = j.collect().length
        val plan = j.queryExecution.executedPlan.toString
        val skewFired = plan.contains("skew=true")
        println(f"SKEWJOIN $dir run$i rows=$n skewSplit=$skewFired ${(System.nanoTime() - t0) / 1e9}%.2f s")
        if (sys.env.contains("SKEWJOIN_PLAN"))
          println(plan.split("\n").filter(l => l.contains("SortMergeJoin")
            || l.contains("AQEShuffleRead") || l.contains("skew")).mkString("\n"))
        sys.env.get("SKEWJOIN_PLAN_FILE").foreach { f =>
          java.nio.file.Files.write(java.nio.file.Paths.get(f),
            plan.getBytes("UTF-8"))
        }
      }
    }
    else if (args(0) == "streamskew") {
      // streamskew [nBatches] [rowsPerBatch]: the STREAMING twin of the r15
      // zipf probe (r15 verdict #4) — drive the stateful $deduplicate →
      // $group core through nBatches micro-batches of identical volume with
      // a uniform vs a zipf-skewed key feed (one group key = 50% of rows;
      // redeliveries concentrated on ONE hot _id), under BOTH state-store
      // providers, and print per-batch trigger latency + state size so
      // BASELINE.md can carry the uniform-vs-skewed table. Flat-vs-batch#
      // and flat-vs-skew are the claims under test: streaming aggregation
      // partial-aggregates before the state update, so a 50% hot key folds
      // to one row per partition per batch, and dedup state is keyed by
      // unique _ids either way.
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import org.apache.spark.sql.streaming.Trigger
      import graft.streaming.StreamingPipeline
      import scala.jdk.CollectionConverters._
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val nBatches = if (args.length > 1) args(1).toInt else 30
      val rows = if (args.length > 2) args(2).toInt else 20000
      val providers = Seq(
        "hdfs" -> "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
        "rocksdb" -> StreamingPipeline.RocksDBProvider)
      for ((pname, pclass) <- providers; skewed <- Seq(false, true)) {
        val leg = if (skewed) "zipf" else "uniform"
        val rnd = new scala.util.Random(20260816L)
        val ckpt = java.nio.file.Files
          .createTempDirectory(s"graft_sskew_$leg").toString
        StreamingPipeline.withStateStoreProvider(spark, pclass) {
          val input = MemoryStream[(String, String, Long)]
          // the collect must CONSUME the batch (update-mode output = changed
          // keys, ≤ ~1k rows/batch here); an empty body fails the query
          val q = new StreamingPipeline(new Pipeline()).start(
            input.toDF().toDF("_id", "g", "v"), SoakChild.coreJson,
            df => { df.collect(); () }, trigger = Trigger.ProcessingTime(0),
            checkpoint = Some(ckpt))
          var k = 0L
          // redeliveries must be VERBATIM copies of earlier docs (the
          // soak's rule): a same-_id row with a different payload makes
          // $deduplicate's keep nondeterministic when both land in one
          // micro-batch, polluting the state-row comparison
          val sent =
            scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
          val walls = scala.collection.mutable.ArrayBuffer.empty[Double]
          try {
            for (b <- 1 to nBatches) {
              val batch = (0 until rows).map { _ =>
                // 20% redeliveries in BOTH legs (same volume, same fresh-id
                // state growth); zipf redelivers ONE viral _id, uniform a
                // random earlier one
                if (sent.nonEmpty && rnd.nextInt(5) == 0) {
                  if (skewed) sent(0)
                  else sent((math.abs(rnd.nextLong()) % sent.size).toInt)
                } else {
                  k += 1
                  val g = if (skewed) {
                    if (rnd.nextBoolean()) "g0"
                    else s"g${1 + rnd.nextInt(1000)}"
                  } else s"g${rnd.nextInt(1000)}"
                  val d = (s"m$k", g, (k % 7) + 1L); sent += d; d
                }
              }
              input.addData(batch: _*)
              val t0 = System.nanoTime()
              q.processAllAvailable()
              val wall = (System.nanoTime() - t0) / 1e9
              walls += wall
              val p = q.lastProgress
              val (srows, sbytes) =
                if (p == null) (-1L, -1L)
                else (p.stateOperators.map(_.numRowsTotal).sum,
                  p.stateOperators.map(_.memoryUsedBytes).sum)
              if (b % 5 == 0 || b == 1) println(
                f"STREAMSKEW $leg $pname batch=$b rows=$rows wall=$wall%.3f" +
                  f" stateRows=$srows stateBytes=$sbytes")
            }
          } finally q.stop()
          val h = math.max(1, walls.size / 2)
          println(f"STREAMSKEW-SUMMARY $leg $pname batches=$nBatches " +
            f"firstHalfAvg=${walls.take(h).sum / h}%.3f " +
            f"secondHalfAvg=${walls.drop(h).sum / math.max(1, walls.size - h)}%.3f " +
            f"totalRows=${nBatches.toLong * rows}")
        }
      }
    }
    else if (args(0) == "upsertprobe") {
      // upsertprobe <sfDir> [newN]: graphUpsert's amortization claim with
      // numbers — wall of a FULL graphSave rebuild on the corpus vs a
      // graphUpsert of newN synthetic arrivals (perturbed copies of corpus
      // vectors, ids offset by 10M), plus a serve sanity on the grown
      // index. The r15 verdict's shape: a daily +0.1-1% increment must not
      // repay the O(n·k·iters) descent.
      import org.apache.spark.sql.functions._
      val dir = args(1)
      val newN = if (args.length > 2) args(2).toInt else 500
      val nParts = if (args.length > 3) args(3).toInt else 32
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val n = emb.count()
      val idx = java.nio.file.Files
        .createTempDirectory("graft_upsertprobe").toString
      var t0 = System.nanoTime()
      graft.llm.VectorOps.graphSave(emb, "vec_id", "embedding", idx,
        k = 5, iters = 2, maxRev = 10, sample = 8, nParts = nParts)
      println(f"UPSERTPROBE build n=$n nParts=$nParts " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s")
      // id offset far above any replica id space (build_sf1 copies offset
      // ids by millions per copy — a 1e7 offset collided with copy 20's
      // range and the collision guard correctly refused)
      val arrivals = emb.limit(newN)
        .select((col("vec_id") + 1000000000000L).as("vec_id"),
          transform(col("embedding"), x => x * 1.01f).as("embedding"))
      t0 = System.nanoTime()
      val touched = graft.llm.VectorOps.graphUpsert(spark, idx, arrivals,
        "vec_id", "embedding")
      println(f"UPSERTPROBE upsert newN=$newN touchedParts=${touched.size} " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s")
      t0 = System.nanoTime()
      val served = graft.llm.VectorOps.graphServe(spark, idx,
        emb.filter(col("vec_id") % 100 === 0), "vec_id", "embedding",
        k = 5, beam = 10, rounds = 2, entries = 8).count()
      println(f"UPSERTPROBE serve rows=$served " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    else if (args(0) == "variantspike") {
      // variantspike <sfDir> [reps]: the Spark-4 VariantType storage spike
      // for the dynamic lane (r15 verdict #8). Measures, on the documents
      // table rendered as one JSON-string doc column (the dynamic lane's
      // transport):
      //   A jackson  — today's path: DynPipeline $match (fused Jackson
      //                parse + MQL eval per doc)
      //   B parse    — parse_json per query + variant_get filter
      //   C stored   — docs PERSISTED as a parquet VariantType column
      //                (one-time parse), variant_get filter only
      //   D mutate   — the $set-shaped round trip a MUTATING stage would
      //                pay under variant transport: variant_get reads +
      //                re-render to_json + parse_json back (Spark 4.1 has
      //                no incremental variant construction API)
      // plus row-count agreement across legs. Decision recorded in
      // BASELINE.md.
      import org.apache.spark.sql.functions._
      val dir = args(1)
      val reps = if (args.length > 2) args(2).toInt else 3
      val raw = spark.read.parquet(s"$dir/documents.parquet")
      val docs = raw.select(to_json(struct(raw.columns.map(col): _*))
        .as("doc"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n0 = docs.count()
      val vDir = java.nio.file.Files
        .createTempDirectory("graft_variant").toString
      docs.select(expr("parse_json(doc)").as("v"))
        .write.mode("overwrite").parquet(vDir)
      val matchJson =
        """[{"$match": {"lang": "en", "n_chars": {"$gte": 500}}}]"""
      def time(name: String)(body: => Long): Unit =
        for (i <- 1 to reps) {
          val t0 = System.nanoTime()
          val n = body
          println(f"VARIANTSPIKE $name run$i rows=$n " +
            f"${(System.nanoTime() - t0) / 1e9}%.3f s (of $n0)")
        }
      time("A_jackson") {
        graft.dynamic.DynPipeline.run(docs, matchJson).count()
      }
      time("B_parse_json") {
        docs.filter(
          expr("variant_get(parse_json(doc), '$.lang', 'string')") === "en" &&
          expr("variant_get(parse_json(doc), '$.n_chars', 'long')") >= 500)
          .count()
      }
      time("C_stored_variant") {
        spark.read.parquet(vDir).filter(
          expr("variant_get(v, '$.lang', 'string')") === "en" &&
          expr("variant_get(v, '$.n_chars', 'long')") >= 500).count()
      }
      time("D_mutate_roundtrip") {
        spark.read.parquet(vDir)
          .withColumn("v2", expr("parse_json(to_json(v))")) // the $set tax
          .filter(expr("variant_get(v2, '$.lang', 'string')") === "en" &&
            expr("variant_get(v2, '$.n_chars', 'long')") >= 500).count()
      }
    }
    else if (args(0) == "lshsweep") {
      // lshsweep: quantify dedupNearLsh's precision trade (r15 verdict #6)
      // — a LABELED fixture (mutated near-dup families + singletons, the
      // ' uq<j>'-style generator), band-collision decisions vs the exact
      // shingle-Jaccard >= 0.5 truth that dedupNear verifies per pair.
      // precision = P(jacc >= 0.5 | band collision); recall = P(collision |
      // jacc >= 0.5). Results recorded in FIXTURES.md; the (8,4) default
      // operating point is spec-pinned in CorpusOpsSpec.
      import graft.llm.DedupOps
      import spark.implicits._
      val df = LshSweepFixture.docs().toDF("doc_id", "text")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      def pairSet(d: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
        d.select("id_a", "id_b").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val truth = pairSet(
        DedupOps.jaccardPairsExact(df, "text", "doc_id", 3, 0.5))
      for ((b, r) <- Seq((4, 8), (8, 8), (8, 4), (16, 4), (8, 2), (16, 2))) {
        val cand = pairSet(DedupOps.minhashLsh(df, "text", "doc_id",
          shingleK = 3, bands = b, rowsPerBand = r, threshold = 0.0))
        val tp = (cand & truth).size
        println(f"LSHSWEEP bands=$b rowsPerBand=$r cand=${cand.size} " +
          f"truth=${truth.size} precision=${tp.toDouble / cand.size}%.3f " +
          f"recall=${tp.toDouble / truth.size}%.3f")
      }
    }
    else if (args(0) == "capbench") { // capbench <sfDir> <k> [reps]: BoundedTopK at corpus-scale k
      val dir = args(1); val k = args(2).toInt
      val reps = if (args.length > 3) args(3).toInt else 2
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      for (i <- 1 to reps) {
        val t0 = System.nanoTime()
        val n = graft.llm.CorpusOps.capPerKey(docs, "source", "doc_id", k).count()
        println(f"CAPBENCH k=$k run$i rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    else if (args(0) == "ivfsweep") { // ivfsweep <sfDir>: recall across IVF configs
      import org.apache.spark.sql.functions._
      val dir = args(1)
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val qs = emb.filter(col("vec_id") % 100 === 0)
      val exact = graft.llm.VectorOps.bruteTopK(emb, "vec_id", "embedding",
        qs, "vec_id", "embedding", k = 5)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      exact.count()
      for (nLists <- Seq(16, 32, 45); nProbe <- Seq(2, 4, 8); iters <- Seq(2, 5)) {
        val approx = graft.llm.VectorOps.ivfTopK(emb, "vec_id", "embedding",
          qs, "vec_id", "embedding", k = 5, nLists = nLists, nProbe = nProbe,
          lloydIters = iters)
        val r = graft.llm.VectorOps.recallAtK(approx, exact).collect()(0)
        println(f"IVFSWEEP nLists=$nLists nProbe=$nProbe iters=$iters recall=${r.getAs[Double]("recall")}%.3f")
      }
    }
    else if (args(0) == "knnsweep") { // knnsweep <sfDir>: NN-Descent graph recall by iters
      import org.apache.spark.sql.functions._
      val dir = args(1)
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val exact = graft.llm.VectorOps.bruteTopK(emb, "vec_id", "embedding",
        emb, "vec_id", "embedding", k = 5)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      exact.count()
      for (iters <- Seq(3, 4, 5); mrev <- Seq(10)) {
        val g = graft.llm.VectorOps.knnGraph(emb, "vec_id", "embedding",
          k = 5, iters = iters, maxRev = mrev)
          .select(col("src").as("query_id"), col("nn_id"), col("sim"), col("rank"))
        val r = graft.llm.VectorOps.recallAtK(g, exact).collect()(0)
        println(f"KNNSWEEP iters=$iters maxRev=$mrev recall=${r.getAs[Double]("recall")}%.3f")
      }
    }
    else if (args(0) == "annsweep") { // annsweep <sfDir>: graph-search recall by build sample cap
      import org.apache.spark.sql.functions._
      val dir = args(1)
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        .filter(col("vec_id") < 500)
      val exact = graft.llm.VectorOps.bruteTopK(emb, "vec_id", "embedding",
        emb, "vec_id", "embedding", k = 5)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      exact.count()
      for (sample <- Seq(0, 10, 8, 6)) {
        val g = graft.llm.VectorOps.knnGraph(emb, "vec_id", "embedding",
          k = 5, iters = 2, maxRev = 10, sample = sample)
          .select(col("src"), col("nn_id").as("nbr"))
        val approx = graft.llm.VectorOps.graphSearchTopK(emb, "vec_id",
          "embedding", g, emb, "vec_id", "embedding", k = 5, beam = 12,
          rounds = 3, entries = 8)
        val r = graft.llm.VectorOps.recallAtK(approx, exact).collect()(0)
        println(f"ANNSWEEP sample=$sample recall=${r.getAs[Double]("recall")}%.4f")
      }
    }
    else if (args(0) == "anntime") { // anntime <sfDir> <reps>: sampled vs full build+search, same JVM
      import org.apache.spark.sql.functions._
      val dir = args(1)
      val reps = if (args.length > 2) args(2).toInt else 3
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      for (r <- 1 to reps; sample <- Seq(0, 8)) {
        val t0 = System.nanoTime()
        val g = graft.llm.VectorOps.knnGraph(emb, "vec_id", "embedding",
          k = 5, iters = 2, maxRev = 10, sample = sample)
          .select(col("src"), col("nn_id").as("nbr"))
        val n = graft.llm.VectorOps.graphSearchTopK(emb, "vec_id",
          "embedding", g, emb.filter(col("vec_id") % 100 === 0), "vec_id",
          "embedding", k = 5, beam = 10, rounds = 2, entries = 8).count()
        println(f"ANNTIME sample=$sample run$r rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    else if (args(0) == "annparts") { // annparts <sfDir> <sample>: build vs search wall time
      import org.apache.spark.sql.functions._
      val dir = args(1); val sample = args(2).toInt
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      for (r <- 1 to 2) {
        val t0 = System.nanoTime()
        val g = graft.llm.VectorOps.knnGraph(emb, "vec_id", "embedding",
          k = 5, iters = 2, maxRev = 10, sample = sample)
          .select(col("src"), col("nn_id").as("nbr")).localCheckpoint()
        val ne = g.count()
        val t1 = System.nanoTime()
        val n = graft.llm.VectorOps.graphSearchTopK(emb, "vec_id",
          "embedding", g, emb.filter(col("vec_id") % 100 === 0), "vec_id",
          "embedding", k = 5, beam = 10, rounds = 2, entries = 8).count()
        val t2 = System.nanoTime()
        println(f"ANNPARTS sample=$sample run$r build=${(t1-t0)/1e9}%.2f s (edges=$ne) search=${(t2-t1)/1e9}%.2f s (rows=$n)")
      }
    }
    else if (args(0) == "annrounds") { // annrounds <sfDir> <sample>: per-iteration build cost
      import org.apache.spark.sql.functions._
      val dir = args(1); val sample = args(2).toInt
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      var prev = 0.0
      for (it <- 1 to 3) {
        val t0 = System.nanoTime()
        graft.llm.VectorOps.knnGraph(emb, "vec_id", "embedding",
          k = 5, iters = it, maxRev = 10, sample = sample).count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"ANNROUNDS sample=$sample iters=$it total=$dt%.2f s marginal=${dt - prev}%.2f s")
        prev = dt
      }
    }
    else if (args(0) == "anninit") { // anninit <sfDir>: break down knnGraph fixed costs
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.types._
      val dir = args(1)
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      for (r <- 1 to 2) {
        var t0 = System.nanoTime()
        def lap(tag: String): Unit = {
          val t1 = System.nanoTime()
          println(f"ANNINIT run$r $tag ${(t1 - t0) / 1e9}%.2f s"); t0 = t1
        }
        println("ANNINIT emb_partitions=" + emb.rdd.getNumPartitions)
        val vecs = emb.repartition(32)
          .select(col("vec_id").cast(LongType).as("id"),
          graft.llm.VectorOps.normalize(col("embedding").cast(ArrayType(DoubleType))).as("__v"))
          .localCheckpoint()
        lap("vecs_checkpoint")
        vecs.count(); lap("vecs_count")
        val ranked = graft.operators.GlobalRank.withRank(
          vecs.select(col("id"), graft.llm.DedupOps.md5Lower63(
            concat(lit("knng:"), col("id").cast(StringType))).as("__key")),
          "__key", "__pos", "__n").select(col("id"), col("__pos"), col("__n"))
        ranked.count(); lap("globalrank")
        val offs = spark.range(1, 6L).select(col("id").as("__j"))
        val edges = ranked.crossJoin(broadcast(offs))
          .withColumn("__off", lit(1L) + pmod(graft.llm.DedupOps.md5Lower63(
            concat(lit("knns:"), col("__pos").cast(StringType), lit(":"),
              col("__j").cast(StringType))), col("__n") - 1))
          .withColumn("__tpos", ((col("__pos") - 1 + col("__off")) % col("__n")) + 1)
          .join(ranked.select(col("id").as("nbr"), col("__pos").as("__tp")),
            col("__tpos") === col("__tp"))
          .select(col("id").as("src"), col("nbr"))
          .filter(col("src") =!= col("nbr"))
          .distinct()
          .localCheckpoint()
        lap("init_edges")
        println(s"ANNINIT run$r edges=${edges.count()}")
      }
    }
    else if (args(0) == "upsertparts") {
      // upsertparts <sfDir>: cold llm_ann_graph_upsert cost anatomy —
      // graphSave(400) vs graphUpsert(100) vs the query's own serve +
      // brute ground truth. Warmup job first to exclude first-job cost.
      import org.apache.spark.sql.functions._
      val dir = args(1)
      spark.range(1000000).selectExpr("sum(id)").collect()
      for (r <- 1 to 2) {
        val emb = spark.read.parquet(s"$dir/embeddings.parquet")
          .filter(col("vec_id") < 500)
        val path = java.nio.file.Files
          .createTempDirectory("graft_upsertparts").toString
        var t0 = System.nanoTime()
        def lap(tag: String): Unit = {
          val t1 = System.nanoTime()
          println(f"UPSERTPARTS run$r $tag ${(t1 - t0) / 1e9}%.2f s"); t0 = t1
        }
        graft.llm.VectorOps.graphSave(
          emb.filter(col("vec_id") >= 100), "vec_id", "embedding", path,
          k = 5, iters = 2, maxRev = 10, sample = 8, nParts = 8)
        lap("graphSave_400")
        graft.llm.VectorOps.graphUpsert(spark, path,
          emb.filter(col("vec_id") < 100), "vec_id", "embedding")
        lap("graphUpsert_100")
        val fresh = emb.filter(col("vec_id") < 100)
        val exact = graft.llm.VectorOps.bruteTopK(emb, "vec_id", "embedding",
          fresh, "vec_id", "embedding", k = 5)
        exact.count(); lap("bruteTopK")
        val served = graft.llm.VectorOps.graphServe(spark, path, fresh,
          "vec_id", "embedding", k = 5, beam = 12, rounds = 3, entries = 8)
        served.count(); lap("serve_100q")
        val nf = spark.read.parquet(s"$path/graph")
          .filter(col("src") >= 100 && col("nbr") < 100)
          .agg(count(lit(1))).head().getLong(0)
        lap(s"adjacency_scan(nf=$nf)")
      }
    }
    else if (args(0) == "beamplan") {
      // beamplan <outDir>: dump the physical plan of ONE beam round's
      // keep-top-beam step, in the pre-r16 formulation (dropDuplicates +
      // row_number = two hash Exchanges) and the r16 fused formulation
      // (dense_rank + lag in one window = one Exchange), over the same
      // representative input — the committed evidence for the plan claim
      // (the executed beam is invisible from outside: each round
      // localCheckpoints, so returned plans start at an RDD scan).
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val out = args(1)
      val df = spark.range(12000)
        .select((col("id") % 500).as("query_id"), (col("id") % 900).as("id"),
          (col("id") % 97).cast("double").as("sim"))
        .localCheckpoint()
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("sim").desc, col("id"))
      val before = df.dropDuplicates("query_id", "id")
        .withColumn("__r", row_number().over(w))
        .filter(col("__r") <= 12).drop("__r")
      val after = df.withColumn("__r", dense_rank().over(w))
        .withColumn("__p", lag(col("id"), 1).over(w))
        .filter(col("__r") <= 12 &&
          (col("__p").isNull || col("__p") =!= col("id")))
        .drop("__r", "__p")
      def dump(d: org.apache.spark.sql.DataFrame, f: String): Unit =
        java.nio.file.Files.writeString(java.nio.file.Paths.get(f),
          d.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
      dump(before, s"$out/beam_round_before.txt")
      dump(after, s"$out/beam_round_after.txt")
      println("BEAMPLAN dumped to " + out)
    }
    else if (args(0) == "miscplans") {
      // miscplans <outDir>: committed plan evidence for the r16 fragment
      // rewrites whose executed form is invisible from outside (driver-side
      // scalars / checkpointed loops): the funnel's exact-dedup count and
      // knnGraph's ρ-sampling window, each in pre-r16 and r16 form over the
      // same input.
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      val out = args(1)
      def dump(d: org.apache.spark.sql.DataFrame, f: String): Unit =
        java.nio.file.Files.writeString(java.nio.file.Paths.get(f),
          d.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
      // ---- funnel exact-dedup count ----
      val s2 = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select(col("doc_id"), col("text"))
      val reps = s2.select(md5(col("text")).as("__h"), col("doc_id"))
        .groupBy("__h").agg(min(col("doc_id")).as("doc_id"))
      dump(s2.join(reps, Seq("doc_id"), "left_semi")
        .groupBy().count(), s"$out/funnel_exactdedup_before.txt")
      dump(s2.agg(count_distinct(md5(col("text")))),
        s"$out/funnel_exactdedup_after.txt")
      // ---- knnGraph ρ-sampling window ----
      val edges = spark.range(5000)
        .select((col("id") % 500).as("src"), (col("id") % 37).as("nbr"))
        .localCheckpoint()
      val rev = edges.select(col("nbr").as("src"), col("src").as("nbr"))
      val wU = Window.partitionBy(col("src")).orderBy(
        graft.llm.DedupOps.md5Lower63(concat(lit("knnu:1:"),
          col("src").cast("string"), lit(":"),
          col("nbr").cast("string"))), col("nbr"))
      dump(edges.union(rev).distinct()
        .withColumn("__urk", row_number().over(wU))
        .filter(col("__urk") <= 8).drop("__urk"),
        s"$out/knn_sample_window_before.txt")
      dump(edges.union(rev)
        .withColumn("__urk", dense_rank().over(wU))
        .withColumn("__up", lag(col("nbr"), 1).over(wU))
        .filter(col("__urk") <= 8 &&
          (col("__up").isNull || col("__up") =!= col("nbr")))
        .drop("__urk", "__up"),
        s"$out/knn_sample_window_after.txt")
      println("MISCPLANS dumped to " + out)
    }
    else if (args(0) == "aqeprobe") {
      // aqeprobe: does AQE coalesce the tiny window/dedup shuffles the beam
      // rounds and graph builds are made of, and how many partitions does a
      // localCheckpoint of such a frame carry into downstream jobs?
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.expressions.Window
      println("adaptive.enabled=" + spark.conf.get("spark.sql.adaptive.enabled")
        + " coalescePartitions=" +
        spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
        + " shuffle.partitions=" + spark.conf.get("spark.sql.shuffle.partitions"))
      val df = spark.range(6000)
        .select((col("id") % 500).as("query_id"), col("id").as("id"),
          rand(7).as("sim"))
      val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("id"))
      val kept = df.withColumn("__r", row_number().over(w))
        .filter(col("__r") <= 12).drop("__r")
      val ck = kept.localCheckpoint()
      println("checkpointed partitions=" + ck.rdd.getNumPartitions)
      val dd = df.dropDuplicates("query_id", "id")
      println("dropDup partitions=" + dd.rdd.getNumPartitions)
      val t0 = System.nanoTime()
      ck.select(pmod(col("id"), lit(8L)).as("p")).distinct().collect()
      println(f"partsOf-job ${(System.nanoTime() - t0) / 1e9}%.3f s")
      val t1 = System.nanoTime()
      ck.count()
      println(f"count-job ${(System.nanoTime() - t1) / 1e9}%.3f s")
      // does an Observation fire on localCheckpoint(eager), with a bounded
      // wait? (the fused partsOf design depends on it)
      val obs = org.apache.spark.sql.Observation("parts")
      val ck2 = kept.observe(obs, collect_set(pmod(col("id"), lit(8L))))
        .localCheckpoint()
      val got = obs.getAsJava // blocks until the action's metrics arrive
      println("observe-on-checkpoint parts=" + got)
      println("ck2 partitions=" + ck2.rdd.getNumPartitions)
    }
    else if (args(0) == "gsaveparts") {
      // gsaveparts <sfDir>: cold graphSave+graphServe cost anatomy on the
      // FIXED 500-doc slice (the bench's savedRecallGraph shape) — where do
      // the ~20 s of cold time go? A warmup job first so JVM/Spark first-job
      // cost is excluded from the laps.
      import org.apache.spark.sql.functions._
      val dir = args(1)
      spark.range(1000000).selectExpr("sum(id)").collect() // JVM warmup
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        .filter(col("vec_id") < 500)
      for (r <- 1 to 2) {
        val idx = java.nio.file.Files
          .createTempDirectory("graft_gsaveparts").toString
        var t0 = System.nanoTime()
        def lap(tag: String): Unit = {
          val t1 = System.nanoTime()
          println(f"GSAVEPARTS run$r $tag ${(t1 - t0) / 1e9}%.2f s"); t0 = t1
        }
        // --- graphSave body, inlined for lap boundaries ---
        import org.apache.spark.sql.types._
        val vecs = emb.repartition(32)
          .select(col("vec_id").cast(LongType).as("id"),
            graft.llm.VectorOps.normalize(
              col("embedding").cast(ArrayType(DoubleType))).as("__v"))
          .localCheckpoint()
        lap("vecs_checkpoint")
        vecs.select(col("id"), col("__v").as("vec"))
          .withColumn("part", pmod(col("id"), lit(8L)))
          .write.mode("overwrite").partitionBy("part").parquet(s"$idx/vectors")
        lap("vectors_write")
        vecs.select(col("id"), graft.llm.DedupOps.md5Lower63(
            concat(lit("gse:"), col("id").cast(StringType))).as("__e"))
          .orderBy(col("__e"), col("id")).limit(64)
          .coalesce(1).write.mode("overwrite").parquet(s"$idx/entry")
        lap("entry_write")
        val g = graft.llm.VectorOps.knnGraph(emb, "vec_id", "embedding",
          k = 5, iters = 2, maxRev = 10, sample = 8)
        g.select(col("src"), col("nn_id").as("nbr"), col("sim"), col("rank"))
          .withColumn("part", pmod(col("src"), lit(8L)))
          .write.mode("overwrite").partitionBy("part").parquet(s"$idx/graph")
        lap("knngraph_plus_write")
        import spark.implicits._
        Seq((8, 64, 5, 2, 10, 8))
          .toDF("nParts", "entryPool", "k", "iters", "maxRev", "sample")
          .coalesce(1).write.mode("overwrite").parquet(s"$idx/meta")
        lap("meta_write")
        val served = graft.llm.VectorOps.graphServe(spark, idx,
          emb, "vec_id", "embedding", k = 5, beam = 12, rounds = 3,
          entries = 8).count()
        lap(s"serve_500q_cold(rows=$served)")
        graft.llm.VectorOps.graphServe(spark, idx,
          emb, "vec_id", "embedding", k = 5, beam = 12, rounds = 3,
          entries = 8).count()
        lap("serve_500q_warm")
      }
    }
    else if (args(0) == "funnelparts") { // funnelparts <sfDir>: stage-1 cost anatomy
      import org.apache.spark.sql.functions._
      val dir = args(1)
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val gateCols = Seq("g_wordcount_ok", "g_mwl_ok", "g_symbol_ok",
        "g_bullet_ok", "g_ellipsis_ok", "g_alpha_ok", "c4_no_lorem",
        "c4_no_brace")
      for (r <- 1 to 2) {
        var t0 = System.nanoTime()
        def lap(tag: String, n: Long): Unit = {
          val t1 = System.nanoTime()
          println(f"FUNNELPARTS run$r $tag n=$n ${(t1 - t0) / 1e9}%.2f s"); t0 = t1
        }
        lap("raw_count", docs.count())
        // wordcount-only gate (the selective rule alone)
        lap("wc_only", docs.filter(
          size(graft.llm.TextOps.tokens(col("text"))).between(50, 100000)).count())
        // full rule gate
        val gated = graft.llm.TextOps.gopherC4Rules(docs, "text")
          .filter(gateCols.map(col).reduce(_ && _))
        lap("rules_gate", gated.count())
        // rules + checkpoint, no langId (isolates the checkpoint write)
        lap("rules_plus_ckpt", graft.llm.TextOps.gopherC4Rules(docs, "text")
          .filter(gateCols.map(col).reduce(_ && _))
          .select(col("doc_id"), col("text"))
          .localCheckpoint(true).count())
        // rules + langId (the funnel's actual checkpoint projection)
        lap("rules_plus_langid", graft.llm.TextOps.gopherC4Rules(docs, "text")
          .filter(gateCols.map(col).reduce(_ && _))
          .select(col("doc_id"), col("text"),
            (graft.llm.TextOps.langId(col("text")) === "en").as("__l"))
          .localCheckpoint(true).count())
      }
    }
    else if (args(0) == "jobs") {
      // jobs <name,csv> [sfDir] [reps]: count Spark jobs/stages/tasks per
      // query (r17 — per-job fixed cost is ~0.3-0.6 s on this harness even
      // for 1-task jobs, so job COUNT is the anti-scaling lever; this probe
      // is the before/after evidence for job-count cuts)
      import org.apache.spark.scheduler._
      val names = args(1).split(",").toSeq
      val dir = if (args.length > 2) args(2) else "/root/testdata/sf0.001"
      val reps = if (args.length > 3) args(3).toInt else 2
      val jobs = new java.util.concurrent.atomic.AtomicLong
      val stages = new java.util.concurrent.atomic.AtomicLong
      val tasks = new java.util.concurrent.atomic.AtomicLong
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onJobStart(j: SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); stages.addAndGet(j.stageInfos.size)
          tasks.addAndGet(j.stageInfos.map(_.numTasks).sum)
        }
      })
      for (name <- names; i <- 1 to reps) {
        Thread.sleep(200) // drain in-flight listener events
        val (j0, s0, t0) = (jobs.get, stages.get, tasks.get)
        val w0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, dir).count()
        val wall = (System.nanoTime() - w0) / 1e9
        Thread.sleep(500)
        println(f"JOBS $name run$i rows=$n jobs=${jobs.get - j0} " +
          f"stages=${stages.get - s0} tasks=${tasks.get - t0} $wall%.2f s")
      }
    }
    else if (args(0) == "jobtrace") {
      // jobtrace <name> [sfDir]: print every job's call site + task count
      // for one warm run of a query (where do the 30 jobs per serve live?)
      import org.apache.spark.scheduler._
      val dir = if (args.length > 2) args(2) else "/root/testdata/sf0.001"
      val cold = args.length > 3 && args(3) == "cold"
      if (!cold) { // warm / build memos unless tracing the cold chain
        SparkEntry.queries(args(1))(spark, dir).count()
        Thread.sleep(500)
      }
      val log = new java.util.concurrent.ConcurrentLinkedQueue[String]
      val on = new java.util.concurrent.atomic.AtomicBoolean(false)
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onJobStart(j: SparkListenerJobStart): Unit =
          if (on.get) log.add(
            s"tasks=${j.stageInfos.map(_.numTasks).sum} " +
            s"stages=${j.stageInfos.size} " +
            j.stageInfos.map(_.name.takeWhile(_ != '+').trim)
              .mkString(" | "))
      })
      on.set(true)
      SparkEntry.queries(args(1))(spark, dir).count()
      Thread.sleep(800); on.set(false)
      log.forEach(s => println("JOBTRACE " + s))
    }
    else if (args(0) == "explain") {
      val dir = if (args.length > 2) args(2) else "/root/testdata/sf0.001"
      SparkEntry.queries(args(1))(spark, dir).explain("formatted")
    }
    else {
      val q = SparkEntry.queries(args(0))
      q(spark, if (args.length > 1) args(1) else "/root/testdata/sf0.001").show(5, false)
    }
    spark.stop()
  }
}
