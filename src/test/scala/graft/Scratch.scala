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
