package graft

import graft.llm.{PcaOps, VectorOps}
import org.apache.spark.sql.functions._

/** NN-Descent kNN-graph quality/determinism and PCA/whitening/ABTT math. */
class PcaKnnSpec extends SparkSpec {

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def pairs(df: org.apache.spark.sql.DataFrame,
      src: String): Set[(Long, Long)] =
    df.select(col(src), col("nn_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("knnGraph on clustered data converges to same-cluster neighbors") {
    import spark.implicits._
    val protos = Seq(
      Array(1f, 0f, 0f, 0f, 1f, 0f, 0f, 0f),
      Array(0f, 1f, 0f, 0f, 0f, 1f, 0f, 0f),
      Array(0f, 0f, 1f, 0f, 0f, 0f, 1f, 0f))
    val rows = for {
      c <- 0 until 3; i <- 0 until 8
    } yield ((c * 10 + i).toLong, protos(c).zipWithIndex.map { case (x, d) =>
      if (d == 3 || d == 7) x + 0.05f * (i + 1) else x }.toSeq)
    val df = rows.toDF("vec_id", "embedding")
    val g = VectorOps.knnGraph(df, "vec_id", "embedding", k = 3, iters = 3)
    val got = g.select("src", "nn_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.nonEmpty)
    val sameCluster = got.count { case (a, b) => a / 10 == b / 10 }
    // ring init is cluster-oblivious; three descent rounds must land the
    // overwhelming majority of edges inside the true cluster
    assert(sameCluster.toDouble / got.length > 0.9,
      s"only $sameCluster/${got.length} same-cluster edges")
  }

  test("knnGraph is deterministic and per-node quality is monotone in iters") {
    val exact = VectorOps.bruteTopK(emb, "vec_id", "embedding",
      emb, "vec_id", "embedding", k = 5)
      .select(col("query_id").as("src"), col("nn_id"))
    val truth = pairs(exact, "src")
    def recall(iters: Int): Double = {
      val got = pairs(VectorOps.knnGraph(emb, "vec_id", "embedding",
        k = 5, iters = iters), "src")
      (got & truth).size.toDouble / truth.size
    }
    val r1 = recall(1)
    val r2 = recall(2)
    // candidates each round include the current neighbors, so per-node
    // top-k similarity never regresses -> neither does recall
    assert(r2 >= r1 - 1e-12, s"r1=$r1 r2=$r2")
    val a = VectorOps.knnGraph(emb, "vec_id", "embedding", k = 5, iters = 2)
      .collect().map(_.toString).sorted
    val b = VectorOps.knnGraph(emb, "vec_id", "embedding", k = 5, iters = 2)
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("jacobiEigen solves a known symmetric matrix with the sign convention") {
    val (eig, v) = PcaOps.jacobiEigen(Array(
      Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(eig(0) - 3.0) < 1e-12 && math.abs(eig(1) - 1.0) < 1e-12)
    val s = 1.0 / math.sqrt(2)
    assert(math.abs(v(0)(0) - s) < 1e-12 && math.abs(v(1)(0) - s) < 1e-12)
    // second column sign-fixed so its largest-|.| component is positive
    assert(math.abs(math.abs(v(0)(1)) - s) < 1e-12 &&
      math.abs(v(0)(1) + v(1)(1)) < 1e-12 && math.max(v(0)(1), v(1)(1)) > 0)
  }

  test("moments + jacobiEigen: orthonormal basis that diagonalizes the covariance") {
    val m = PcaOps.moments(emb, "embedding", 64)
    val (eig, v) = PcaOps.jacobiEigen(m.cov)
    assert(eig.zip(eig.tail).forall { case (a, b) => a >= b - 1e-12 })
    // V^T V = I
    for (a <- 0 until 64 by 7; b <- 0 until 64 by 7) {
      val d = (0 until 64).map(i => v(i)(a) * v(i)(b)).sum
      val expect = if (a == b) 1.0 else 0.0
      assert(math.abs(d - expect) < 1e-9, s"V^TV[$a][$b]=$d")
    }
    // C v_c = eig_c v_c
    for (c <- Seq(0, 5, 31, 63)) {
      val cv = (0 until 64).map(i =>
        (0 until 64).map(j => m.cov(i)(j) * v(j)(c)).sum)
      val resid = (0 until 64).map(i => math.abs(cv(i) - eig(c) * v(i)(c))).max
      assert(resid < 1e-9, s"eigenpair $c residual $resid")
    }
  }

  test("pcaProject: component variances = eigenvalues; whitening makes them 1") {
    val m = PcaOps.moments(emb, "embedding", 64)
    val (eig, _) = PcaOps.jacobiEigen(m.cov)
    def vars(whiten: Boolean): Array[Double] = {
      val rows = PcaOps.pcaProject(emb, "vec_id", "embedding", 64, r = 4,
        whiten = whiten).select("comps").collect().map(_.getSeq[Double](0))
      Array.tabulate(4) { c =>
        val xs = rows.map(_(c))
        val mu = xs.sum / xs.length
        xs.map(x => (x - mu) * (x - mu)).sum / xs.length
      }
    }
    // eigenpairs come from the quantized (order-proof) moment pass while
    // the sample variances here are raw doubles — allow the ~1e-8
    // quantization gap on top of float noise
    val raw = vars(whiten = false)
    raw.zip(eig.take(4)).foreach { case (got, want) =>
      assert(math.abs(got - want) < 1e-5 * math.max(1.0, want), s"$got vs $want")
    }
    vars(whiten = true).foreach(x => assert(math.abs(x - 1.0) < 1e-5, s"$x"))
  }

  test("removeTop: output is orthogonal to the removed components, r=0 is centering") {
    val m = PcaOps.moments(emb, "embedding", 64)
    val (_, v) = PcaOps.jacobiEigen(m.cov)
    val out = PcaOps.removeTop(emb, "vec_id", "embedding", 64, r = 2)
      .select("vec").collect().map(_.getSeq[Double](0))
    for (c <- 0 until 2) {
      val maxDot = out.map(row =>
        math.abs((0 until 64).map(i => row(i) * v(i)(c)).sum)).max
      assert(maxDot < 1e-9, s"component $c residual dot $maxDot")
    }
    val centered = PcaOps.removeTop(emb, "vec_id", "embedding", 64, r = 0)
      .select("vec").collect().map(_.getSeq[Double](0))
    // centering subtracts the quantized-moment mean: residual carries the
    // quantization half-ulp (≲ 0.5/(10⁶·√n)), not pure float noise
    val meanResid = Array.tabulate(64)(i =>
      math.abs(centered.map(_(i)).sum / centered.length)).max
    assert(meanResid < 1e-6)
  }

  test("tripletMine: best positive in band, best negative below, inner drop") {
    import spark.implicits._
    val corpus = Seq(
      (0L, Seq(1f, 0f, 0f)), // anchor
      (1L, Seq(0.99f, 0.1f, 0f)), // cos ~0.995 -> positive
      (2L, Seq(0.5f, 0.866f, 0f)), // cos 0.5 -> neither band
      (3L, Seq(0.1f, 0.995f, 0f)), // cos ~0.1 -> best negative
      (4L, Seq(0f, 1f, 0f)), // cos 0 -> weaker negative
      (9L, Seq(0f, 0f, 1f))) // 2nd anchor: NO positive -> no triplet
      .toDF("vec_id", "embedding")
    val anchors = corpus.filter(col("vec_id") === 0L || col("vec_id") === 9L)
    val got = VectorOps.tripletMine(corpus, "vec_id", "embedding",
      anchors, "vec_id", "embedding", posThreshold = 0.9, negThreshold = 0.3)
      .collect()
    assert(got.length == 1)
    val r = got(0)
    assert(r.getAs[Long]("anchor_id") == 0L)
    assert(r.getAs[Long]("pos_id") == 1L)
    assert(r.getAs[Long]("neg_id") == 3L) // highest cosine under the bar
    assert(r.getAs[Double]("pos_cos") > 0.99 &&
      r.getAs[Double]("neg_cos") < 0.3)
  }

  test("graphSearchTopK on clustered data retrieves same-cluster neighbors") {
    import spark.implicits._
    val protos = Seq(
      Array(1f, 0f, 0f, 0f, 1f, 0f, 0f, 0f),
      Array(0f, 1f, 0f, 0f, 0f, 1f, 0f, 0f),
      Array(0f, 0f, 1f, 0f, 0f, 0f, 1f, 0f))
    val rows = for {
      c <- 0 until 3; i <- 0 until 8
    } yield ((c * 10 + i).toLong, protos(c).zipWithIndex.map { case (x, d) =>
      if (d == 3 || d == 7) x + 0.05f * (i + 1) else x }.toSeq)
    val df = rows.toDF("vec_id", "embedding")
    val g = VectorOps.knnGraph(df, "vec_id", "embedding", k = 3, iters = 3)
      .select(col("src"), col("nn_id").as("nbr"))
    val got = VectorOps.graphSearchTopK(df, "vec_id", "embedding", g,
      df, "vec_id", "embedding", k = 3, beam = 8, rounds = 3, entries = 4)
      .collect()
    // every query answered with a full k and a high-cosine best hit (the
    // query node is a corpus member here, so the final ranking drops the
    // self-match — see graphSearchTopK's corpus-member-id precondition —
    // and the best remaining hit must still be a near-identical neighbor)
    assert(got.length == 24 * 3)
    got.filter(_.getAs[Int]("rank") == 1).foreach { r =>
      assert(r.getAs[Double]("sim") > 0.95, r.toString) }
    val same = got.count(r =>
      r.getAs[Long]("query_id") / 10 == r.getAs[Long]("nn_id") / 10)
    assert(same.toDouble / got.length > 0.9,
      s"only $same/${got.length} same-cluster results")
  }
}
