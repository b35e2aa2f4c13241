package graft

import graft.llm.VectorOps
import org.apache.spark.sql.functions._

/** ANN quality: multi-probe LSH recall vs brute-force ground truth. */
class AnnSpec extends SparkSpec {

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")
  private lazy val queries = emb.filter(col("vec_id") % 50 === 0)

  private def hits(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("query_id", "nn_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("multi-probe LSH recall beats single-probe and finds real neighbors") {
    val truth = hits(VectorOps.bruteTopK(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 5))
    val single = hits(VectorOps.lshTopK(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 5, nPlanes = 4, multiProbe = false))
    val multi = hits(VectorOps.lshTopK(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 5, nPlanes = 4, multiProbe = true))
    val rSingle = (single & truth).size.toDouble / truth.size
    val rMulti = (multi & truth).size.toDouble / truth.size
    assert(rMulti >= rSingle)
    // synthetic embeddings are weakly clustered (top-5 cosine ~0.32): with
    // 4 planes, single-probe expects ~13% bucket collision, multi-probe ~48%
    assert(rMulti > 0.3, s"multi-probe recall $rMulti too low")
  }

  test("IVF sample-trained quantizer keeps recall close to full training") {
    val truth = hits(VectorOps.bruteTopK(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 5))
    def recall(frac: Double): Double = {
      val got = hits(VectorOps.ivfTopK(emb, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 5, nLists = 8, nProbe = 2,
        trainFraction = frac))
      (got & truth).size.toDouble / truth.size
    }
    val full = recall(1.0)
    val sampled = recall(0.5)
    // the quantizer only places centroids; a half-corpus train must not
    // collapse recall (allow some centroid drift)
    assert(sampled >= full - 0.2, s"sampled=$sampled full=$full")
    assert(sampled > 0.2, s"sampled recall $sampled too low")
  }

  test("int8 quantization: bounded reconstruction error, rank-preserving dots") {
    val q = VectorOps.quantizeInt8(emb, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getDouble(1),
        r.getSeq[Byte](2).toArray)).toList
    val orig = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    q.take(50).foreach { case (id, scale, qv) =>
      val v = orig(id)
      assert(qv.length == v.length)
      val err = v.indices.map(i => math.abs(v(i) - qv(i) / scale)).max
      // per-component error <= 0.5/scale = max|v|/254
      val bound = v.map(math.abs).max / 254.0 + 1e-9
      assert(err <= bound * 1.01, s"id=$id err=$err bound=$bound")
    }
  }

  test("embedding near-dup: exact finds all pairs, LSH is a sound subset") {
    val exact = VectorOps.embedNearDupExact(emb, "vec_id", "embedding", 0.3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    assert(exact.forall { case (a, b) => a < b })
    // every LSH-found pair is a true near-dup pair (precision 1 after the
    // exact cosine verify); recall < 1 is expected
    val lsh = VectorOps.embedNearDupLsh(emb, "vec_id", "embedding", 0.3,
      nPlanes = 4, bands = 4)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact))
    assert(lsh.nonEmpty, "4x4-band LSH should find at least one pair at t=0.3")
  }

  test("recallAtK: per-query mean of found exact neighbors") {
    import spark.implicits._
    val exact = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 12L))
      .toDF("query_id", "nn_id")
    // q1 finds both, q2 finds one of two -> mean recall 0.75; extra
    // non-exact hits don't count
    val approx = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 99L))
      .toDF("query_id", "nn_id")
    val r = VectorOps.recallAtK(approx, exact).head()
    assert(r.getLong(0) == 2L)
    assert(math.abs(r.getDouble(1) - 0.75) < 1e-12)
  }

  test("pairRecall counts true pairs found; simhash bucketing is complete") {
    import spark.implicits._
    val exact = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("id_a", "id_b")
    val approx = Seq((1L, 2L), (5L, 6L), (7L, 8L)).toDF("id_a", "id_b")
    val r = graft.llm.DedupOps.pairRecall(approx, exact).head()
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L)
    assert(math.abs(r.getDouble(2) - 2.0 / 3) < 1e-12)
    // pigeonhole completeness: chunk-bucketed simhash == all-pairs exact
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(pairs(graft.llm.DedupOps.simhashNearDup(docs, "text", "doc_id", 3)) ==
      pairs(graft.llm.DedupOps.simhashNearDupExact(docs, "text", "doc_id", 3)))
  }

  test("semDedup drops within-cluster near-dups greedily by id") {
    import spark.implicits._
    val df = Seq(
      (1L, Array(1f, 0f, 0f, 0f)),
      (2L, Array(1f, 0f, 0f, 0f)),        // dup of 1 -> dropped
      (3L, Array(0.99f, 0.14f, 0f, 0f)),  // cos ~0.99 to 1 -> dropped
      (10L, Array(0f, 1f, 0f, 0f)),
      (11L, Array(0f, 0.99f, 0.14f, 0f)), // near 10 -> dropped
      (20L, Array(0f, 0f, 0f, 1f))
    ).toDF("vec_id", "embedding")
    // nClusters=1 makes the verdicts centroid-pick-invariant: one cluster,
    // pure greedy-by-id within tau
    val one = VectorOps.semDedup(df, "vec_id", "embedding",
      nClusters = 1, tau = 0.9)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(3)))
    assert(one.forall(_._2 == 0))
    assert(one.map(t => t._1 -> t._3).toMap ==
      Map(1L -> true, 2L -> false, 3L -> false,
        10L -> true, 11L -> false, 20L -> true))
    // the cluster's lowest id (and only it) has a null max_cos_lower
    val nulls = VectorOps.semDedup(df, "vec_id", "embedding",
      nClusters = 1, tau = 0.9)
      .filter(org.apache.spark.sql.functions.col("max_cos_lower").isNull)
      .collect().map(_.getLong(0)).toSet
    assert(nulls == Set(1L))
    // multi-cluster + lloyd: runs, covers every doc once, and identical
    // vectors always co-cluster (identical argmax input) so the exact dup
    // is dropped whatever the seeded pick
    val multi = VectorOps.semDedup(df, "vec_id", "embedding",
      nClusters = 3, tau = 0.9, lloydIters = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getBoolean(3)))
    assert(multi.map(_._1).toSet ==
      Set(1L, 2L, 3L, 10L, 11L, 20L) && multi.forall(t => t._2 >= 0 && t._2 < 3))
    val byId = multi.map(t => t._1 -> t._2).toMap
    assert(byId(1L) == byId(2L))
    assert(!multi.find(_._1 == 2L).get._3, "exact dup must be dropped")
  }

  test("hardNegatives: near-dup band is excluded, hardest remaining ranks first") {
    import spark.implicits._
    // query q; dup is an identical vector (cos 1), hard is close (cos ~0.9),
    // easy is orthogonal-ish
    val corpus = Seq(
      (1L, Seq(1f, 0f)),          // dup of the query
      (2L, Seq(0.9f, 0.435890f)), // hard negative, cos ~0.9
      (3L, Seq(0f, 1f))           // easy negative, cos 0
    ).toDF("vec_id", "embedding")
    val q = Seq((10L, Seq(1f, 0f))).toDF("vec_id", "embedding")
    val got = VectorOps.hardNegatives(corpus, "vec_id", "embedding",
      q, "vec_id", "embedding", k = 2, dupThreshold = 0.95)
      .orderBy("rank").collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(2L, 3L), "dup (cos 1) excluded")
    assert(got.head.getAs[Double]("sim") > 0.85)
  }

  test("pqTopK: clustered data retrieves same-cluster neighbors; Lloyd helps") {
    import spark.implicits._
    // 3 prototypes in 8-dim, members = prototype with one coordinate nudged;
    // PQ (m=2, ks=4) must rank same-cluster members above other clusters
    val protos = Seq(
      Array(1f, 0f, 0f, 0f, 1f, 0f, 0f, 0f),
      Array(0f, 1f, 0f, 0f, 0f, 1f, 0f, 0f),
      Array(0f, 0f, 1f, 0f, 0f, 0f, 1f, 0f))
    val rows = for {
      c <- 0 until 3; i <- 0 until 6
    } yield ((c * 10 + i).toLong, protos(c).zipWithIndex.map { case (x, d) =>
      if (d == 3 || d == 7) x + 0.05f * (i + 1) else x }.toSeq)
    val emb = rows.toDF("vec_id", "embedding")
    val qs = emb.filter($"vec_id" % 10 === 0) // one query per cluster
    val got = VectorOps.pqTopK(emb, "vec_id", "embedding",
      qs, "vec_id", "embedding", k = 3, m = 2, ks = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
      .groupBy(_._1)
    // at ks=4 the codebook quantizes coarsely: require the TOP-1 neighbor
    // in-cluster and a same-cluster majority in the top-3
    for ((q, nns) <- got) {
      val top1 = nns.minBy(_._3)._2
      assert(top1 / 10 == q / 10, s"query $q top-1 crossed clusters: $top1")
      assert(nns.count(_._2 / 10 == q / 10) >= 2,
        s"query $q lacks same-cluster majority: ${nns.map(_._2).toSeq}")
    }
    // determinism: identical run, identical result
    val again = VectorOps.pqTopK(emb, "vec_id", "embedding",
      qs, "vec_id", "embedding", k = 3, m = 2, ks = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val first = VectorOps.pqTopK(emb, "vec_id", "embedding",
      qs, "vec_id", "embedding", k = 3, m = 2, ks = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(again == first)
    // lloyd iterations keep the pipeline green (codebook refits)
    val refit = VectorOps.pqTopK(emb, "vec_id", "embedding",
      qs, "vec_id", "embedding", k = 3, m = 2, ks = 4, lloydIters = 2)
      .collect()
    assert(refit.length == got.size * 3)
  }

  test("ivfPqTopK: probing more lists never lowers the best-candidate sim") {
    val qs = emb.filter(col("vec_id") % 50 === 0)
    def top1(nProbe: Int): Map[Long, Double] =
      VectorOps.ivfPqTopK(emb, "vec_id", "embedding", qs, "vec_id",
        "embedding", k = 1, nLists = 8, nProbe = nProbe)
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val p1 = top1(1); val p4 = top1(4); val p8 = top1(8)
    // candidate sets grow monotonically with nProbe, so the best ADC sim
    // can only improve (ties allowed); every query must appear at full probe
    assert(p8.keySet == qs.collect().map(_.getLong(0)).toSet)
    for ((q, s1) <- p1) assert(p4.getOrElse(q, Double.MinValue) >= s1 - 1e-9,
      s"query $q: nProbe=4 sim regressed")
    for ((q, s4) <- p4) assert(p8.getOrElse(q, Double.MinValue) >= s4 - 1e-9,
      s"query $q: nProbe=8 sim regressed")
    // deterministic across runs
    assert(top1(4) == p4)
  }

  test("ivfSave/ivfServe: served results equal inline ivfTopK; scan is partition-pruned") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    val qs = emb.filter(col("vec_id") % 50 === 0)
    VectorOps.ivfSave(emb, "vec_id", "embedding", dir,
      nLists = 8, lloydIters = 2)
    val served = VectorOps.ivfServe(spark, dir, qs, "vec_id", "embedding",
      k = 3, nProbe = 2)
    val inline = VectorOps.ivfTopK(emb, "vec_id", "embedding", qs,
      "vec_id", "embedding", k = 3, nLists = 8, nProbe = 2, lloydIters = 2)
    val a = served.collect().map(_.toSeq).sortBy(_.toString)
    val b = inline.collect().map(_.toSeq).sortBy(_.toString)
    assert(a.toSeq == b.toSeq)
    // the index read prunes to the probed lists at PLANNING time
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [list"),
      s"probe filter must be a partition filter:\n$plan")
  }

  test("retrievalEval: hand-computed MRR and nDCG on a planted ranking") {
    import spark.implicits._
    // query 0 at the origin-ish; neighbors engineered so the cosine order
    // is 1, 2, 3 (monotonically farther); labels make ranks 1 and 3
    // relevant -> MRR = 1, DCG = 1/log2(2) + 1/log2(4) = 1.5,
    // R = 2 relevant in corpus -> IDCG = 1/log2(2) + 1/log2(3)
    val rows = Seq(
      (0L, Array(1f, 0f), 7),
      (1L, Array(0.99f, 0.1f), 7), // rank 1, relevant
      (2L, Array(0.9f, 0.3f), 8), // rank 2, not
      (3L, Array(0.7f, 0.7f), 7) // rank 3, relevant
    ).toDF("vec_id", "embedding", "label")
    val got = VectorOps.retrievalEval(rows, "vec_id", "embedding", "label",
      rows.filter(col("vec_id") === 0), k = 3).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(0) == 0L && r.getLong(1) == 2L && r.getLong(2) == 2L)
    assert(r.getDouble(3) == 1.0)
    val idcg = 1.0 + 1.0 / (math.log(3.0) / math.log(2.0))
    val q6 = (x: Double) =>
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(4) == q6(1.5 / idcg))
  }

  test("retrievalEval: no relevant docs -> mrr 0 and ndcg 0") {
    import spark.implicits._
    val rows = Seq(
      (0L, Array(1f, 0f), 1),
      (1L, Array(0.9f, 0.1f), 2),
      (2L, Array(0.8f, 0.2f), 3)
    ).toDF("vec_id", "embedding", "label")
    val r = VectorOps.retrievalEval(rows, "vec_id", "embedding", "label",
      rows.filter(col("vec_id") === 0), k = 2).head()
    assert(r.getLong(1) == 0L && r.getLong(2) == 0L)
    assert(r.getDouble(3) == 0.0 && r.getDouble(4) == 0.0)
  }

  test("kCenterGreedy: matches the brute-force farthest-point trajectory") {
    import spark.implicits._
    val pts = Seq(0.0, 1.0, 2.0, 100.0, 101.0, 50.0)
    val df = pts.zipWithIndex
      .map { case (x, i) => (i.toLong, Array(x.toFloat, 1f)) }
      .toDF("vec_id", "embedding")
    val got = VectorOps.kCenterGreedy(df, "vec_id", "embedding", 4)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    // brute-force replay with the same md5 seed, distance quantization,
    // incremental min, and (mind desc, id asc) argmax
    val md = java.security.MessageDigest.getInstance("MD5")
    def q6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val vs = pts.map(x => Array(x.toFloat.toDouble, 1.0)).toArray
    def sq(a: Array[Double]) = a.map(x => x * x).sum
    def d6(a: Array[Double], b: Array[Double]) =
      q6(sq(a) + sq(b) - 2.0 * a.zip(b).map { case (x, y) => x * y }.sum)
    val seed = vs.indices
      .minBy(i => (graft.llm.DedupOps.md5Lower63Jvm(md, s"kc:$i"), i))
    var mind = vs.indices.map(i => d6(vs(i), vs(seed))).toArray
    val expect = scala.collection.mutable.ArrayBuffer(
      (1, seed.toLong, 0.0))
    for (r <- 2 to 4) {
      val pick = vs.indices.minBy(i => (-mind(i), i))
      expect += ((r, pick.toLong, mind(pick)))
      mind = vs.indices.map(i => math.min(mind(i), d6(vs(i), vs(pick))))
        .toArray
    }
    assert(got.toSeq == expect.toSeq)
    // covering-radius trajectory is non-increasing after the seed
    val ds = got.drop(1).map(_._3)
    assert(ds.zip(ds.tail).forall { case (a, b) => b <= a })
    // the two far clusters are covered within the first three picks
    val first3 = got.take(3).map(_._2).toSet
    assert(first3.exists(i => pts(i.toInt) <= 2.0) &&
      first3.exists(i => pts(i.toInt) >= 100.0))
  }

  test("vector-table broadcast guard budgets BYTES, not rows (dim-aware)") {
    import spark.implicits._
    def vecsOf(n: Int, dim: Int) = (0 until n)
      .map(i => (i.toLong, Array.fill(dim)(1.0 / dim)))
      .toDF("id", "__v")
    def isBroadcast(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.logical.toString.contains("broadcast")
    val tight = "graft.ann.broadcastVectors.maxBytes"
    // 100 rows × dim 8 ≈ 100×(64+32) B — far under any sane budget
    assert(isBroadcast(VectorOps.maybeBroadcastVecs(vecsOf(100, 8))))
    // same ROW count at a huge dim must NOT broadcast once the byte
    // estimate crosses the budget: 100 × (1536×8 + 32) ≈ 1.2 MB > 1 MB
    spark.conf.set(tight, (1L << 20).toString)
    try {
      assert(!isBroadcast(VectorOps.maybeBroadcastVecs(vecsOf(100, 1536))))
      // and a low-dim table of MORE rows still fits the same budget:
      // 2000 × (8×8 + 32) ≈ 192 KB < 1 MB
      assert(isBroadcast(VectorOps.maybeBroadcastVecs(vecsOf(2000, 8))))
    } finally spark.conf.unset(tight)
  }

  test("graphSave/graphServe: served results equal inline graphSearchTopK; graph read is partition-pruned") {
    val dir = java.nio.file.Files.createTempDirectory("graft_gidx").toString
    val qs = emb.filter(col("vec_id") % 50 === 0)
    VectorOps.graphSave(emb, "vec_id", "embedding", dir,
      k = 5, iters = 2, maxRev = 10, sample = 8)
    val served = VectorOps.graphServe(spark, dir, qs, "vec_id", "embedding",
      k = 5, beam = 10, rounds = 2, entries = 8)
    val g = VectorOps.knnGraph(emb, "vec_id", "embedding",
        k = 5, iters = 2, maxRev = 10, sample = 8)
      .select(col("src"), col("nn_id").as("nbr"))
    val inline = VectorOps.graphSearchTopK(emb, "vec_id", "embedding", g,
      qs, "vec_id", "embedding", k = 5, beam = 10, rounds = 2, entries = 8)
    val a = served.collect().map(_.toSeq).sortBy(_.toString)
    val b = inline.collect().map(_.toSeq).sortBy(_.toString)
    assert(a.toSeq == b.toSeq)
    // ADVICE r16: the fused dense_rank+lag beam dedup equals
    // dropDuplicates+row_number ONLY while duplicate (query_id, id) beam
    // rows carry bitwise-identical sims (deterministic dots over stored
    // vectors). Pin the consequence: a determinism regression would emit
    // duplicate nn_ids in the final top-k — fail here, not silently.
    for (rows <- Seq(a, b)) {
      val pairs = rows.map(r => (r(0), r(1))).toSeq
      assert(pairs.distinct.size == pairs.size,
        s"duplicate (query_id, nn_id) in graph top-k: $pairs")
    }
    // each round's adjacency read prunes to the frontier's partitions at
    // PLANNING time (the saved graph is partitioned by pmod(src, nParts));
    // asserted on the exact read graphServe issues — the served result's
    // own plan starts at a localCheckpoint RDD, hiding the scans
    val pruned = VectorOps.graphEdgesForParts(spark, dir, Seq(0L, 1L))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [part"),
      s"frontier filter must be a partition filter:\n$plan")
    // the VECTORS leg prunes the same way (r15 advice: it used to
    // localCheckpoint the whole saved vectors table per serve call, so
    // only the graph side amortized) — candidate-id partitions land as a
    // PartitionFilter on the pmod(id, nParts) layout too
    val prunedV = VectorOps.graphVecsForParts(spark, dir, Seq(0L, 1L))
    val planV = prunedV.queryExecution.executedPlan.toString
    assert(planV.contains("PartitionFilters: [part"),
      s"candidate-id filter must be a partition filter:\n$planV")
    // serving takes nParts from the index's OWN meta (a caller-supplied
    // value could silently prune the wrong partitions): a build with a
    // non-default layout must serve identically with no layout parameter
    val dir8 = java.nio.file.Files.createTempDirectory("graft_gidx8").toString
    VectorOps.graphSave(emb, "vec_id", "embedding", dir8,
      k = 5, iters = 2, maxRev = 10, sample = 8, nParts = 8)
    val served8 = VectorOps.graphServe(spark, dir8, qs, "vec_id", "embedding",
      k = 5, beam = 10, rounds = 2, entries = 8)
    assert(served8.collect().map(_.toSeq).sortBy(_.toString).toSeq == b.toSeq)
    // entry pool is a build fact too: over-asking must fail loudly, not
    // silently serve a different search than inline
    val e = intercept[IllegalArgumentException] {
      VectorOps.graphServe(spark, dir8, qs, "vec_id", "embedding",
        k = 5, beam = 200, rounds = 1, entries = 100)
    }
    assert(e.getMessage.contains("entry candidates"))
  }

  test("graphUpsert: incremental insert == rebuild on vectors+entry, touched-partition-only graph writes, served recall holds") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    // --- write surface: a TINY arrival batch (3 docs, the daily-increment
    // shape) must rewrite only the partitions its new/touched nodes map to
    def dirState(p: String): Map[String, (Long, Long)] =
      Files.walk(Paths.get(p)).iterator.asScala.filter(Files.isRegularFile(_))
        .map(f => f.toString ->
          (Files.size(f), Files.getLastModifiedTime(f).toMillis)).toMap
    val dirT = Files.createTempDirectory("graft_gup_t").toString
    VectorOps.graphSave(emb.filter(col("vec_id") >= 3), "vec_id",
      "embedding", dirT, k = 5, iters = 2, maxRev = 10, sample = 8)
    val beforeT = dirState(s"$dirT/graph")
    val touched = VectorOps.graphUpsert(spark, dirT,
      emb.filter(col("vec_id") < 3), "vec_id", "embedding")
    assert(touched.nonEmpty && touched.size < 32,
      s"expected a partial rewrite, got ${touched.size}/32 partitions")
    val untouchedFiles = beforeT.filter { case (f, _) =>
      !touched.exists(p => f.contains(s"part=$p/")) }
    assert(untouchedFiles.nonEmpty)
    val afterT = dirState(s"$dirT/graph")
    untouchedFiles.foreach { case (f, st) =>
      assert(afterT.get(f).contains(st), s"untouched partition file changed: $f")
    }
    // --- a LARGER batch (100 of 500) for the quality/equality claims
    val old = emb.filter(col("vec_id") >= 100)   // 400 docs
    val fresh = emb.filter(col("vec_id") < 100)  // 100 new arrivals
    val dir = Files.createTempDirectory("graft_gup").toString
    VectorOps.graphSave(old, "vec_id", "embedding", dir,
      k = 5, iters = 2, maxRev = 10, sample = 8)
    VectorOps.graphUpsert(spark, dir, fresh, "vec_id", "embedding")
    // vectors + entry are REBUILD-IDENTICAL (same normalize over the same
    // union corpus; entry = md5-lowest pool, and the old pool already
    // contains the old corpus's lowest candidates)
    val rebuilt = Files.createTempDirectory("graft_gup_rb").toString
    VectorOps.graphSave(emb.filter(col("vec_id") < 500), "vec_id",
      "embedding", rebuilt, k = 5, iters = 2, maxRev = 10, sample = 8)
    def table(p: String, cols: String*): Seq[String] =
      spark.read.parquet(p).select(cols.map(col): _*)
        .collect().map(_.toSeq.toString).sorted.toSeq
    assert(table(s"$dir/vectors", "id", "vec")
      == table(s"$rebuilt/vectors", "id", "vec"))
    assert(table(s"$dir/entry", "id", "__e")
      == table(s"$rebuilt/entry", "id", "__e"))
    // every new node got a full top-k adjacency
    val newAdj = spark.read.parquet(s"$dir/graph")
      .filter(col("src") < 100)
    assert(newAdj.select("src").distinct().count() == 100)
    assert(newAdj.groupBy("src").count().filter(col("count") =!= 5)
      .count() == 0)
    // serving the upserted index: recall for the NEW vectors against the
    // union-corpus ground truth within noise of serving the full rebuild
    // (both are coverage-bound beams over near-identical graphs)
    val exact = VectorOps.bruteTopK(emb.filter(col("vec_id") < 500),
      "vec_id", "embedding", fresh, "vec_id", "embedding", k = 5)
    def recallOn(p: String): Double =
      VectorOps.recallAtK(
        VectorOps.graphServe(spark, p, fresh, "vec_id", "embedding",
          k = 5, beam = 12, rounds = 3, entries = 8), exact)
        .head().getAs[Double]("recall")
    val rUp = recallOn(dir); val rRb = recallOn(rebuilt)
    assert(rUp >= rRb - 0.1, s"upsert recall $rUp << rebuild recall $rRb")
    assert(rUp > 0.2, s"upsert recall $rUp too low")
    // new nodes are RETRIEVABLE for old queries (reverse edges landed)
    val oldQ = VectorOps.graphServe(spark, dir,
      emb.filter(col("vec_id") % 25 === 0 && col("vec_id") >= 100),
      "vec_id", "embedding", k = 5, beam = 12, rounds = 3, entries = 8)
    assert(oldQ.filter(col("nn_id") < 100).count() > 0,
      "no old query ever retrieved a new node")
    // inserting an existing id must refuse, not corrupt
    val e = intercept[IllegalArgumentException] {
      VectorOps.graphUpsert(spark, dir,
        emb.filter(col("vec_id") === 200), "vec_id", "embedding")
    }
    assert(e.getMessage.contains("already exist"))
    // ...and so must an id duplicated WITHIN the arrival batch (it would
    // append two vector rows for one id just as silently)
    val dup = emb.filter(col("vec_id") === 0)
      .select((col("vec_id") + 90000).as("vec_id"), col("embedding"))
    val e2 = intercept[IllegalArgumentException] {
      VectorOps.graphUpsert(spark, dir, dup.unionAll(dup),
        "vec_id", "embedding")
    }
    assert(e2.getMessage.contains("duplicate ids"))
  }

  test("broadcast guard: null-first vector table doesn't throw; legacy maxRows knob honored") {
    import spark.implicits._
    def isBroadcast(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.logical.toString.contains("broadcast")
    // dim probe must skip null vectors (size(null) is null → getInt threw)
    val withNull = Seq((0L, Option.empty[Array[Double]]),
      (1L, Some(Array(1d, 0d)))).toDF("id", "__v")
    assert(isBroadcast(VectorOps.maybeBroadcastVecs(withNull)))
    val allNull = Seq((0L, Option.empty[Array[Double]])).toDF("id", "__v")
    assert(isBroadcast(VectorOps.maybeBroadcastVecs(allNull)))
    // a deployment that tuned the pre-r14 row cap must still be honored
    val knob = "graft.ann.broadcastVectors.maxRows"
    spark.conf.set(knob, "1")
    try {
      val two = Seq((0L, Array(1d, 0d)), (1L, Array(0d, 1d))).toDF("id", "__v")
      assert(!isBroadcast(VectorOps.maybeBroadcastVecs(two)))
      assert(isBroadcast(VectorOps.maybeBroadcastVecs(two.limit(1))))
    } finally spark.conf.unset(knob)
  }
}
