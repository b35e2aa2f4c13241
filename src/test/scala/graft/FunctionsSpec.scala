package graft

import graft.functions.{DotProduct, HashAggs}
import org.apache.spark.sql.functions._

/** Custom Catalyst pieces: MinHashAgg / SimHashAgg / DotProduct. */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("md5Lower63 reproduces DuckDB md5_number_lower & (2^63-1) bit-for-bit") {
    // expected values computed with DuckDB:
    //   SELECT md5_number_lower(s) & 9223372036854775807
    val cases = Seq(
      "a" -> 7000413967451013937L,
      "0:hello world foo" -> 472746949817357672L,
      "31:the quick brown" -> 8406793302262891031L)
    val df = cases.map(_._1).toDF("s")
    val got = df.select(graft.llm.DedupOps.md5Lower63($"s")).collect()
      .map(_.getLong(0)).toSeq
    assert(got == cases.map(_._2))
  }

  test("Md5Hash.lower63 (JVM twin) matches the same DuckDB constants") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(s: String) = graft.functions.Md5Hash.lower63(md,
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(h("a") == 7000413967451013937L)
    assert(h("0:hello world foo") == 472746949817357672L)
    assert(h("31:the quick brown") == 8406793302262891031L)
  }

  test("DotProduct matches the HOF formulation and handles nulls") {
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(0.0, 0.0), Seq(1.0, 1.0))).toDF("a", "b")
    val got = df.select(DotProduct($"a", $"b")).collect().map(_.getDouble(0))
    assert(got.toSeq == Seq(32.0, 0.0))
    val hof = df.select(
      aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0d), (s, v) => s + v))
      .collect().map(_.getDouble(0))
    assert(got.toSeq == hof.toSeq)
    assert(df.select(DotProduct(lit(null).cast("array<double>"), $"b"))
      .head().isNullAt(0))
  }

  test("MinHashAgg: identical shingle sets give identical signatures; partial-merge safe") {
    val a = Seq.tabulate(50)(i => ("d1", s"sh$i")) ++
      Seq.tabulate(50)(i => ("d2", s"sh${i + 25}"))
    val df = a.toDF("doc", "sh").repartition(4) // force partial+merge path
    val sigs = df.groupBy("doc").agg(HashAggs.minhash($"sh", 16).as("sig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(sigs("d1").length == 16)
    // re-run gives identical signatures (determinism across partitioning)
    val sigs2 = a.toDF("doc", "sh").repartition(7).groupBy("doc")
      .agg(HashAggs.minhash($"sh", 16).as("sig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(sigs == sigs2)
    // overlapping sets share some minima, disjoint parts differ
    assert(sigs("d1") != sigs("d2"))
  }

  test("SimHashAgg: similar token sets have low Hamming distance") {
    val base = (0 until 60).map(i => s"tok$i")
    val df = (base.map(("d1", _)) ++ (base.drop(2) ++ Seq("x", "y")).map(("d2", _)) ++
      (0 until 60).map(i => ("d3", s"other$i"))).toDF("doc", "tok")
    val sigs = df.groupBy("doc").agg(HashAggs.simhash($"tok").as("sig"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs("d1"), sigs("d2")) < ham(sigs("d1"), sigs("d3")))
  }

  test("clusters: hash-min label propagation finds connected components") {
    // components: {1,2,3,4} (chain), {10,11,12} (triangle), {20,21} (pair)
    val pairs = Seq((2L, 1L), (2L, 3L), (4L, 3L),
      (10L, 11L), (11L, 12L), (12L, 10L), (21L, 20L)).toDF("id_a", "id_b")
    val got = graft.llm.DedupOps.clusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("clusters: long chain converges (diameter-bound iterations)") {
    val pairs = (0L until 15L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = graft.llm.DedupOps.clusters(pairs, maxIter = 20)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 16 && got.values.forall(_ == 0L))
  }

  test("clusters FAILS LOUDLY past maxIter; clustersLogD handles the same chain in O(log d)") {
    // a 150-edge chain: hash-min moves the min ONE hop per round, so
    // maxIter=20 cannot converge — silent wrong labels would be a dedup
    // disaster; the error must point at the O(log d) alternative
    val chain = (0L until 150L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val e = intercept[IllegalStateException] {
      graft.llm.DedupOps.clusters(chain, maxIter = 20).collect()
    }
    assert(e.getMessage.contains("clustersLogD"))
    val logd = graft.llm.DedupOps.clustersLogD(chain, maxIter = 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(logd.size == 151 && logd.values.forall(_ == 0L))
  }

  test("clustersLogD matches clusters on a random multi-component graph") {
    val rnd = new scala.util.Random(11)
    // ~8 components of ~12 nodes with random intra-component edges
    val pairs = (0 until 8).flatMap { c =>
      val base = c * 100L
      (0 until 18).map { _ =>
        (base + rnd.nextInt(12), base + rnd.nextInt(12))
      }
    }.filter { case (a, b) => a != b }.toDF("id_a", "id_b")
    def m(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(graft.llm.DedupOps.clustersLogD(pairs)) ==
      m(graft.llm.DedupOps.clusters(pairs)))
  }

  test("BoundedTopK matches a brute-force reference on random data (nulls, ties, dirs)") {
    import graft.functions.BoundedTopK
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(97)
    for (trial <- 1 to 6) {
      val n = 1 + rnd.nextInt(4)
      val asc0 = rnd.nextBoolean(); val asc1 = rnd.nextBoolean()
      // small key domain forces ties; ~15% nulls in the first key
      val rows = Seq.tabulate(120) { i =>
        (i.toLong,
          if (rnd.nextInt(7) == 0) None else Some(rnd.nextInt(5).toLong),
          rnd.nextInt(4).toLong)
      }
      val df = rows.toDF("id", "k0", "k1").coalesce(1)
      val packed = struct(col("k0").as("a"), col("k1").as("b"), col("id").as("out"))
      val got = df.agg(BoundedTopK.sortedTopK(packed, Seq(asc0, asc1), n).as("t"))
        .select(transform(col("t"), _.getField("out")).as("ids"))
        .head().getSeq[Long](0).toList
      // reference: stable sort with Mongo's null rule (nulls first asc,
      // last desc), take n
      def keyOrd(v: Option[Long], asc: Boolean): (Int, Long) =
        v match {
          case None    => (if (asc) 0 else 2, 0L)
          case Some(x) => (1, if (asc) x else -x)
        }
      val want = rows.sortBy { case (_, k0, k1) =>
        (keyOrd(k0, asc0), keyOrd(Some(k1), asc1)) }.take(n).map(_._1).toList
      assert(got == want, s"trial $trial n=$n asc=($asc0,$asc1)")
      // window form over a growing frame: per-row prefix top-n
      val w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val gotW = df.select(col("id"),
        transform(BoundedTopK.sortedTopK(packed, Seq(asc0, asc1), n).over(w),
          _.getField("out")).as("ids"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
      rows.indices.foreach { i =>
        val prefix = rows.take(i + 1)
        val wantP = prefix.sortBy { case (_, k0, k1) =>
          (keyOrd(k0, asc0), keyOrd(Some(k1), asc1)) }.take(n).map(_._1).toList
        assert(gotW(i.toLong) == wantP, s"trial $trial row $i")
      }
    }
  }

  test("BoundedTopK first/last modes keep arrival order with bounded state") {
    import graft.functions.BoundedTopK
    val df = (1L to 50L).toDF("id").coalesce(1)
    val packed = struct(col("id").as("out"))
    def ids(c: org.apache.spark.sql.Column) =
      df.agg(c.as("t")).select(transform(col("t"), _.getField("out")))
        .head().getSeq[Long](0).toList
    assert(ids(BoundedTopK.firstN(packed, 3)) == List(1L, 2L, 3L))
    assert(ids(BoundedTopK.lastN(packed, 3)) == List(48L, 49L, 50L))
  }

  test("NfcNormalize composes decomposed codepoints; normalizeText cleans controls/whitespace") {
    import graft.functions.NfcNormalize
    val decomposed = "cafe\u0301"  // e + COMBINING ACUTE (5 code points)
    val composed = "caf\u00e9"     // precomposed e-acute (4 code points)
    val df = Seq(("d", decomposed), ("c", composed), ("a", "plain"),
      ("n", null)).toDF("k", "s")
    val out = df.select(col("k"), NfcNormalize(col("s")).as("n"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out("d") == Some(composed))
    assert(out("d") == out("c"))
    assert(out("a") == Some("plain"))
    assert(out("n").isEmpty) // null propagates
    // full cleanup: NFC + control strip + whitespace collapse + trim
    val norm = Seq(("  a\t be\u0301 \u0007  c\r\n ")).toDF("s")
      .select(graft.llm.TextOps.normalizeText(col("s"))).head().getString(0)
    assert(norm == "a b\u00e9 c") // BEL gone, runs collapsed, NFC composed, trimmed
  }

  test("readability: hand-computed syllables, sentences, Flesch scores") {
    // "the quick brown fox jumps. it runs away!" -> 8 words, 2 sentences
    // syllables: the(1) quick(1: ui run) brown(1) fox(1) jumps.(1: u)
    //   it(1) runs(1) away!(2: a, ay) = 9
    val df = Seq((1L, "the quick brown fox jumps. it runs away!"),
      (2L, "")).toDF("doc_id", "text")
    val got = graft.llm.TextOps.readability(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = got(1L)
    assert(r1.getInt(1) == 8 && r1.getInt(2) == 2 && r1.getLong(3) == 9)
    def q4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r1.getDouble(4) == q4(206.835 - 1.015 * (8.0 / 2) - 84.6 * (9.0 / 8)))
    assert(r1.getDouble(5) == q4(0.39 * (8.0 / 2) + 11.8 * (9.0 / 8) - 15.59))
    // empty doc: zero words, NULL scores, sentence floor at 1
    val r2 = got(2L)
    assert(r2.getInt(1) == 0 && r2.getInt(2) == 1 && r2.getLong(3) == 0)
    assert(r2.isNullAt(4) && r2.isNullAt(5))
  }

  test("dedupIncremental: exact, near, and keep verdicts against a reference index") {
    val ref = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "completely different reference content about databases here"),
      (3L, "another unrelated reference doc with its own words")
    ).toDF("doc_id", "text")
    val fresh = Seq(
      // exact copy of ref 1 -> exact_dup AND near_dup (identical buckets)
      (10L, "the quick brown fox jumps over the lazy dog today"),
      // near copy of ref 1 (one word changed) -> near only
      (11L, "the quick brown fox jumps over the lazy cat today"),
      // novel text -> keep
      (12L, "entirely novel text that matches nothing in the index"),
      // exact dup WITHIN the new shard only -> both keep (ref unseen)
      (13L, "twin text inside the new shard"),
      (14L, "twin text inside the new shard")
    ).toDF("doc_id", "text")
    val got = graft.llm.DedupOps.dedupIncremental(fresh, ref, "text",
        "doc_id", shingleK = 3, bands = 8, rowsPerBand = 4, threshold = 0.4)
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getBoolean(2), r.getBoolean(3)))).toMap
    assert(got(10L) == ((true, true, false)))
    assert(got(11L) == ((false, true, false)))
    assert(got(12L) == ((false, false, true)))
    assert(got(13L) == ((false, false, true)))
    assert(got(14L) == ((false, false, true)))
  }

  test("leakageSplit: clusters never straddle splits; counts partition the corpus") {
    // 20 unique docs + 3 exact-dup families + near-dup pair (shared text
    // prefix) \u2014 enough dup pairs that SOME naive assignment differs
    val uniq = (0L until 20L).map(i =>
      (i, s"unique document number $i with filler words alpha beta $i"))
    val dups = Seq(
      (100L, "the same exact text family one"),
      (101L, "the same exact text family one"),
      (102L, "the same exact text family one"),
      (200L, "another duplicated body of text two"),
      (201L, "another duplicated body of text two"),
      (300L, "third family shares every token here"),
      (301L, "third family shares every token here"))
    val df = (uniq ++ dups).toDF("doc_id", "text")
    val got = graft.llm.DedupOps.leakageSplit(df, "text", "doc_id",
      shingleK = 3, bands = 8, rowsPerBand = 4, threshold = 0.4).collect()
    val total = df.count()
    assert(got.map(_.getLong(1)).sum == total) // safe counts partition
    assert(got.map(_.getLong(2)).sum == total) // naive counts partition
    // the verdict: cluster-keyed split leaks ZERO dup pairs
    assert(got.forall(_.getLong(4) == 0L))
    // all rows carry the same corpus-wide leak counters
    assert(got.map(r => (r.getLong(3), r.getLong(4))).distinct.length == 1)
  }
}
