package graft

import graft.dynamic.DynJson
import graft.sources.BucketedParquetStore
import org.apache.spark.sql.functions._

/** Incremental bucketed DocumentStore: a batch rewrites ONLY the buckets it
  * touches (VERDICT round 2 "Next round" #2). */
class BucketedStoreSpec extends SparkSpec {
  import spark.implicits._

  private def mkStore(n: Int = 8): (BucketedParquetStore, String) = {
    val dir = java.nio.file.Files.createTempDirectory("graft_bstore").toString
    (new BucketedParquetStore(spark, dir, n), dir)
  }

  private def gens(dir: String, name: String): Seq[String] =
    new java.io.File(s"$dir/$name").listFiles().map(_.getName).sorted.toSeq

  private def bucketsOf(dir: String, name: String, gen: String): Set[Int] =
    new java.io.File(s"$dir/$name/$gen").listFiles().filter(_.isDirectory)
      .map(_.getName.stripPrefix("__bucket=").toInt).toSet

  test("seed + read round-trips; merge rewrites a strict subset of buckets") {
    val (st, dir) = mkStore()
    val base = (1L to 1000L).map(i => (i.toString, i)).toDF("_id", "v")
    st.seed("c", base)
    assert(st.read("c").count() == 1000)
    val seedBuckets = bucketsOf(dir, "c", "g0")
    assert(seedBuckets.size == 8) // 1000 keys hit all 8 buckets

    // a 3-key batch: at most 3 buckets rewritten
    val in = Seq(("7", 700L), ("8", 800L), ("2000", 1L)).toDF("_id", "v")
    val echo = new Pipeline(store = st).run(in, """[{"$merge": {"into": "c"}}]""")
    assert(echo.count() == 3)
    val g1Buckets = bucketsOf(dir, "c", "g1")
    assert(g1Buckets.size <= 3, s"expected <=3 buckets, got $g1Buckets")
    assert(g1Buckets.subsetOf(seedBuckets))
    // contents: upserted + inserted + untouched
    val got = st.read("c")
    assert(got.count() == 1001)
    assert(got.filter(col("_id") === "7").select("v").head().getLong(0) == 700L)
    assert(got.filter(col("_id") === "2000").select("v").head().getLong(0) == 1L)
    assert(got.filter(col("_id") === "9").select("v").head().getLong(0) == 9L)
  }

  test("generated-uuid _id insert under a non-_id on key stays incremental") {
    val (st, dir) = mkStore()
    st.seed("c",
      (1L to 100L).map(i => ("doc" + i, "k" + i, i)).toDF("_id", "f", "v"),
      on = List("f"))
    // incoming has no _id; on=f -> insert generates a uuid _id, and the row
    // buckets by f, which IS in the touched set (no append, no full rewrite)
    val in = Seq(("k7", 700L), ("kNew", 1L)).toDF("f", "v")
    new Pipeline(store = st).run(in,
      """[{"$merge": {"into": "c", "on": "f"}}]""").count()
    val got = st.read("c")
    assert(got.count() == 101)
    assert(got.filter(col("f") === "k7").select("v").head().getLong(0) == 700L)
    val newId = got.filter(col("f") === "kNew").select("_id").head().getString(0)
    assert(newId != null && newId.length == 36) // uuid
    assert(bucketsOf(dir, "c", "g1").size <= 2)
    assert(st.manifest("c").values.forall(_.size == 1)) // no merge-on-read debt
  }

  test("$delete rewrites only the buckets holding deleted keys") {
    val (st, dir) = mkStore()
    st.seed("c", (1L to 1000L).map(i => (i.toString, i)).toDF("_id", "v"))
    val in = Seq(Tuple1("17"), Tuple1("42")).toDF("_id")
    val echo = new Pipeline(store = st).run(in,
      """[{"$delete": {"from": "c"}}]""")
    assert(echo.count() == 2)
    assert(st.read("c").count() == 998)
    assert(st.read("c").filter(col("_id").isin("17", "42")).count() == 0)
    assert(bucketsOf(dir, "c", "g1").size <= 2)
  }

  test("compaction squashes generations and preserves contents") {
    val (st, _) = mkStore(4)
    st.seed("c", (1L to 50L).map(i => (i.toString, i)).toDF("_id", "v"))
    (1 to 5).foreach { r =>
      new Pipeline(store = st).run(
        Seq((r.toString, r * 1000L)).toDF("_id", "v"),
        """[{"$merge": {"into": "c"}}]""").count()
    }
    st.compact("c")
    assert(st.manifest("c").values.forall(_.size == 1))
    val got = st.read("c")
    assert(got.count() == 50)
    assert(got.filter(col("_id") === "3").select("v").head().getLong(0) == 3000L)
    assert(got.filter(col("_id") === "30").select("v").head().getLong(0) == 30L)
  }

  test("schema-evolving merge falls back to full rewrite and stays correct") {
    val (st, _) = mkStore()
    st.seed("c", Seq(("1", 10L)).toDF("_id", "v"))
    val in = Seq(("1", 11L, "extra")).toDF("_id", "v", "w")
    new Pipeline(store = st).run(in, """[{"$merge": {"into": "c"}}]""").count()
    val got = st.read("c")
    assert(got.columns.toSet == Set("_id", "v", "w"))
    assert(rows(got) == Set(List("1", 11L, "extra")))
  }

  test("bucketing requires a matching keySpec, not just matching column names") {
    val (st, _) = mkStore()
    val df = Seq(("k1", "d1")).toDF("__on", "doc")
    st.seed("dynColl", df, on = List("__on"), keySpec = "a")
    assert(st.bucketing("dynColl", List("__on"), "a").contains(8))
    assert(st.bucketing("dynColl", List("__on"), "b").isEmpty,
      "same column, different semantic key: pruning must be refused")
    assert(st.bucketing("dynColl", List("__on")).isEmpty,
      "null keySpec defaults to the column list, which differs from 'a'")
    // typed convention unchanged: no keySpec on either side still matches
    st.seed("typedColl", Seq(("x", 1L)).toDF("f", "v"), on = List("f"))
    assert(st.bucketing("typedColl", List("f")).contains(8))
  }

  test("dynamic $delete under a DIFFERENT on list than the last $merge is correct") {
    // round-12 advisor find: the stored __bucket hashes of a dynamically
    // merged collection are derived from the MERGE's on list; a $delete with
    // another on list must not prune by them (it would read/replace the
    // wrong bucket subset). The keySpec check forces the full-rewrite path.
    val st = new graft.sources.BucketedParquetStore(spark,
      java.nio.file.Files.createTempDirectory("graft_keyspec").toString, 8)
    val seedDocs = (1 to 40).map(i => s"""{"_id":"$i","a":"a$i","b":"b$i"}""")
      .toDF("doc")
    graft.dynamic.DynPipeline.run(seedDocs,
      """[{"$merge": {"into": "c", "on": "a"}}]""",
      graft.dynamic.DynPipeline.DynCtx(store = st)).count()
    assert(st.read("c").count() == 40)
    val del = Seq("""{"b":"b7"}""", """{"b":"b23"}""").toDF("doc")
    graft.dynamic.DynPipeline.run(del,
      """[{"$delete": {"from": "c", "on": "b"}}]""",
      graft.dynamic.DynPipeline.DynCtx(store = st)).count()
    val left = st.read("c").select("doc").collect()
      .map(r => DynJson.parse(r.getString(0)).path("b").textValue).toSet
    assert(left.size == 38 && !left("b7") && !left("b23"),
      s"expected b7/b23 gone and 38 rows, got ${left.size}")
    // the full rewrite re-seeded under keySpec=b, so a SAME-list delete now
    // takes the pruned bucket path again — and stays correct
    assert(st.bucketing("c", List("__on"), "b").contains(8))
    graft.dynamic.DynPipeline.run(
      Seq("""{"b":"b1"}""").toDF("doc"),
      """[{"$delete": {"from": "c", "on": "b"}}]""",
      graft.dynamic.DynPipeline.DynCtx(store = st)).count()
    assert(st.read("c").count() == 37)
  }

  test("dynamic $delete full rewrite under a MULTI-field on list re-enables pruning") {
    // round-13 advisor find: the full-rewrite path seeded the store with a
    // space-joined keySpec while every other site joins on NUL; for a
    // multi-field on list the stored spec never matched again, silently
    // disabling bucket pruning on all later same-list stages (and "a b" as
    // a single literal field name would have collided with List("a","b")).
    val st = new graft.sources.BucketedParquetStore(spark,
      java.nio.file.Files.createTempDirectory("graft_keyspec2").toString, 8)
    val seedDocs = (1 to 40).map(i => s"""{"_id":"$i","a":"a${i % 5}","b":"b$i"}""")
      .toDF("doc")
    graft.dynamic.DynPipeline.run(seedDocs,
      """[{"$merge": {"into": "c", "on": "_id"}}]""",
      graft.dynamic.DynPipeline.DynCtx(store = st)).count()
    // different on list than the merge -> full rewrite, re-seeds keySpec
    graft.dynamic.DynPipeline.run(
      Seq("""{"a":"a2","b":"b7"}""").toDF("doc"),
      """[{"$delete": {"from": "c", "on": ["a", "b"]}}]""",
      graft.dynamic.DynPipeline.DynCtx(store = st)).count()
    assert(st.read("c").count() == 39)
    // the re-seeded spec must be the NUL-joined one other sites probe with
    assert(st.bucketing("c", List("__on"), "a\u0000b").contains(8),
      "multi-field full rewrite must persist the NUL-joined keySpec")
    assert(st.bucketing("c", List("__on"), "a b").isEmpty,
      "a single field literally named \"a b\" must NOT be granted pruning")
    // and a SAME-list delete now takes the pruned path and stays correct
    graft.dynamic.DynPipeline.run(
      Seq("""{"a":"a3","b":"b13"}""").toDF("doc"),
      """[{"$delete": {"from": "c", "on": ["a", "b"]}}]""",
      graft.dynamic.DynPipeline.DynCtx(store = st)).count()
    val left = st.read("c").select("doc").collect()
      .map(r => DynJson.parse(r.getString(0)).path("b").textValue).toSet
    assert(left.size == 38 && !left("b7") && !left("b13"))
  }
}
