package graft

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
}
