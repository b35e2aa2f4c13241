package graft

import graft.sources.InMemoryStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** `$merge`/`$out`/`$delete`/`$send`/`$delay`/`$probe`/`$per` semantics
  * (TestMerge/TestOut/TestDelete/TestSend/TestDelay/TestProbe/TestPer). */
class SinksSpec extends SparkSpec {
  import spark.implicits._

  private def store = new InMemoryStore(spark)

  private def mkPipe(st: InMemoryStore,
      sent: scala.collection.mutable.Buffer[DataFrame] =
        scala.collection.mutable.Buffer.empty): Pipeline =
    new Pipeline(store = st, producer = df => { sent += df; df.count(); () })

  test("$merge whenMatched=merge upserts and echoes written docs") {
    val st = store
    st.overwrite("c", Seq(("1", 10L), ("2", 20L)).toDF("_id", "v"))
    val in = Seq(("2", 99L), ("3", 30L)).toDF("_id", "v")
    val echo = mkPipe(st).run(in, """[{"$merge": {"into": "c"}}]""")
    assert(rows(echo) == Set(List("2", 99L), List("3", 30L)))
    assert(rows(st.read("c")) ==
      Set(List("1", 10L), List("2", 99L), List("3", 30L)))
  }

  test("$merge whenMatched=keepExisting keeps target values") {
    val st = store
    st.overwrite("c", Seq(("1", 10L)).toDF("_id", "v"))
    val echo = mkPipe(st).run(Seq(("1", 99L)).toDF("_id", "v"),
      """[{"$merge": {"into": "c", "whenMatched": "keepExisting"}}]""")
    assert(rows(st.read("c")) == Set(List("1", 10L)))
    assert(rows(echo) == Set(List("1", 10L))) // echo = what was kept
  }

  test("$merge whenNotMatched=discard drops unmatched inserts") {
    val st = store
    st.overwrite("c", Seq(("1", 10L)).toDF("_id", "v"))
    val echo = mkPipe(st).run(Seq(("1", 11L), ("2", 22L)).toDF("_id", "v"),
      """[{"$merge": {"into": "c", "whenNotMatched": "discard"}}]""")
    assert(rows(st.read("c")) == Set(List("1", 11L)))
    assert(rows(echo) == Set(List("1", 11L)))
  }

  test("$merge compound on + key expression (TestMerge compound)") {
    val st = store
    st.overwrite("c", Seq(("x", "a", "b", 1L)).toDF("_id", "f1", "f2", "test"))
    val in = Seq(("a", "b", 7L)).toDF("f1", "f2", "test")
    val echo = mkPipe(st).run(in,
      """[{"$merge": {"into": "c", "on": ["f1", "f2"],
                      "key": {"f1": "$f1", "f2": "$f2"}}}]""")
    assert(st.read("c").count() == 1)
    assert(st.read("c").select("test").head().getLong(0) == 7L)
    assert(echo.count() == 1)
  }

  test("$merge collapses duplicate on-keys within a batch (sequential-write semantics)") {
    val st = store
    st.overwrite("c", Seq(("1", 10L)).toDF("_id", "v"))
    // DISTINCT values for the duplicated key: the reference applies messages
    // sequentially, so the LAST write must win — deterministically, not
    // whichever dropDuplicates happened to keep
    mkPipe(st).run(
      Seq(("1", 41L), ("1", 77L), ("2", 5L)).toDF("_id", "v").coalesce(1),
      """[{"$merge": {"into": "c"}}]""")
    assert(st.read("c").count() == 2) // no duplicate target rows
    assert(st.read("c").filter($"_id" === "1").select("v").head().getLong(0) == 77L)
  }

  test("$merge missing on-field fails") {
    val st = store
    st.overwrite("c", Seq(("1", 10L)).toDF("_id", "v"))
    intercept[IllegalStateException] {
      mkPipe(st).run(Seq((null.asInstanceOf[String], 5L)).toDF("_id", "v"),
        """[{"$merge": {"into": "c"}}]""")
    }
  }

  test("$merge whenMatched=fail raises on a match") {
    val st = store
    st.overwrite("c", Seq(("1", 10L)).toDF("_id", "v"))
    intercept[Exception] {
      mkPipe(st).run(Seq(("1", 99L)).toDF("_id", "v"),
        """[{"$merge": {"into": "c", "whenMatched": "fail"}}]""")
    }
  }

  test("$out replaces matched docs wholesale") {
    val st = store
    st.overwrite("c", Seq(("1", 10L), ("9", 90L)).toDF("_id", "v"))
    mkPipe(st).run(Seq(("1", 11L), ("2", 22L)).toDF("_id", "v"),
      """[{"$out": {"into": "c"}}]""")
    assert(rows(st.read("c")) ==
      Set(List("1", 11L), List("2", 22L), List("9", 90L)))
  }

  test("$delete removes matching docs, drops field-less messages") {
    val st = store
    st.overwrite("c", Seq(("1", 10L), ("2", 20L), ("3", 30L)).toDF("_id", "v"))
    val in = Seq(Some("2"), None).map(x => (x.orNull, 0L)).toDF("_id", "x")
    val out = mkPipe(st).run(in, """[{"$delete": {"from": "c"}}]""")
    assert(out.count() == 1) // null-_id message dropped
    assert(rows(st.read("c")) == Set(List("1", 10L), List("3", 30L)))
  }

  test("$send consumes messages with string topics") {
    val st = store
    val sent = scala.collection.mutable.Buffer.empty[DataFrame]
    val in = Seq(("0", "t1"), ("1", null.asInstanceOf[String])).toDF("_id", "top")
    val out = mkPipe(st, sent).run(in, """[{"$send": {"topic": "$top"}}]""")
    assert(out.count() == 1) // null topic passes through
    assert(sent.size == 1 && sent.head.select("__topic").head().getString(0) == "t1")
  }

  test("$send non-string topic expression passes everything through") {
    val sent = scala.collection.mutable.Buffer.empty[DataFrame]
    val out = mkPipe(store, sent).run(Seq(("0", 5L)).toDF("_id", "n"),
      """[{"$send": {"topic": "$n"}}]""")
    assert(out.count() == 1 && sent.isEmpty)
  }

  test("$delay schedules to a retry topic with deliverAt") {
    val sent = scala.collection.mutable.Buffer.empty[DataFrame]
    val out = mkPipe(store, sent).run(Seq(("0", 1000L)).toDF("_id", "d"),
      """[{"$delay": {"duration": "$d", "topic": "later"}}]""")
    assert(out.count() == 0)
    assert(sent.head.columns.contains("__deliverAt"))
  }

  test("$probe emits {name, minute, count} and passes through") {
    val sent = scala.collection.mutable.Buffer.empty[DataFrame]
    val out = mkPipe(store, sent).run(Seq(("0", 1L), ("1", 2L)).toDF("_id", "v"),
      """[{"$probe": {"name": "p", "topic": "monitor"}}]""")
    assert(out.count() == 2)
    val p = sent.head.select("name", "count").head()
    assert(p.getString(0) == "p" && p.getLong(1) == 2L)
  }

  test("$per batches per partition, emits arrays under `as`") {
    val df = (1L to 10L).map(i => (i.toString, i)).toDF("_id", "v")
      .repartition(2)
    val out = pipeline.run(df, """[{"$per": {"amount": 3, "as": "batch"}}]""")
    val sizes = out.select(size($"batch")).collect().map(_.getInt(0))
    assert(sizes.sum == 10 && sizes.forall(_ <= 3))
  }
}
