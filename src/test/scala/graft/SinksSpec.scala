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

  test("$merge whenMatched UPDATE PIPELINE: $set with $$new, pre-stage env, unmatched inserts untouched") {
    val st = store
    st.overwrite("c", Seq(("1", 10L, "keep"), ("2", 20L, "also"))
      .toDF("_id", "v", "tag"))
    val in = Seq(("1", 5L), ("3", 7L)).toDF("_id", "v")
    // matched doc 1: v := existing v + incoming v; n := count of updates
    val echo = mkPipe(st).run(in,
      """[{"$merge": {"into": "c", "whenMatched": [
            {"$set": {"v": {"$add": ["$v", "$$new.v"]},
                      "n": {"$add": [{"$ifNull": ["$n", 0]}, 1]}}}]}}]""")
    // matched: v=10+5=15, n=1, tag kept; unmatched insert: plain doc 3
    assert(rows(st.read("c")) == Set(
      List("1", 15L, "keep", 1L), List("2", 20L, "also", null),
      List("3", 7L, null, null)))
    assert(rows(echo) == Set(
      List("1", 15L, "keep", 1L), List("3", 7L, null, null)))
  }

  test("$merge whenMatched pipeline: $unset, $project and $replaceWith $$new forms") {
    val st = store
    st.overwrite("c", Seq(("1", 10L, "x"), ("2", 20L, "y"), ("3", 30L, "z"))
      .toDF("_id", "v", "tag"))
    // $unset drops the existing tag on match
    mkPipe(st).run(Seq(("1", 0L)).toDF("_id", "v"),
      """[{"$merge": {"into": "c", "whenMatched": [{"$unset": "tag"}]}}]""")
    assert(rows(st.read("c")).contains(List("1", 10L, null)))
    // $replaceWith $$new = whenMatched replace
    mkPipe(st).run(Seq(("2", 99L)).toDF("_id", "v"),
      """[{"$merge": {"into": "c", "whenMatched": [{"$replaceWith": "$$new"}]}}]""")
    assert(rows(st.read("c")).contains(List("2", 99L, null)))
    // $project inclusion keeps _id + listed fields only
    mkPipe(st).run(Seq(("3", 0L)).toDF("_id", "v"),
      """[{"$merge": {"into": "c", "whenMatched": [{"$project": {"v": 1}}]}}]""")
    assert(rows(st.read("c")).contains(List("3", 30L, null)))
    // unsupported stage refused loudly
    val e = intercept[IllegalArgumentException] {
      mkPipe(st).run(Seq(("1", 0L)).toDF("_id", "v"),
        """[{"$merge": {"into": "c", "whenMatched": [{"$group": {"_id": null}}]}}]""")
    }
    assert(e.getMessage.contains("unsupported stage"))
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

  test("$delay parks messages; redeliverDue pops exactly the due ones (Delay.java:40-52)") {
    val st = store
    val out = mkPipe(st).run(
      Seq(("a", 60000L, "2024-01-01 00:00:00"),
          ("b", 3600000L, "2024-01-01 00:00:00"),
          ("c", 60000L, "2024-01-01 02:00:00")).toDF("_id", "d", "at"),
      """[{"$delay": {"duration": "$d", "topic": "later",
                      "_clock": {"$toDate": "$at"}}}]""")
    assert(out.count() == 0) // all scheduled messages leave the stream
    // at 01:00: only a (00:01) and b (01:00) are due; c (02:01) stays parked
    val due = SinkStages.redeliverDue(st, "later",
      lit("2024-01-01 01:00:00").cast("timestamp"))
    assert(sorted1[String](due, "_id") == List("a", "b"))
    val due2 = SinkStages.redeliverDue(st, "later",
      lit("2024-01-01 03:00:00").cast("timestamp"))
    assert(sorted1[String](due2, "_id") == List("c"))
    assert(SinkStages.redeliverDue(st, "later",
      lit("2024-01-01 09:00:00").cast("timestamp")).count() == 0)
  }

  test("$delay invalid duration/topic passes through unscheduled") {
    val st = store
    val out = mkPipe(st).run(
      Seq(("a", Some(1000L)), ("b", None)).toDF("_id", "d"),
      """[{"$delay": {"duration": "$d", "topic": "later"}}]""")
    assert(sorted1[String](out, "_id") == List("b")) // null duration -> passthrough
  }

  test("$probe emits complete minutes only, passes through (Probe.java:63-78)") {
    val sent = scala.collection.mutable.Buffer.empty[DataFrame]
    val out = mkPipe(store, sent).run(
      Seq(("0", "2024-01-01 00:00:10"), ("1", "2024-01-01 00:00:50"),
          ("2", "2024-01-01 00:01:10"), ("3", "2024-01-01 00:02:05"))
        .toDF("_id", "at"),
      """[{"$probe": {"name": "p", "topic": "monitor",
                      "_clock": {"$toDate": "$at"}}}]""")
    assert(out.count() == 4) // passthrough
    // minutes 00:00 (2 msgs) and 00:01 (1 msg) are complete; 00:02 still runs
    val got = sent.head.select("name", "minute", "count").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString, r.getLong(2))).toSet
    assert(got == Set(("p", "2024-01-01 00:00:00.0", 2L),
                      ("p", "2024-01-01 00:01:00.0", 1L)))
  }

  test("$probe within a single (wall-clock) minute emits nothing") {
    val sent = scala.collection.mutable.Buffer.empty[DataFrame]
    val out = mkPipe(store, sent).run(Seq(("0", 1L), ("1", 2L)).toDF("_id", "v"),
      """[{"$probe": {"name": "p", "topic": "monitor"}}]""")
    assert(out.count() == 2)
    assert(sent.head.count() == 0) // the running minute is never emitted
  }

  test("$per batches per partition, emits arrays under `as`") {
    val df = (1L to 10L).map(i => (i.toString, i)).toDF("_id", "v")
      .repartition(2)
    val out = pipeline.run(df, """[{"$per": {"amount": 3, "as": "batch"}}]""")
    val sizes = out.select(size($"batch")).collect().map(_.getInt(0))
    assert(sizes.sum == 10 && sizes.forall(_ <= 3))
  }
}
