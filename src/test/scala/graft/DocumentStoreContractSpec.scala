package graft

import graft.sources.{BucketedParquetStore, DocumentStore, InMemoryStore,
  MongoStore, ParquetStore}
import org.apache.spark.sql.functions._

/** The behavioral contract every [[DocumentStore]] binding must satisfy —
  * the assertions the ENGINE relies on, run identically against all local
  * stores and (env-gated) a real MongoDB, so the day a server exists the
  * same suite lights up against it (round-11 verdict #6: the connector
  * path was parse-level only).
  *
  * Run the Mongo leg with `GRAFT_MONGO_URI=mongodb://… sbt "testOnly
  * graft.DocumentStoreContractSpec"`; without the env var those tests
  * CANCEL (reported as canceled, never silently green). The MongoDB Spark
  * connector jar must be on the session classpath for a live run. */
class DocumentStoreContractSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def contract(storeName: String, mk: () => DocumentStore): Unit = {
    test(s"$storeName: overwrite + read round-trips rows and schema") {
      val st = mk()
      val df = Seq(("a", 1L, 1.5), ("b", 2L, -2.5)).toDF("_id", "v", "x")
      st.overwrite("c1", df)
      val got = st.read("c1")
      assert(got.columns.sorted.toSeq == Seq("_id", "v", "x"))
      assert(rows(got.select("_id", "v", "x")) ==
        Set(List("a", 1L, 1.5), List("b", 2L, -2.5)))
    }

    test(s"$storeName: overwrite REPLACES previous contents") {
      val st = mk()
      st.overwrite("c2", Seq(("a", 1L)).toDF("_id", "v"))
      st.overwrite("c2", Seq(("z", 9L)).toDF("_id", "v"))
      assert(rows(st.read("c2").select("_id", "v")) == Set(List("z", 9L)))
    }

    test(s"$storeName: collections are independent") {
      val st = mk()
      st.overwrite("left", Seq(("l", 1L)).toDF("_id", "v"))
      st.overwrite("right", Seq(("r", 2L)).toDF("_id", "v"))
      assert(rows(st.read("left").select("_id")) == Set(List("l")))
      assert(rows(st.read("right").select("_id")) == Set(List("r")))
    }

    test(s"$storeName: $$merge upserts, $$delete removes (engine end-to-end)") {
      val st = mk()
      st.overwrite("c3",
        Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("_id", "v"))
      val p = new Pipeline(store = st)
      // upsert: a updated, d inserted
      p.run(Seq(("a", 10L), ("d", 4L)).toDF("_id", "v"),
        """[{"$merge": {"into": "c3"}}]""").count()
      assert(rows(st.read("c3").select("_id", "v")) ==
        Set(List("a", 10L), List("b", 2L), List("c", 3L), List("d", 4L)))
      // delete by key
      p.run(Seq(Tuple1("b")).toDF("_id"),
        """[{"$delete": {"from": "c3"}}]""").count()
      assert(rows(st.read("c3").select("_id")) ==
        Set(List("a"), List("c"), List("d")))
    }

    test(s"$storeName: non-bucketed reads ignore bucket hints (trait defaults)") {
      val st = mk()
      st.overwrite("c4", Seq(("a", 1L)).toDF("_id", "v"))
      st.bucketing("c4", List("_id")) match {
        case Some(_) => // bucketed stores prune; correctness covered above
        case None =>
          // the trait default must fall back to a full read, not fail
          assert(st.readBuckets("c4", Seq(0, 1)).count() == 1)
      }
    }
  }

  contract("InMemoryStore", () => new InMemoryStore(spark))
  contract("ParquetStore", () => new ParquetStore(spark, tmp("graft_ps")))
  contract("BucketedParquetStore",
    () => new BucketedParquetStore(spark, tmp("graft_bps"), numBuckets = 8))
  contract("MongoStore", () => {
    val uri = sys.env.getOrElse("GRAFT_MONGO_URI",
      cancel("set GRAFT_MONGO_URI=mongodb://… (with the connector jar " +
        "deployed) to run the live MongoDB leg"))
    new MongoStore(spark, uri, "graft_contract")
  })
}
