package graft

import graft.sources.MongoStore

/** Option-plumbing tests for the connector-backed store — the connector jar
  * itself isn't in this container, so reads/writes can't run live; what CAN
  * break silently (and is pinned here) is the option mapping the connector
  * contract depends on. */
class MongoStoreSpec extends SparkSpec {

  private def store = new MongoStore(spark,
    "mongodb://user:pw@host1:27017,host2:27017/?replicaSet=rs0", "events")

  test("read options carry uri/database/collection") {
    val o = store.readOptions("orders")
    assert(o("connection.uri").startsWith("mongodb://user:pw@host1"))
    assert(o("database") == "events")
    assert(o("collection") == "orders")
  }

  test("write options map $merge `on` to the connector idFieldList") {
    val o = store.writeOptions("orders", List("region", "day"))
    assert(o("idFieldList") == "region,day")
    assert(o("operationType") == "replace")
    // default `on` (_id) leaves idFieldList unset = connector default _id
    assert(!store.writeOptions("orders").contains("idFieldList"))
  }

  test("extra options pass through; bad URIs and empty db fail fast") {
    val s = new MongoStore(spark, "mongodb+srv://cluster.example.net", "db",
      Map("readPreference.name" -> "secondaryPreferred"))
    assert(s.readOptions("c")("readPreference.name") == "secondaryPreferred")
    intercept[IllegalArgumentException](new MongoStore(spark, "http://x", "db"))
    intercept[IllegalArgumentException](
      new MongoStore(spark, "mongodb://h", ""))
  }

  test("the datasource is addressed by name, so missing connector fails loudly") {
    // without the connector jar, resolution must fail with the standard
    // "failed to find data source" error, not an opaque linkage error
    val e = intercept[Exception](store.read("orders").collect())
    assert(e.getMessage.toLowerCase.contains("mongodb") ||
      e.getMessage.toLowerCase.contains("data source"))
  }
}
