package graft

import graft.sources.InMemoryStore
import org.apache.spark.sql.functions._

/** Kitchen-sink integration: ONE pipeline chaining most stage families —
  * script transforms, match, lookup with a sub-pipeline, unwind, group,
  * redact, and a $merge sink — over real testdata. Interaction bugs
  * (schema handoffs between stages, key column threading, echo rows)
  * don't show up in per-stage specs.
  */
class IntegrationSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("ten-stage pipeline end-to-end with lookup sub-pipeline, jslt, group, merge") {
    val store = new InMemoryStore(spark)
    store.overwrite("summary",
      Seq(("BUILDING", 0L, 0d)).toDF("_id", "orders", "spend"))
    val catalog = (n: String) => spark.read.parquet(s"$sf/$n.parquet")
    val pipe = new Pipeline(catalog = catalog, store = store)

    val out = pipe.run(spark.read.parquet(s"$sf/orders.parquet"),
      """[
        {"$match": {"o_orderstatus": {"$in": ["F", "O"]}}},
        {"$jq": "select(.o_totalprice > 50000) | {o_orderkey, o_custkey, o_totalprice}"},
        {"$lookup": {"from": "customer", "let": {"ck": "$o_custkey"},
          "pipeline": [
            {"$match": {"$expr": {"$eq": ["$c_custkey", "$$ck"]}}},
            {"$project": {"c_mktsegment": 1, "c_acctbal": 1}}],
          "as": "cust", "unwind": true}},
        {"$addFields": {"seg": "$cust.c_mktsegment"}},
        {"$jslt": "{\"seg\": .seg, \"spend\": .o_totalprice, \"key_\": .o_orderkey}"},
        {"$redact": {"$cond": [{"$eq": [{"$ifNull": ["$seg", ""]}, ""]},
                               "$$PRUNE", "$$KEEP"]}},
        {"$group": {"_id": "$seg",
                    "orders": {"$count": {}},
                    "spend": {"$sum": "$spend"}}},
        {"$addFields": {"spend": {"$round": ["$spend", 2]}}},
        {"$merge": {"into": "summary"}}
      ]""")

    // echo: one row per segment, all written
    val echo = out.collect()
    assert(echo.length >= 4) // 5 segments, all with qualifying orders
    // store state: upserted rows replace the seeded BUILDING row's values
    val stored = store.read("summary")
    assert(stored.count() == echo.length)
    val building = stored.filter($"_id" === "BUILDING").head()
    assert(building.getAs[Long]("orders") > 0)
    assert(building.getAs[Double]("spend") > 0)
    // cross-check one segment against a direct computation
    val direct = spark.read.parquet(s"$sf/orders.parquet")
      .filter($"o_orderstatus".isin("F", "O") && $"o_totalprice" > 50000)
      .join(spark.read.parquet(s"$sf/customer.parquet"),
        $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n"), round(sum($"o_totalprice"), 2).as("s"))
    val d = direct.filter($"c_mktsegment" === "BUILDING").head()
    assert(building.getAs[Long]("orders") == d.getAs[Long]("n"))
    assert(math.abs(building.getAs[Double]("spend") - d.getAs[Double]("s")) < 1e-6)
  }
}
