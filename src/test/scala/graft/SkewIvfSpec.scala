package graft

import graft.llm.VectorOps
import graft.operators.Skew
import org.apache.spark.sql.functions._

class SkewIvfSpec extends SparkSpec {
  import spark.implicits._

  test("saltedSum / saltedCountDistinct match unsalted aggregation") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(2000)(("hot", rnd.nextInt(50).toLong)) ++
      Seq.fill(100)(("cold", rnd.nextInt(50).toLong))
    val df = rows.toDF("k", "v")
    val want = df.groupBy("k").agg(sum("v"), countDistinct("v"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val gotSum = Skew.saltedSum(df, $"k", $"v", salts = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val gotCd = Skew.saltedCountDistinct(df, $"k", $"v", salts = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gotSum == want.view.mapValues(_._1).toMap)
    assert(gotCd == want.view.mapValues(_._2).toMap)
  }

  test("salting spreads a constant-valued hot key across reducers") {
    // the canonical hot-key counting case: every row of the hot key carries
    // the SAME value — a value-derived salt would land all of them in one
    // (key, salt) group, keeping the skew
    val df = (Seq.fill(4000)(("hot", 1L)) ++ Seq.fill(50)(("cold", 2L)))
      .toDF("k", "v").repartition(4)
    val partials = Skew.saltedPartials(df, $"k", 8, sum, $"v")
      .filter($"__k" === "hot")
    assert(partials.count() == 8, "hot key must spread over all 8 salts")
    val got = Skew.saltedSum(df, $"k", $"v", salts = 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("hot" -> 4000L, "cold" -> 100L))
  }

  test("IVF ANN recall on clustered embeddings beats hyperplane LSH") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") % 50 === 0)
    def hits(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "nn_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = hits(VectorOps.bruteTopK(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 5))
    val ivf = hits(VectorOps.ivfTopK(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", k = 5, nLists = 8, nProbe = 2))
    val rIvf = (ivf & truth).size.toDouble / truth.size
    assert(rIvf > 0.4, s"IVF recall $rIvf too low")
  }
}
