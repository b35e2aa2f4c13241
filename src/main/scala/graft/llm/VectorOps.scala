package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Scale design: the brute-force path is a broadcast of the (small) query set
  * against the (huge) corpus — one pass, no corpus shuffle, per-row top-k via
  * window over (query, sim). The LSH path buckets the corpus by sign-bit
  * hyperplane hashes so a 100 TB corpus is probed by bucket, not scanned.
  * Hyperplanes are pseudo-random but deterministic: components derived from
  * xxhash64(planeIdx, dim) mapped to [-1, 1).
  */
object VectorOps {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0d), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d > 0, dot(a, b) / d).otherwise(lit(0d))
  }

  /** L2-normalize a vector (zero vectors pass through unscaled). */
  def normalize(a: Column): Column = {
    val n = norm(a)
    when(n > 0, transform(a, x => x / n)).otherwise(a)
  }

  /** Brute-force top-k cosine neighbors of each query vector.
    * `queries(query_id, qvec)` is broadcast; corpus is scanned once. Both
    * sides are normalized ONCE per row before the join so each of the
    * corpus×queries pairs costs a single dot product — norms are never
    * recomputed per pair. */
  def bruteTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("nn_id"),
      normalize(col(vecCol).cast(ArrayType(DoubleType))).as("__v"))
    val q = queries.select(col(qIdCol).as("query_id"),
      normalize(col(qVecCol).cast(ArrayType(DoubleType))).as("__q"))
    val joined = c.crossJoin(broadcast(q))
      .filter(col("nn_id") =!= col("query_id"))
      .withColumn("sim", dot(col("__v"), col("__q")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("nn_id"))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("nn_id"), round(col("sim"), 6).as("sim"), col("rank"))
  }

  /** Deterministic pseudo-random hyperplane component in [-1,1). */
  private def planeComponent(plane: Int, dim: Column): Column =
    (pmod(xxhash64(lit(plane), dim), lit(2000000L)).cast(DoubleType) / 1000000d) - 1d

  /** Sign-bit LSH bucket id from `nPlanes` hyperplanes. */
  def hyperplaneBucket(vec: Column, nPlanes: Int): Column =
    aggregate(
      sequence(lit(0), lit(nPlanes - 1)),
      lit(0L),
      (acc, p) => {
        val proj = aggregate(
          zip_with(vec, sequence(lit(0), size(vec) - 1),
            (x, i) => x * planeComponent0(p, i)),
          lit(0d), (a, v) => a + v)
        acc.bitwiseOR(when(proj > 0, call_function("shiftleft", lit(1L), p.cast(IntegerType))).otherwise(0L))
      })

  // plane index is a Column here (comes from sequence()) — same hash recipe
  private def planeComponent0(plane: Column, dim: Column): Column =
    (pmod(xxhash64(plane, dim), lit(2000000L)).cast(DoubleType) / 1000000d) - 1d

  /** ANN via hyperplane-LSH: queries probe only their own bucket.
    * Recall < 1 by construction; nProbes>1 would flip bits for better recall
    * (future work). */
  def lshTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String,
      k: Int, nPlanes: Int = 12): DataFrame = {
    val c = corpus.select(col(idCol).as("nn_id"),
      normalize(col(vecCol).cast(ArrayType(DoubleType))).as("__v"))
      .withColumn("bucket", hyperplaneBucket(col("__v"), nPlanes))
    val q = queries.select(col(qIdCol).as("query_id"),
      normalize(col(qVecCol).cast(ArrayType(DoubleType))).as("__q"))
      .withColumn("bucket", hyperplaneBucket(col("__q"), nPlanes))
    val joined = c.join(broadcast(q), Seq("bucket"))
      .filter(col("nn_id") =!= col("query_id"))
      .withColumn("sim", dot(col("__v"), col("__q")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("nn_id"))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("nn_id"), round(col("sim"), 6).as("sim"), col("rank"))
  }
}
