package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm._
object Scratch2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"PHASE $name n=$n t=${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    val withSh = df.groupBy(col("text").as("__text")).agg(min(col("doc_id")).as("doc"))
      .select(col("doc"), DedupOps.shingles(col("__text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
      .persist()
    val exploded = withSh.select(col("doc"), explode(col("sh")).as("shingle"))
    val mins = exploded.groupBy("doc").agg(
      min(xxhash64(lit(0), col("shingle"))).as("m0"),
      (1 until 32).map(j => min(xxhash64(lit(j), col("shingle"))).as(s"m$j")): _*)
    time("mins")(mins.count())
    val banded = mins.select(col("doc"),
      posexplode(array((0 until 8).map(b =>
        xxhash64((lit(b) +: (0 until 4).map(r => col(s"m${b*4+r}"))): _*)): _*))
        .as(Seq("band", "bucket")))
    val a = banded.select(col("band"), col("bucket"), col("doc").as("id_a"))
    val bb = banded.select(col("band"), col("bucket"), col("doc").as("id_b"))
    val rawpairs = a.join(bb, Seq("band", "bucket")).filter(col("id_a") < col("id_b"))
    time("rawpairs")(rawpairs.count())
    val pairs = rawpairs.select("id_a", "id_b").dropDuplicates("id_a", "id_b")
    time("pairs")(pairs.count())
    val j = pairs
      .join(withSh.select(col("doc").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(withSh.select(col("doc").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
    time("jaccard")(j.filter(col("jaccard") >= 0.4).count())
    spark.stop()
  }
}
