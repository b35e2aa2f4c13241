package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.DedupOps

/** Stage-by-stage timing of minhashLsh at sf0.1 (throwaway profiling). */
object Scratch5 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val df = spark.read.parquet(s"$dir/documents.parquet")
    def tm(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"STAGE $label rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    tm("read")(df.count())
    tm("textlen")(df.select(avg(length(col("text")))).collect()(0).getDouble(0).toLong)
    val withSh = df.groupBy(col("text").as("__text")).agg(min(col("doc_id")).as("doc"))
      .select(col("doc"), DedupOps.shingles(col("__text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    tm("shingle1")(withSh.count())
    tm("shingle2")(withSh.count())
    val exploded = withSh.select(col("doc"), explode(col("sh")).as("shingle"))
    tm("explode1")(exploded.count())
    tm("explode2")(exploded.count())
    val sigs = exploded.groupBy("doc")
      .agg(graft.functions.HashAggs.minhash(col("shingle"), 32).as("sig"))
    tm("sigs1")(sigs.count())
    tm("sigs2")(sigs.count())
    tm("full1")(DedupOps.minhashLsh(df, "text", "doc_id", 3, 8, 4, 0.4).count())
    tm("full2")(DedupOps.minhashLsh(df, "text", "doc_id", 3, 8, 4, 0.4).count())
    spark.stop()
  }
}
