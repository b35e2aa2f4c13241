package graft
import org.apache.spark.sql.SparkSession
object Scratch3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, "/root/testdata/sf0.01").count()
      println(f"TIMED $name n=$n t=${(System.nanoTime()-t0)/1e9}%.2f s")
    }
  }
}
