package graft
import org.apache.spark.sql.SparkSession

/** Explain utility: `runMain graft.Scratch6 <queryName> [sfDir]` prints the
  * formatted physical plan of a SparkEntry query. */
object Scratch6 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    SparkEntry.queries(args(0))(spark, dir).explain("formatted")
    spark.stop()
  }
}
