package graft
import org.apache.spark.sql.SparkSession
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (args(0) == "entry") { val d = SparkEntry.entry(spark); d.show(10, false); println(s"entry rows=${d.count()}") }
    else {
      val q = SparkEntry.queries(args(0))
      q(spark, if (args.length > 1) args(1) else "/root/testdata/sf0.001").show(5, false)
    }
    spark.stop()
  }
}
