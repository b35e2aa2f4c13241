package graft
import org.apache.spark.sql.SparkSession

/** Throwaway: reproduce the $merge missing-on-field exception path. */
object Scratch6 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val st = new graft.sources.InMemoryStore(spark)
    st.overwrite("c", Seq(("1", 10L)).toDF("_id", "v"))
    try {
      new Pipeline(store = st).run(
        Seq((null.asInstanceOf[String], 5L)).toDF("_id", "v"),
        """[{"$merge": {"into": "c"}}]""")
      println("NO EXCEPTION")
    } catch {
      case e: Throwable =>
        var c: Throwable = e
        var i = 0
        while (c != null && i < 8) {
          println(s"CHAIN[$i] ${c.getClass.getName}: ${c.getMessage}")
          c = c.getCause; i += 1
        }
        println("TOPFRAMES " + e.getStackTrace.take(5).mkString(" | "))
    }
    spark.stop()
  }
}
