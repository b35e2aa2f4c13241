package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all specs (one per suite-classloader). */
object SparkSpec {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.spark
  def pipeline: Pipeline = new Pipeline()

  /** Rows of a single column as a sorted list (order-insensitive compare). */
  def sorted1[T](df: DataFrame, col: String)(implicit ord: Ordering[T]): List[T] =
    df.select(col).collect().iterator.map(_.getAs[T](0)).toList.sorted

  def rows(df: DataFrame): Set[List[Any]] =
    df.collect().map(_.toSeq.toList).toSet
}
