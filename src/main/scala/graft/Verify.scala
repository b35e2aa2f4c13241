package graft
import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.types._
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * IEEE -0.0 canonicalization (round-10/11 lesson): Spark's `round` goes
  * through BigDecimal and emits +0.0 where DuckDB's `round` preserves -0.0,
  * and the driver's hash distinguishes the two. Rather than guarding each of
  * the ~200 `round(` oracle sites by hand, BOTH sides are canonicalized here:
  * every float/double output column (scalar or array element) is normalized
  * -0.0 → +0.0 before the parquet write, and the dumped oracle SQL is wrapped
  * in a `SELECT * REPLACE (col + 0 AS col)` projection derived from the same
  * schema (DuckDB: -0.0 + 0 = +0.0; FLOAT + INTEGER stays FLOAT). The two
  * values are numerically equal, so this changes no query semantics — it only
  * pins one canonical representation of zero on both engines.
  */
object Verify {
  /** -0.0 → +0.0 on every top-level float/double column (and array elems). */
  def normNegZero(df: DataFrame): DataFrame = {
    def bq(n: String) = "`" + n.replace("`", "``") + "`"
    val cols = df.schema.fields.map { f =>
      val c = F.col(bq(f.name))
      f.dataType match {
        case DoubleType | FloatType =>
          F.when(c === F.lit(0), F.lit(0d).cast(f.dataType)).otherwise(c)
            .as(f.name)
        case ArrayType(et @ (DoubleType | FloatType), _) =>
          F.transform(c, x =>
            F.when(x === F.lit(0), F.lit(0d).cast(et)).otherwise(x)).as(f.name)
        case _ => c.as(f.name)
      }
    }
    df.select(cols.toIndexedSeq: _*)
  }

  private def containsFloat(dt: DataType): Boolean = dt match {
    case DoubleType | FloatType => true
    case s: StructType          => s.fields.exists(f => containsFloat(f.dataType))
    case ArrayType(et, _)       => containsFloat(et)
    case MapType(k, v, _)       => containsFloat(k) || containsFloat(v)
    case _                      => false
  }

  /** Wrap oracle SQL so DuckDB emits the same canonical +0.0 as the Spark
    * side — `* REPLACE` keeps names/types, `+ 0` clears the sign of zero. */
  def wrapOracle(sql: String, schema: StructType): String = {
    def dq(n: String) = "\"" + n.replace("\"", "\"\"") + "\""
    val repls = schema.fields.flatMap { f =>
      f.dataType match {
        case DoubleType | FloatType =>
          Some(s"${dq(f.name)} + 0 AS ${dq(f.name)}")
        case ArrayType(DoubleType | FloatType, _) =>
          Some(s"list_transform(${dq(f.name)}, x -> x + 0) AS ${dq(f.name)}")
        case _ => None
      }
    }
    if (repls.isEmpty) sql
    else s"SELECT * REPLACE (${repls.mkString(", ")}) FROM ($sql) __graft_negz"
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Dev-only subset run: SPARK_GRAFT_ONLY=q_a,q_b (driver never sets it).
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').toSet)
    val schemas = scala.collection.mutable.Map.empty[String, StructType]
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try {
        val df = normNegZero(fn(spark, sfDir))
        schemas(name) = df.schema
        df.schema.fields.foreach { f =>
          val deep = f.dataType match {
            case DoubleType | FloatType                   => false
            case ArrayType(DoubleType | FloatType, _)     => false
            case dt                                       => containsFloat(dt)
          }
          if (deep) System.err.println(
            s"[verify] WARN $name.${f.name}: float nested in ${f.dataType.simpleString} is NOT -0.0-canonicalized")
        }
        df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) =>
        val sql = schemas.get(k).map(wrapOracle(v, _)).getOrElse(v)
        s"${q(k)}: ${q(sql)}"
      }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
