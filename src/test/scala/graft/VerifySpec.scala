package graft

import org.apache.spark.sql.{functions => F, Row}
import org.apache.spark.sql.types._

/** Verify's -0.0 canonicalization must be total: any float at any nesting
  * depth (scalar, array, struct, map, and compositions) is rewritten to
  * +0.0, nulls are preserved, and a float-bearing type with no rewrite is a
  * hard error — the round-10/11 driver-red class cannot resurface silently.
  */
class VerifySpec extends SparkSpec {
  import spark.implicits._

  private def sign(d: Double): Boolean = java.lang.Double.doubleToRawLongBits(d) < 0

  test("normNegZero clears -0.0 in scalars, arrays, structs, maps, nested") {
    val df = Seq(1)
      .toDF("i")
      .select(
        F.lit(-0.0).as("d"),
        F.array(F.lit(-0.0), F.lit(1.5), F.lit(0.0)).as("a"),
        F.struct(F.lit(-0.0).as("x"), F.lit("s").as("tag")).as("st"),
        F.map(F.lit("k"), F.lit(-0.0)).as("m"),
        F.array(F.struct(F.array(F.lit(-0.0)).as("inner"))).as("deep"),
        F.lit(null).cast(StructType(Seq(StructField("x", DoubleType)))).as("nullst"),
        F.lit(7L).as("keep"))
    val r = Verify.normNegZero(df).collect()(0)
    assert(!sign(r.getAs[Double]("d")))
    val arr = r.getAs[scala.collection.Seq[Double]]("a")
    assert(!sign(arr(0)) && arr(1) == 1.5 && !sign(arr(2)))
    val st = r.getAs[Row]("st")
    assert(!sign(st.getAs[Double]("x")) && st.getAs[String]("tag") == "s")
    assert(!sign(r.getAs[Map[String, Double]]("m")("k")))
    val deep = r.getAs[scala.collection.Seq[Row]]("deep")(0).getAs[scala.collection.Seq[Double]]("inner")
    assert(!sign(deep(0)))
    assert(r.isNullAt(r.fieldIndex("nullst")), "null struct stays null")
    assert(r.getAs[Long]("keep") == 7L)
  }

  test("normNegZero leaves non-zero values and float NaN/infinities intact") {
    val df = Seq(1).toDF("i").select(
      F.lit(Double.NaN).as("nan"),
      F.lit(Double.PositiveInfinity).as("pinf"),
      F.lit(-2.5).as("neg"),
      F.struct(F.lit(-3.25f).as("f")).as("st"))
    val r = Verify.normNegZero(df).collect()(0)
    assert(r.getAs[Double]("nan").isNaN)
    assert(r.getAs[Double]("pinf").isPosInfinity)
    assert(r.getAs[Double]("neg") == -2.5)
    assert(r.getAs[Row]("st").getAs[Float]("f") == -3.25f)
  }

  test("wrapOracle rewrites nested struct/array/map float fields") {
    val schema = StructType(Seq(
      StructField("flag", StringType),
      StructField("stats", StructType(Seq(
        StructField("tiny", DoubleType), StructField("n", LongType)))),
      StructField("arr", ArrayType(StructType(Seq(StructField("t", DoubleType))))),
      StructField("m", MapType(StringType, DoubleType))))
    val sql = Verify.wrapOracle("SELECT 1", schema)
    assert(sql.contains("struct_pack"), sql)
    assert(sql.contains("""("stats")."tiny" + 0"""), sql)
    assert(sql.contains("list_transform"), sql)
    assert(sql.contains("map("), sql)
    assert(!sql.contains("\"flag\" +"), "non-float columns untouched")
    // a float-free schema is passed through verbatim
    val plain = StructType(Seq(StructField("a", LongType)))
    assert(Verify.wrapOracle("SELECT 1", plain) == "SELECT 1")
  }

  test("float-bearing type with no rewrite is a hard error, not a WARN") {
    val bad = StructType(Seq(StructField("u",
      new org.apache.spark.sql.types.UserDefinedType[Any] {
        override def sqlType: DataType = DoubleType
        override def serialize(obj: Any): Any = obj
        override def deserialize(datum: Any): Any = datum
        override def userClass: Class[Any] = classOf[Any]
      })))
    intercept[IllegalStateException](Verify.wrapOracle("SELECT 1", bad))
  }
}
