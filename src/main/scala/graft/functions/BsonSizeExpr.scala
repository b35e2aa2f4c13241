package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, MapData}
import org.apache.spark.sql.graftops.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mongo's `$bsonSize`: the byte size of the argument document's BSON
  * encoding (reference: the MongoDB expression language the json-match
  * library evaluates per message). Computed WITHOUT materializing the
  * encoding — a DataType-driven recursive walk that only measures.
  *
  * Sizing rules (BSON spec, bsonspec.org):
  *  - document: int32 length (4) + elements + terminator (1);
  *    element = type byte (1) + cstring key (len+1) + value
  *  - array: a document whose keys are "0", "1", ...
  *  - string: int32 (4) + utf8 bytes + NUL (1)
  *  - int64 / double / date: 8   - bool: 1   - null: 0
  *  - binary: int32 (4) + subtype (1) + bytes
  *
  * Engine conventions (documented deviations from a driver's encoder):
  *  - ALL integrals size as int64 (8) — the typed schema and the dynamic
  *    JSON tree cannot see a driver's int32-vs-int64 choice, and one fixed
  *    rule keeps the engines in agreement.
  *  - A null struct field sizes as MISSING (no element): the typed engine
  *    cannot distinguish null from missing (SURVEY §7's null==missing
  *    rule). Array elements DO size as BSON null — arrays keep holes.
  *  - Decimals size as double (8), not decimal128 (16): parquet decimals
  *    carry no driver intent, and the dynamic JSON tree has no decimal
  *    type at all — one rule, both engines.
  *  - The DYNAMIC twin sizes instant-parseable STRINGS as BSON dates (8),
  *    because JSON has no date type and the engine's date convention is
  *    ISO strings; here a StringType column is always a string (4+len+1).
  *    An ordinary string that happens to hold an ISO timestamp therefore
  *    sizes differently across engines — documented deviation (SURVEY §7
  *    deviations), permanently excluded from the fuzzer string pool.
  */
case class BsonSizeExpr(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def prettyName: String = "bson_size"
  override def dataType: DataType = IntegerType

  /** First unsupported type inside `dt`, if any — recursive, so a map
    * with non-string keys or an unsized leaf (e.g. CalendarInterval)
    * nested anywhere fails at ANALYSIS time, not per-row in eval. */
  private def firstUnsupported(dt: DataType): Option[String] = dt match {
    case st: StructType =>
      st.fields.iterator.map(f => firstUnsupported(f.dataType))
        .collectFirst { case Some(s) => s }
    case MapType(StringType, vt, _) => firstUnsupported(vt)
    case m: MapType =>
      Some(s"map with ${m.keyType.simpleString} keys (keys must be strings)")
    case ArrayType(et, _) => firstUnsupported(et)
    case StringType | ByteType | ShortType | IntegerType | LongType |
         FloatType | DoubleType | _: DecimalType | TimestampType |
         TimestampNTZType | DateType | BooleanType | BinaryType | NullType =>
      None
    case other => Some(other.simpleString)
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case dt @ (_: StructType | _: MapType) =>
        firstUnsupported(dt) match {
          case None =>
            org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
          case Some(bad) =>
            org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
              s"$$bsonSize: unsupported type $bad")
        }
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$$bsonSize requires a document, got ${other.simpleString}")
    }

  private def keySize(k: String): Int =
    k.getBytes(java.nio.charset.StandardCharsets.UTF_8).length + 1

  /** Value size (the bytes after the element's type byte and key). */
  private def valueSize(v: Any, dt: DataType): Int = dt match {
    case st: StructType => docSize(v.asInstanceOf[InternalRow], st)
    case MapType(StringType, vt, _) => mapSize(v.asInstanceOf[MapData], vt)
    case ArrayType(et, _) => arraySize(v.asInstanceOf[ArrayData], et)
    case StringType => 4 + v.asInstanceOf[UTF8String].numBytes + 1
    case ByteType | ShortType | IntegerType | LongType => 8
    case FloatType | DoubleType | _: DecimalType => 8
    case TimestampType | TimestampNTZType | DateType => 8
    case BooleanType => 1
    case BinaryType => 4 + 1 + v.asInstanceOf[Array[Byte]].length
    case NullType => 0
    case other =>
      throw new IllegalArgumentException(
        s"$$bsonSize: unsupported type ${other.simpleString}")
  }

  private def docSize(row: InternalRow, st: StructType): Int = {
    var sum = 4 + 1
    var i = 0
    while (i < st.length) {
      // null field == missing (typed-engine convention) -> no element
      if (!row.isNullAt(i))
        sum += 1 + keySize(st(i).name) +
          valueSize(row.get(i, st(i).dataType), st(i).dataType)
      i += 1
    }
    sum
  }

  private def mapSize(m: MapData, vt: DataType): Int = {
    var sum = 4 + 1
    val keys = m.keyArray()
    val vals = m.valueArray()
    var i = 0
    while (i < m.numElements()) {
      if (!vals.isNullAt(i))
        sum += 1 + keySize(keys.getUTF8String(i).toString) +
          valueSize(vals.get(i, vt), vt)
      i += 1
    }
    sum
  }

  private def arraySize(a: ArrayData, et: DataType): Int = {
    var sum = 4 + 1
    var i = 0
    while (i < a.numElements()) {
      // array holes stay BSON null: header bytes, zero-length value
      val vs = if (a.isNullAt(i)) 0 else valueSize(a.get(i, et), et)
      sum += 1 + keySize(i.toString) + vs
      i += 1
    }
    sum
  }

  override protected def nullSafeEval(v: Any): Any = child.dataType match {
    case st: StructType => docSize(v.asInstanceOf[InternalRow], st)
    case MapType(StringType, vt, _) => mapSize(v.asInstanceOf[MapData], vt)
    case other => // unreachable after checkInputDataTypes
      throw new IllegalArgumentException(
        s"$$bsonSize requires a document, got ${other.simpleString}")
  }

  override protected def withNewChildInternal(c: Expression): BsonSizeExpr =
    copy(child = c)
}

object BsonSizeExpr {
  def bsonSize(c: Column): Column =
    ColumnBridge.column(BsonSizeExpr(ColumnBridge.expression(c)))
}
