package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftops.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mongo's byte-indexed string ops — `$substrBytes` / `$indexOfBytes` —
  * as native Catalyst expressions (reference: the MongoDB expression
  * language its json-match library evaluates per message).
  *
  * Why custom: Spark's `substring`/`locate` count CHARACTERS, and a
  * `cast(binary)` round-trip silently replaces a mid-code-point slice
  * with U+FFFD where Mongo ERRORS ("not a valid UTF-8 boundary") — the
  * error is part of the contract differential tests pin. UTF8String
  * already stores UTF-8 bytes, so the byte math is allocation-free;
  * evaluation is interpreted (CodegenFallback, same precedent as
  * RegexFindAllExpr) — these are cold MQL scalar ops, not pipeline
  * hot-path aggregates.
  */
case class SubstrBytesExpr(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression with CodegenFallback {

  override def prettyName: String = "substr_bytes"
  override def dataType: DataType = StringType

  private def isCont(b: Byte): Boolean = (b & 0xc0) == 0x80

  override protected def nullSafeEval(s: Any, startA: Any, countA: Any): Any = {
    val bytes = s.asInstanceOf[UTF8String].getBytes
    val start = startA.asInstanceOf[Number].intValue()
    val count = countA.asInstanceOf[Number].intValue()
    require(start >= 0 && count >= 0,
      s"$$substrBytes: negative start/count ($start, $count)")
    if (start >= bytes.length) return UTF8String.EMPTY_UTF8
    val end = math.min(start.toLong + count, bytes.length).toInt
    require(!isCont(bytes(start)),
      s"$$substrBytes: byte index $start splits a UTF-8 character")
    require(end == bytes.length || !isCont(bytes(end)),
      s"$$substrBytes: byte index $end splits a UTF-8 character")
    UTF8String.fromBytes(java.util.Arrays.copyOfRange(bytes, start, end))
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): SubstrBytesExpr = copy(first = f, second = s, third = t)
}

/** `$indexOfBytes`: first byte index of `sub` inside the byte window
  * [start, end) of `str` — the occurrence must FIT inside the window
  * (same windowing contract as our `$indexOfCP`); −1 when absent or when
  * start is past the end. Byte indices need not align to character
  * boundaries (it is a pure byte search, matching the server).
  */
case class IndexOfBytesExpr(first: Expression, second: Expression,
    third: Expression, fourth: Expression)
  extends QuaternaryExpression with CodegenFallback {

  override def prettyName: String = "index_of_bytes"
  override def dataType: DataType = LongType

  override protected def nullSafeEval(s: Any, subA: Any, startA: Any,
      endA: Any): Any = {
    val h = s.asInstanceOf[UTF8String].getBytes
    val n = subA.asInstanceOf[UTF8String].getBytes
    val start = startA.asInstanceOf[Number].intValue()
    val rawEnd = endA.asInstanceOf[Number].longValue()
    require(start >= 0 && rawEnd >= 0,
      "$indexOfBytes start/end must be non-negative")
    val end = math.min(rawEnd, h.length).toInt
    if (start > h.length || end < start) return -1L
    var i = start
    val last = end - n.length
    while (i <= last) {
      var j = 0
      while (j < n.length && h(i + j) == n(j)) j += 1
      if (j == n.length) return i.toLong
      i += 1
    }
    -1L
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression, q: Expression): IndexOfBytesExpr =
    copy(first = f, second = s, third = t, fourth = q)
}

object ByteStringExprs {
  def substrBytes(s: Column, start: Column, count: Column): Column =
    ColumnBridge.column(SubstrBytesExpr(ColumnBridge.expression(s),
      ColumnBridge.expression(start), ColumnBridge.expression(count)))

  def indexOfBytes(s: Column, sub: Column, start: Column, end: Column): Column =
    ColumnBridge.column(IndexOfBytesExpr(ColumnBridge.expression(s),
      ColumnBridge.expression(sub), ColumnBridge.expression(start),
      ColumnBridge.expression(end)))
}
