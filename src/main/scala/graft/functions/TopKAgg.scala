package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.graftops.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded top-k / first-n / last-n aggregate for the window N-family
  * (`$minN/$maxN/$topN/$bottomN/$firstN/$lastN/$top/$bottom`).
  *
  * Why custom (SURVEY §4 "custom Catalyst inventory"): the composable
  * alternative — `slice(array_sort(collect_list(packed) over frame))` —
  * re-materializes and RE-SORTS the whole collected history for EVERY row
  * of a growing frame with an interpreted comparator: O(frame² log frame)
  * per partition, measured as a multi-minute stall on 100k rows at sf0.1.
  * Spark's growing-frame window processor feeds an ImperativeAggregate one
  * `update` per row, so this runs in O(frame · log k) with at most `k`
  * buffered rows.
  *
  * `mode`:
  *  - "sorted": keep the k BEST rows of the child struct by its first
  *    `keyDirs.length` fields (lexicographic, per-key direction, Mongo's
  *    null rule: nulls first ascending / last descending); eval returns
  *    them best-first. `$bottom*` = flipped directions + reversed output
  *    at the call site.
  *  - "first": keep the first k rows in arrival (frame) order.
  *  - "last": ring-buffer of the last k rows in arrival order.
  * A NULL child row is skipped (the `collect_list` rule the group-side
  * accumulators share). Merging combines buffers and re-prunes, so the
  * same aggregate is safe under map-side partial aggregation in groups.
  */
case class BoundedTopK(child: Expression, keyDirs: Seq[Boolean], n: Int,
    mode: String,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.ArrayDeque[InternalRow]] {

  require(n > 0, s"n must be positive: $n")
  require(Seq("sorted", "first", "last").contains(mode), s"mode: $mode")

  // LAZY: the child is unresolved (and possibly un-coerced, e.g. a
  // CaseWhen whose else branch is still NullType) at construction — its
  // type may only be read after analysis
  @transient private lazy val structType = child.dataType.asInstanceOf[StructType]

  override def children: Seq[Expression] = child :: Nil
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def withNewMutableAggBufferOffset(o: Int): BoundedTopK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BoundedTopK =
    copy(inputAggBufferOffset = o)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def prettyName: String = s"bounded_top_k_$mode"

  // per-key interpreted orderings over the struct's leading fields; Mongo
  // null rule baked in (nulls FIRST ascending, LAST descending)
  @transient private lazy val fieldOrds: Array[Ordering[Any]] =
    keyDirs.indices.map(i => TypeUtils.getInterpretedOrdering(
      structType.fields(i).dataType)).toArray
  @transient private lazy val rowCmp: java.util.Comparator[InternalRow] =
    new java.util.Comparator[InternalRow] {
      override def compare(l: InternalRow, r: InternalRow): Int = {
        var i = 0
        while (i < keyDirs.length) {
          val dt = structType.fields(i).dataType
          val (ln, rn) = (l.isNullAt(i), r.isNullAt(i))
          val asc = keyDirs(i)
          if (ln || rn) {
            if (!(ln && rn)) return if (ln == asc) -1 else 1
          } else {
            val c = fieldOrds(i).compare(l.get(i, dt), r.get(i, dt))
            if (c != 0) return if (asc) c else -c
          }
          i += 1
        }
        0
      }
    }

  override def createAggregationBuffer(): java.util.ArrayDeque[InternalRow] =
    new java.util.ArrayDeque[InternalRow]()

  @transient private lazy val proj = UnsafeProjection.create(structType)

  override def update(buf: java.util.ArrayDeque[InternalRow],
      input: InternalRow): java.util.ArrayDeque[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return buf
    val row = proj(v.asInstanceOf[InternalRow]).copy()
    mode match {
      case "first" =>
        if (buf.size < n) buf.addLast(row)
      case "last" =>
        buf.addLast(row)
        if (buf.size > n) buf.removeFirst()
      case _ => // sorted: insertion into a small sorted deque — k is the
        // user's top-k, single digits in practice, so linear insert beats
        // heap constant factors
        insertSorted(buf, row)
        if (buf.size > n) buf.removeLast()
    }
    buf
  }

  private def insertSorted(buf: java.util.ArrayDeque[InternalRow],
      row: InternalRow): Unit = {
    // common case: row is worse than everything kept — append
    if (buf.isEmpty || rowCmp.compare(row, buf.peekLast()) >= 0) {
      buf.addLast(row); return
    }
    val it = buf.iterator()
    var idx = 0
    var found = -1
    while (it.hasNext && found < 0) {
      if (rowCmp.compare(row, it.next()) < 0) found = idx
      idx += 1
    }
    val tmp = new java.util.ArrayList[InternalRow](buf)
    tmp.add(if (found < 0) tmp.size else found, row)
    buf.clear()
    tmp.forEach(r => buf.addLast(r))
  }

  override def merge(buf: java.util.ArrayDeque[InternalRow],
      other: java.util.ArrayDeque[InternalRow]): java.util.ArrayDeque[InternalRow] =
    mode match {
      case "first" =>
        other.forEach(r => if (buf.size < n) buf.addLast(r))
        buf
      case "last" =>
        other.forEach { r =>
          buf.addLast(r); if (buf.size > n) buf.removeFirst()
        }
        buf
      case _ =>
        other.forEach { r =>
          insertSorted(buf, r); if (buf.size > n) buf.removeLast()
        }
        buf
    }

  override def eval(buf: java.util.ArrayDeque[InternalRow]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.ArrayDeque[InternalRow]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(bos)
    dos.writeInt(buf.size)
    buf.forEach { r =>
      val u = r.asInstanceOf[UnsafeRow]
      val bytes = u.getBytes
      dos.writeInt(bytes.length)
      dos.write(bytes)
    }
    dos.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.ArrayDeque[InternalRow] = {
    val dis = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val size = dis.readInt()
    val buf = new java.util.ArrayDeque[InternalRow]()
    var i = 0
    while (i < size) {
      val len = dis.readInt()
      val arr = new Array[Byte](len)
      dis.readFully(arr)
      val row = new UnsafeRow(structType.length)
      row.pointTo(arr, len)
      buf.addLast(row)
      i += 1
    }
    buf
  }
}

object BoundedTopK {
  /** Keep the `n` best rows of `packed` (a struct whose first
    * `keyDirs.length` fields are the sort keys), best-first. */
  def sortedTopK(packed: Column, keyDirs: Seq[Boolean], n: Int): Column =
    ColumnBridge.column(BoundedTopK(ColumnBridge.expression(packed),
      keyDirs, n, "sorted").toAggregateExpression())

  /** First `n` rows of `packed` in frame order. */
  def firstN(packed: Column, n: Int): Column =
    ColumnBridge.column(BoundedTopK(ColumnBridge.expression(packed),
      Nil, n, "first").toAggregateExpression())

  /** Last `n` rows of `packed` in frame order. */
  def lastN(packed: Column, n: Int): Column =
    ColumnBridge.column(BoundedTopK(ColumnBridge.expression(packed),
      Nil, n, "last").toAggregateExpression())
}
