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
  * `update` per row, so this runs in O(frame · (log k + move)) with at most
  * `k` buffered rows — binary-search position, single `System.arraycopy`
  * shift on insert, and an O(1) reject for rows worse than the current
  * k-th. Safe for both the window N-family (k in the single digits) and
  * `capPerKey` corpus caps (k in the thousands).
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
    extends TypedImperativeAggregate[java.util.ArrayList[InternalRow]] {

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

  override def createAggregationBuffer(): java.util.ArrayList[InternalRow] =
    new java.util.ArrayList[InternalRow]()

  @transient private lazy val proj = UnsafeProjection.create(structType)

  override def update(buf: java.util.ArrayList[InternalRow],
      input: InternalRow): java.util.ArrayList[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return buf
    val raw = v.asInstanceOf[InternalRow]
    mode match {
      case "first" =>
        if (buf.size < n) buf.add(proj(raw).copy())
        buf
      case "last" =>
        // amortized-O(1) ring: append always, and when the list reaches
        // 2n compact to the last n with ONE arraycopy (vs an O(k) shift
        // per row once full) — eval/serialize slice the live tail
        buf.add(proj(raw).copy())
        if (buf.size >= 2L * n)
          new java.util.ArrayList(buf.subList(buf.size - n, buf.size))
        else buf
      case _ =>
        // sorted: O(1) reject when worse than the current k-th, else
        // binary-search upper bound (stable: after equals, so earlier
        // arrivals win ties) + one arraycopy insert
        if (buf.size == n && rowCmp.compare(raw, buf.get(n - 1)) >= 0) buf
        else {
          buf.add(upperBound(buf, raw), proj(raw).copy())
          if (buf.size > n) buf.remove(buf.size - 1)
          buf
        }
    }
  }

  /** First index whose row is strictly greater than `row` (insert point
    * AFTER any equal rows). */
  private def upperBound(buf: java.util.ArrayList[InternalRow],
      row: InternalRow): Int = {
    var lo = 0
    var hi = buf.size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (rowCmp.compare(row, buf.get(mid)) < 0) hi = mid else lo = mid + 1
    }
    lo
  }

  /** Last `min(n, size)` elements in order (the live tail of a "last"
    * ring; the identity for the other modes, whose size never exceeds n). */
  private def tail(buf: java.util.ArrayList[InternalRow]): java.util.List[InternalRow] =
    if (buf.size > n) buf.subList(buf.size - n, buf.size) else buf

  override def merge(buf: java.util.ArrayList[InternalRow],
      other: java.util.ArrayList[InternalRow]): java.util.ArrayList[InternalRow] =
    mode match {
      case "first" =>
        val it = other.iterator()
        while (buf.size < n && it.hasNext) buf.add(it.next())
        buf
      case "last" =>
        // arrival order: buf's partition first, then other's
        val all = new java.util.ArrayList[InternalRow](tail(buf))
        all.addAll(tail(other))
        if (all.size > n)
          new java.util.ArrayList(all.subList(all.size - n, all.size))
        else all
      case _ =>
        other.forEach { r =>
          if (buf.size < n || rowCmp.compare(r, buf.get(n - 1)) < 0) {
            buf.add(upperBound(buf, r), r)
            if (buf.size > n) buf.remove(buf.size - 1)
          }
        }
        buf
    }

  override def eval(buf: java.util.ArrayList[InternalRow]): Any = {
    val live = tail(buf)
    val out = new Array[Any](live.size)
    var i = 0
    while (i < live.size) { out(i) = live.get(i); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.ArrayList[InternalRow]): Array[Byte] = {
    val live = tail(buf)
    val bos = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(bos)
    dos.writeInt(live.size)
    live.forEach { r =>
      val u = r.asInstanceOf[UnsafeRow]
      val bytes = u.getBytes
      dos.writeInt(bytes.length)
      dos.write(bytes)
    }
    dos.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.ArrayList[InternalRow] = {
    val dis = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val size = dis.readInt()
    val buf = new java.util.ArrayList[InternalRow](size)
    var i = 0
    while (i < size) {
      val len = dis.readInt()
      val arr = new Array[Byte](len)
      dis.readFully(arr)
      val row = new UnsafeRow(structType.length)
      row.pointTo(arr, len)
      buf.add(row)
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
