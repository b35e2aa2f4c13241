package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftops.ColumnBridge

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** The md5-based 63-bit hash of [[graft.llm.DedupOps.md5Lower63]], computed
  * in the JVM: little-endian uint64 of md5-digest bytes 8..15, masked to 63
  * bits — bit-identical to DuckDB's `md5_number_lower(x) & (2^63-1)`. */
object Md5Hash {
  def lower63(md: MessageDigest, bytes: Array[Byte]): Long = {
    md.reset()
    val d = md.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 8) { v |= (d(8 + i) & 0xffL) << (8 * i); i += 1 }
    v & Long.MaxValue
  }
}

/** Cross-engine-reproducible MinHash signature as ONE aggregate: same shape
  * as [[MinHashAgg]] (one Array[Long] buffer, elementwise-min merge,
  * map-side partials) but the hash family is `md5(seed + ":" + shingle)`
  * lowered per [[Md5Hash.lower63]]. Replaces the explode-by-seed
  * formulation, which shuffled numHashes rows per shingle — this shuffles
  * numHashes longs per DOC. */
case class Md5MinHashAgg(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5_minhash_agg"

  @transient private lazy val md = MessageDigest.getInstance("MD5")

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val shingle = v.asInstanceOf[UTF8String].toString
      var j = 0
      while (j < numHashes) {
        val h = Md5Hash.lower63(md,
          (j.toString + ":" + shingle).getBytes(StandardCharsets.UTF_8))
        if (h < buf(j)) buf(j) = h
        j += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < numHashes) { if (b(j) < a(j)) a(j) = b(j); j += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numHashes)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(offset: Int): Md5MinHashAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): Md5MinHashAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Md5MinHashAgg =
    copy(child = newChildren.head)
}

/** Cross-engine-reproducible 63-bit SimHash as ONE aggregate: per-token
  * [[Md5Hash.lower63]], per-bit signed votes (strictly-positive vote sets
  * the bit, matching the SQL replay). Same shape as [[SimHashAgg]]. */
case class Md5SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_simhash_agg"

  @transient private lazy val md = MessageDigest.getInstance("MD5")

  override def createAggregationBuffer(): Array[Int] = new Array[Int](63)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = Md5Hash.lower63(md,
        v.asInstanceOf[UTF8String].toString.getBytes(StandardCharsets.UTF_8))
      var i = 0
      while (i < 63) {
        if (((h >>> i) & 1L) == 1L) buf(i) += 1 else buf(i) -= 1
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 63) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Int]): Any = {
    var sig = 0L
    var i = 0
    while (i < 63) { if (buf(i) > 0) sig |= (1L << i); i += 1 }
    sig
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 * 63)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(63)(bb.getInt)
  }

  override def withNewMutableAggBufferOffset(offset: Int): Md5SimHashAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): Md5SimHashAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Md5SimHashAgg =
    copy(child = newChildren.head)
}

object Md5HashAggs {
  def minhash(c: Column, numHashes: Int): Column =
    ColumnBridge.column(
      Md5MinHashAgg(ColumnBridge.expression(c), numHashes).toAggregateExpression())
  def simhash(c: Column): Column =
    ColumnBridge.column(
      Md5SimHashAgg(ColumnBridge.expression(c)).toAggregateExpression())
}
