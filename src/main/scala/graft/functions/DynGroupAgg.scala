package graft.functions

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.dynamic.{DynExpr, DynJson}

import scala.jdk.CollectionConverters._

/** ALL the accumulators of one dynamic-mode `$group` fused into a single
  * aggregate: the input is the message's JSON document (one string column),
  * the buffer is one slot per accumulator, and the output is the rendered
  * JSON object `{field1: v1, …}` the group stage splices after `_id`.
  *
  * Why custom (SURVEY §4): dynamic documents have no schema, so Spark's
  * typed min/max/sum cannot apply; and Mongo's `$max`/`$min` order across
  * TYPE BRACKETS (null < numbers < string < object < array < bool —
  * Group.java:287-320 via pincette-mongo `Util.compare`), which no builtin
  * ordering expresses. Fusing every accumulator into one
  * TypedImperativeAggregate keeps it ONE document parse per row and one
  * buffer, and map-side partial aggregation still applies (merge folds
  * buffers), so only accumulator states — never documents — cross the
  * shuffle. That is the 100 TB shape: shuffle bytes ∝ groups, not rows.
  *
  * Accumulator semantics (reference Group.java):
  *  - $sum ignores non-numeric values, stays integral when every input is
  *    integral (long result), else double
  *  - $avg is always double; $min/$max ignore null/missing (MongoDB
  *    documented behavior); cross-type uses the BSON bracket order
  *  - $push appends in encounter order; $addToSet dedupes on Mongo equality
  *    (1 == 1.0) keeping first-seen representation
  *  - $mergeObjects: later documents' fields win
  *  - $first/$last are encounter-order within a partition (Mongo makes the
  *    same no-total-order caveat without a preceding $sort)
  *  - $stdDevPop/$stdDevSamp: Welford/Chan parallel merge
  */
case class DynGroupAgg(
    child: Expression,
    specJson: String,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[JsonNode]] {

  import DynJson._

  /** (outField, op, compiled expression) per accumulator; compiled lazily on
    * each executor from the serializable spec. */
  @transient private lazy val accs: Array[(String, String, DynExpr.DOp)] = {
    val spec = parse(specJson)
    spec.asInstanceOf[ObjectNode].fields().asScala.map { e =>
      val acc = e.getValue.asInstanceOf[ObjectNode]
      val op = acc.fieldNames().next()
      (e.getKey, op, DynExpr.compile(DynStagesJson.toJValue(acc.get(op))))
    }.toArray
  }

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = StringType
  override def prettyName: String = "dyn_group_agg"

  override def createAggregationBuffer(): Array[JsonNode] =
    Array.fill(accs.length)(MISSING)

  override def update(buf: Array[JsonNode], input: InternalRow): Array[JsonNode] = {
    val v = child.eval(input)
    if (v != null) {
      val doc = parse(v.asInstanceOf[UTF8String].toString)
      val ctx = DynExpr.DCtx(doc, Map.empty)
      var i = 0
      while (i < accs.length) {
        val (_, op, expr) = accs(i)
        buf(i) = step(op, buf(i), expr.eval(ctx))
        i += 1
      }
    }
    buf
  }

  private def step(op: String, cur: JsonNode, value: JsonNode): JsonNode = op match {
    case "$sum" =>
      if (!value.isNumber) { if (isMissing(cur)) long(0) else cur }
      else if (isMissing(cur)) value
      else if (cur.isIntegralNumber && value.isIntegralNumber)
        long(cur.longValue + value.longValue)
      else double(cur.doubleValue + value.doubleValue)
    case "$count" =>
      if (isMissing(cur)) long(1) else long(cur.longValue + 1)
    case "$avg" =>
      if (!value.isNumber) cur
      else {
        val (s, c) =
          if (isMissing(cur)) (0d, 0L)
          else (cur.get("s").doubleValue, cur.get("c").longValue)
        val o = obj()
        o.set[JsonNode]("s", double(s + value.doubleValue))
        o.set[JsonNode]("c", long(c + 1))
        o
      }
    case "$min" | "$max" =>
      if (value.isNull || isMissing(value)) cur
      else if (isMissing(cur)) DynJson.copy(value)
      else {
        val c = compare(value, cur)
        if ((op == "$min" && c < 0) || (op == "$max" && c > 0)) DynJson.copy(value) else cur
      }
    case "$first" => if (isMissing(cur)) DynJson.copy(missingToNull(value)) else cur
    case "$last"  => DynJson.copy(missingToNull(value))
    case "$push" =>
      val a = if (isMissing(cur)) arr() else cur.asInstanceOf[ArrayNode]
      a.add(DynJson.copy(missingToNull(value)))
      a
    case "$addToSet" =>
      // buffer = array of elements; dedupe on Mongo equality at insert
      val a = if (isMissing(cur)) arr() else cur.asInstanceOf[ArrayNode]
      val v = missingToNull(value)
      if (!a.asScala.exists(deepEq(_, v))) a.add(DynJson.copy(v))
      a
    case "$mergeObjects" =>
      val o = if (isMissing(cur)) obj() else cur.asInstanceOf[ObjectNode]
      value match {
        case ov: ObjectNode =>
          ov.fields().asScala.foreach(e => o.set[JsonNode](e.getKey, DynJson.copy(e.getValue)))
        case _ => ()
      }
      o
    case "$stdDevPop" | "$stdDevSamp" =>
      if (!value.isNumber) cur
      else {
        val (n, mean, m2) =
          if (isMissing(cur)) (0L, 0d, 0d)
          else (cur.get("n").longValue, cur.get("mean").doubleValue, cur.get("m2").doubleValue)
        val x = value.doubleValue
        val n1 = n + 1
        val d = x - mean
        val mean1 = mean + d / n1
        val o = obj()
        o.set[JsonNode]("n", long(n1))
        o.set[JsonNode]("mean", double(mean1))
        o.set[JsonNode]("m2", double(m2 + d * (x - mean1)))
        o
      }
    case other =>
      throw new IllegalArgumentException(s"dynamic $$group: unsupported accumulator $other")
  }

  override def merge(a: Array[JsonNode], b: Array[JsonNode]): Array[JsonNode] = {
    var i = 0
    while (i < accs.length) {
      a(i) = mergeOne(accs(i)._2, a(i), b(i))
      i += 1
    }
    a
  }

  private def mergeOne(op: String, x: JsonNode, y: JsonNode): JsonNode =
    if (isMissing(x)) y
    else if (isMissing(y)) x
    else op match {
      case "$sum" =>
        if (x.isIntegralNumber && y.isIntegralNumber) long(x.longValue + y.longValue)
        else double(x.doubleValue + y.doubleValue)
      case "$count" => long(x.longValue + y.longValue)
      case "$avg" =>
        val o = obj()
        o.set[JsonNode]("s", double(x.get("s").doubleValue + y.get("s").doubleValue))
        o.set[JsonNode]("c", long(x.get("c").longValue + y.get("c").longValue))
        o
      case "$min" => if (compare(y, x) < 0) y else x
      case "$max" => if (compare(y, x) > 0) y else x
      case "$first" => x
      case "$last"  => y
      case "$push" =>
        x.asInstanceOf[ArrayNode].addAll(y.asInstanceOf[ArrayNode]); x
      case "$addToSet" =>
        val a = x.asInstanceOf[ArrayNode]
        y.asInstanceOf[ArrayNode].asScala.foreach { v =>
          if (!a.asScala.exists(deepEq(_, v))) a.add(v)
        }
        a
      case "$mergeObjects" =>
        val o = x.asInstanceOf[ObjectNode]
        y.asInstanceOf[ObjectNode].fields().asScala
          .foreach(e => o.set[JsonNode](e.getKey, e.getValue))
        o
      case "$stdDevPop" | "$stdDevSamp" => // Chan et al. parallel variance
        val (na, ma, m2a) = (x.get("n").longValue, x.get("mean").doubleValue, x.get("m2").doubleValue)
        val (nb, mb, m2b) = (y.get("n").longValue, y.get("mean").doubleValue, y.get("m2").doubleValue)
        val n = na + nb
        val d = mb - ma
        val o = obj()
        o.set[JsonNode]("n", long(n))
        o.set[JsonNode]("mean", double(ma + d * nb / n))
        o.set[JsonNode]("m2", double(m2a + m2b + d * d * na * nb / n))
        o
      case other =>
        throw new IllegalArgumentException(s"dynamic $$group: unsupported accumulator $other")
    }

  override def eval(buf: Array[JsonNode]): Any = {
    val out = obj()
    var i = 0
    while (i < accs.length) {
      val (field, op, _) = accs(i)
      val v = finish(op, buf(i))
      if (!isMissing(v)) out.set[JsonNode](field, v)
      i += 1
    }
    UTF8String.fromString(render(out))
  }

  private def finish(op: String, cur: JsonNode): JsonNode = op match {
    case "$sum" | "$count" => if (isMissing(cur)) long(0) else cur
    case "$avg" =>
      if (isMissing(cur)) NULL
      else double(cur.get("s").doubleValue / cur.get("c").longValue)
    case "$min" | "$max" | "$first" | "$last" => missingToNull(cur)
    case "$push" | "$addToSet" => if (isMissing(cur)) arr() else cur
    case "$mergeObjects" => if (isMissing(cur)) obj() else cur
    case "$stdDevPop" =>
      if (isMissing(cur) || cur.get("n").longValue == 0) NULL
      else double(math.sqrt(cur.get("m2").doubleValue / cur.get("n").longValue))
    case "$stdDevSamp" =>
      if (isMissing(cur) || cur.get("n").longValue < 2) NULL
      else double(math.sqrt(cur.get("m2").doubleValue / (cur.get("n").longValue - 1)))
    case other =>
      throw new IllegalArgumentException(s"dynamic $$group: unsupported accumulator $other")
  }

  /** Buffers serialize as one JSON array; each slot wraps its value in a
    * singleton array so the missing marker survives ([] = still unset). */
  override def serialize(buf: Array[JsonNode]): Array[Byte] = {
    val a = arr()
    buf.foreach { n =>
      val slot = arr()
      if (!isMissing(n)) slot.add(n)
      a.add(slot)
    }
    render(a).getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

  override def deserialize(bytes: Array[Byte]): Array[JsonNode] = {
    val a = parse(new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
      .asInstanceOf[ArrayNode]
    (0 until a.size).map { i =>
      val slot = a.get(i).asInstanceOf[ArrayNode]
      if (slot.size == 0) MISSING else slot.get(0)
    }.toArray
  }

  override def withNewMutableAggBufferOffset(offset: Int): DynGroupAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): DynGroupAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DynGroupAgg =
    copy(child = newChildren.head)
}

/** Jackson → json4s bridge for specs that were carried as rendered JSON. */
object DynStagesJson {
  def toJValue(n: JsonNode): org.json4s.JValue =
    org.json4s.jackson.JsonMethods.parse(DynJson.render(n))
}
