package graft.dynamic

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node._

import scala.jdk.CollectionConverters._

/** Value layer for the DYNAMIC (schemaless) document mode.
  *
  * The reference engine processes arbitrary `JsonObject` trees with no schema
  * at all (Pipeline.java:273); the typed engine in [[graft.Pipeline]] is
  * schema-first. This mode keeps each document as ONE JSON string column and
  * operates on parsed Jackson trees inside fused Catalyst expressions — the
  * Spark-native answer to heterogeneously-typed fields, computed keys and
  * deep merges that a fixed StructType cannot represent.
  *
  * Jackson (already on Spark's classpath) is the tree model; `MissingNode`
  * doubles as Mongo's missing-vs-null distinction.
  */
object DynJson {

  /** ObjectMapper is thread-safe after configuration; one per JVM. */
  val mapper: ObjectMapper = new ObjectMapper
  val nodes: JsonNodeFactory = JsonNodeFactory.instance

  val MISSING: JsonNode = MissingNode.getInstance

  def parse(s: String): JsonNode = mapper.readTree(s)
  def render(n: JsonNode): String = mapper.writeValueAsString(n)

  def obj(): ObjectNode = nodes.objectNode()
  def arr(): ArrayNode = nodes.arrayNode()

  def isMissing(n: JsonNode): Boolean = n == null || n.isMissingNode
  def missingToNull(n: JsonNode): JsonNode = if (isMissing(n)) NullNode.getInstance else n

  def long(l: Long): JsonNode = nodes.numberNode(l)
  def double(d: Double): JsonNode = nodes.numberNode(d)
  def text(s: String): JsonNode = nodes.textNode(s)
  def bool(b: Boolean): JsonNode = if (b) BooleanNode.TRUE else BooleanNode.FALSE
  val NULL: JsonNode = NullNode.getInstance

  /** A number node keeping integral results integral (Mongo int/long vs
    * double distinction; 2 + 3 is 5, not 5.0). */
  def num(d: Double, integral: Boolean): JsonNode =
    if (integral && d.isWhole && math.abs(d) <= Long.MaxValue.toDouble) long(d.toLong)
    else double(d)

  def isIntegral(n: JsonNode): Boolean = n.isIntegralNumber

  /** Mongo BSON type-bracket rank for the JSON subset (BSON spec order:
    * Null < Numbers < String < Object < Array < Boolean).
    * Group.java:287-320 relies on this total order via pincette-mongo.
    * MISSING ranks WITH null: aggregation comparisons ($cmp of an absent
    * path against null is 0), sorts, and $group keys all treat a missing
    * field as null — the differential fuzzer caught `$lte: [null,
    * missing]` filtering differently across engines under the old
    * missing-below-null rank. Query-language semantics that DO
    * distinguish missing ($exists, $type, range-match misses) test
    * isMissing before ranking. */
  def typeRank(n: JsonNode): Int =
    if (n == null || isMissing(n) || n.isNull) 1
    else if (n.isNumber) 2
    else if (n.isTextual) 3
    else if (n.isObject) 4
    else if (n.isArray) 5
    else if (n.isBoolean) 6
    else 7

  /** Total order across types (the Mongo sort/compare order). Within
    * numbers it compares numerically regardless of int/double repr. */
  def compare(a0: JsonNode, b0: JsonNode): Int = {
    val a = if (a0 == null) MISSING else a0
    val b = if (b0 == null) MISSING else b0
    val (ra, rb) = (typeRank(a), typeRank(b))
    if (ra != rb) Integer.compare(ra, rb)
    else
      ra match {
        case 0 | 1 => 0
        case 2 =>
          if (a.isIntegralNumber && b.isIntegralNumber)
            java.lang.Long.compare(a.longValue, b.longValue)
          else java.lang.Double.compare(a.doubleValue, b.doubleValue)
        case 3 => a.textValue.compareTo(b.textValue)
        case 4 => // BSON object compare: pairwise (name, value) in order
          val ia = a.fields(); val ib = b.fields()
          var r = 0
          while (r == 0 && ia.hasNext && ib.hasNext) {
            val ea = ia.next(); val eb = ib.next()
            r = ea.getKey.compareTo(eb.getKey)
            if (r == 0) r = compare(ea.getValue, eb.getValue)
          }
          if (r != 0) r
          else java.lang.Boolean.compare(ia.hasNext, ib.hasNext)
        case 5 =>
          var r = 0
          var i = 0
          val n = math.min(a.size, b.size)
          while (r == 0 && i < n) { r = compare(a.get(i), b.get(i)); i += 1 }
          if (r != 0) r else Integer.compare(a.size, b.size)
        case 6 => java.lang.Boolean.compare(a.booleanValue, b.booleanValue)
        case _ => 0
      }
  }

  /** Order-preserving byte encoding of [[compare]]'s total order: UNSIGNED
    * lexicographic comparison of `sortableKey` bytes matches `compare` for
    * missing/null/number/string/boolean — which lets a Spark BinaryType
    * column carry the cross-type BSON order through shuffles, sorts and
    * windows (Spark compares binary unsigned-lexicographically).
    *
    * Numbers encode as sign-flipped IEEE-754 bits (the classic trick:
    * negative doubles bit-inverted, positives with the sign bit flipped),
    * so longs beyond 2^53 collapse to their double — same caveat as
    * [[compare]]'s double path. Containers encode as canonical JSON under
    * their rank byte: ordered WITHIN the type bracket, but by JSON text,
    * not BSON element order (documented deviation; scalar sort keys are
    * the overwhelmingly common case). */
  def sortableKey(n0: JsonNode): Array[Byte] = {
    val n = if (n0 == null) MISSING else n0
    val rank = typeRank(n).toByte
    if (n.isNumber) {
      val bits = java.lang.Double.doubleToLongBits(n.doubleValue)
      val flipped = if (bits < 0) ~bits else bits ^ java.lang.Long.MIN_VALUE
      java.nio.ByteBuffer.allocate(9).put(rank).putLong(flipped).array()
    } else if (n.isTextual)
      rank +: n.textValue.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    else if (n.isBoolean) Array(rank, if (n.booleanValue) 1.toByte else 0.toByte)
    else if (isMissing(n) || n.isNull) Array(rank)
    else rank +: canonical(n).getBytes(java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Mongo equality: numeric across representations, structural for
    * containers (1 == 1.0; {a:1} == {a:1.0}). */
  def deepEq(a: JsonNode, b: JsonNode): Boolean = compare(a, b) == 0

  val mongoOrder: Ordering[JsonNode] = (a: JsonNode, b: JsonNode) => compare(a, b)

  /** Mongo truthiness ($cond and friends): null/missing/false/0 are falsy. */
  def truthy(n: JsonNode): Boolean =
    !(isMissing(n) || n.isNull ||
      (n.isBoolean && !n.booleanValue) ||
      (n.isNumber && n.doubleValue == 0d))

  /** Mongo $type name. */
  def typeName(n: JsonNode): String =
    if (isMissing(n)) "missing"
    else if (n.isNull) "null"
    else if (n.isBoolean) "bool"
    else if (n.isIntegralNumber) "long"
    else if (n.isNumber) "double"
    else if (n.isTextual) "string"
    else if (n.isArray) "array"
    else "object"

  /** Canonical rendering for GROUP KEYS and $addToSet identity: integral
    * doubles collapse to longs so 1 and 1.0 land in the same group (Mongo
    * groups them together); objects keep field order (BSON order matters). */
  def canonical(n0: JsonNode): String = {
    def canon(n: JsonNode): JsonNode = n match {
      case d if d.isNumber =>
        if (d.isIntegralNumber) long(d.longValue)
        else if (d.doubleValue.isWhole && math.abs(d.doubleValue) < 9.007199254740992e15)
          long(d.doubleValue.toLong)
        else double(d.doubleValue)
      case o: ObjectNode =>
        val out = obj()
        o.fields().asScala.foreach(e => out.set[JsonNode](e.getKey, canon(e.getValue)))
        out
      case a: ArrayNode =>
        val out = arr()
        a.asScala.foreach(e => out.add(canon(e)))
        out
      case other => other
    }
    render(canon(missingToNull(n0)))
  }

  /** Deep copy (stages mutate in place; inputs shared across stages in one
    * fused pass are owned by the row, but $group state must not alias). */
  def copy(n: JsonNode): JsonNode = n.deepCopy[JsonNode]()
}
