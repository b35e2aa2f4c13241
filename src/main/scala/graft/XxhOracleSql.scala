package graft

/** DuckDB oracle SQL for the three xxhash64-based queries the driver could
  * not replay before round 17 (`llm_simhash_neardup`, `llm_minhash_pairs`,
  * `llm_ann_ivf` — `err: "no_oracle"` in CORRECTNESS_r15/r16): Spark's XXH64
  * (seeded xxHash64 over UTF-8 bytes, the public algorithm in
  * org.apache.spark.sql.catalyst.expressions.XXH64) implemented in pure
  * DuckDB SQL over HUGEINT (int128) with explicit mod-2^64 wrapping, so the
  * oracle recomputes signatures/banding/k-means seeding bit-for-bit from the
  * parquet inputs with no Spark involvement.
  *
  * DuckDB-1.0 constraints that shape the generated SQL (all measured):
  *  - lateral column aliases and once-referenced CTEs are inlined TEXTUALLY
  *    (no CSE), so a chained h1=f(h0), h2=g(h1)... formulation multiplies
  *    expression-tree size by the reference count per step — exponential
  *    plan-time blowup. Every fold step therefore lives in its own
  *    `AS MATERIALIZED` CTE whose expression references only raw columns.
  *  - `list_reduce` mis-evaluates rows in fused pipelines with varying list
  *    lengths (one corrupted hash out of 31 tokens at sf0.001, correct when
  *    the same input is pre-materialized), so folds over variable-length op
  *    lists use a RECURSIVE CTE instead; it is only needed for inputs >= 32
  *    bytes (the banding bucket strings), where XXH64's stripe loop is
  *    unbounded.
  *  - HUGEINT division is not strength-reduced: `% 4294967296` in the
  *    32x32-bit wrapping multiply cost 221 s over the 520k-row minhash fold
  *    vs ~14 s with `& 4294967295` / `>> 32`.
  *  - an expression argument referenced k times by a step is re-evaluated k
  *    times (no CSE): the little-endian words of each string are extracted
  *    once as columns (`__w1..__w3, __k4, __b1..__b3`), never inline.
  */
object XxhOracleSql {
  private val M = "18446744073709551615::HUGEINT"
  private val P1 = "11400714785074694791::HUGEINT" // 0x9E3779B185EBCA87
  private val P2 = "14029467366897019727::HUGEINT" // 0xC2B2AE3D27D4EB4F
  private val P3 = "1609587929392839161::HUGEINT" // 0x165667B19E3779F9
  private val P4 = "9650029242287828579::HUGEINT" // 0x85EBCA77C2B2AE63
  private val P5 = "2870177450012600261::HUGEINT" // 0x27D4EB2F165667C5

  /** 64-bit wrapping multiply via 32-bit halves (HUGEINT holds the <= 2^98
    * intermediates exactly); power-of-two steps are bit ops, never `%`/`//`. */
  private def mul64(a: String, b: String): String =
    s"(((($a) & 4294967295) * (($b) & 4294967295) + " +
      s"((((($a) >> 32) * (($b) & 4294967295) + " +
      s"(($a) & 4294967295) * (($b) >> 32)) & 4294967295) " +
      s"<< 32)) & $M)"
  private def add64(a: String, b: String): String = s"((($a) + ($b)) & $M)"
  private def rotl(x: String, r: Int): String =
    s"(((($x) << $r) & $M) | (($x) >> ${64 - r}))"
  private def xorS(a: String, b: String): String =
    s"xor(($a)::HUGEINT, ($b)::HUGEINT)"

  // XXH64 step formulas (Spark XXH64.java, public)
  private def srnd(v: String, k: String): String = // stripe lane round
    mul64(rotl(add64(v, mul64(k, P2)), 31), P1)
  private def wstep(h: String, k: String): String = // 8-byte tail word
    add64(mul64(rotl(xorS(h, mul64(rotl(mul64(k, P2), 31), P1)), 27), P1), P4)
  private def i4step(h: String, k: String): String = // 4-byte tail word
    add64(mul64(rotl(xorS(h, mul64(k, P1)), 23), P2), P3)
  private def bstep(h: String, b: String): String = // single tail byte
    mul64(rotl(xorS(h, mul64(b, P5)), 11), P1)
  private def mstep(h: String, v: String): String = // stripe-merge fold
    add64(mul64(xorS(h, mul64(rotl(mul64(v, P2), 31), P1)), P1), P4)
  private def fmixExpr(h: String): String = {
    var e = xorS(h, s"($h) >> 33")
    e = mul64(e, P2)
    e = xorS(e, s"($e) >> 29")
    e = mul64(e, P3)
    xorS(e, s"($e) >> 32")
  }

  /** UTF-8 bytes of column `__s` as a HUGEINT list + length, via hex(). */
  private val bytesCols: String =
    "octet_length(encode(__s)) AS n, hex(encode(__s)) AS __hx, " +
      "list_transform(range(1, octet_length(encode(__s)) + 1), i -> " +
      "CAST(strpos('0123456789ABCDEF', substr(__hx, 2*i-1, 1)) * 16 " +
      "+ strpos('0123456789ABCDEF', substr(__hx, 2*i, 1)) - 17 AS HUGEINT)) AS bs"

  private def signed(c: String): String =
    s"CAST(CASE WHEN $c >= 9223372036854775808::HUGEINT " +
      s"THEN $c - 18446744073709551616::HUGEINT ELSE $c END AS BIGINT)"

  /** Fixed 9-level materialized unroll of XXH64 for inputs < 32 bytes (all
    * corpus tokens <= 8 B, shingles <= 26 B); >= 32 bytes raises error() so
    * an out-of-domain input fails the oracle loudly rather than silently
    * dropping rows. From `base` ({keys}, bs, n) produces `{out}` ({keys},
    * __xxh HUGEINT in [0, 2^64)). */
  private def xxhShortCtes(base: String, keys: String, seed: String,
      out: String): String = {
    val h0 = add64(add64(s"($seed)", P5), "n::HUGEINT")
    val carry = s"$keys, n, __w1, __w2, __w3, __k4, __b1, __b2, __b3"
    def lvl(name: String, prev: String, hExpr: String): String =
      s"$name AS MATERIALIZED (SELECT $carry, ($hExpr)::HUGEINT AS h FROM $prev)"
    def wz(o: String, k: Int): String = // LE word; absent bytes read as 0
      "(" + (0 until k).map(j =>
        s"(coalesce(bs[($o) + ${j + 1}], 0::HUGEINT) << ${8 * j})")
        .mkString(" + ") + ")"
    val ob = "((n // 8) * 8 + CASE WHEN (n % 8) >= 4 THEN 4 ELSE 0 END)"
    val ctes = Seq.newBuilder[String]
    ctes += s"""${out}_s0 AS MATERIALIZED (
  SELECT $keys, n,
         ${wz("0", 8)} AS __w1, ${wz("8", 8)} AS __w2, ${wz("16", 8)} AS __w3,
         ${wz("(n // 8) * 8", 4)} AS __k4,
         coalesce(bs[$ob + 1], 0::HUGEINT) AS __b1,
         coalesce(bs[$ob + 2], 0::HUGEINT) AS __b2,
         coalesce(bs[$ob + 3], 0::HUGEINT) AS __b3,
         CASE WHEN n >= 32 THEN CAST(error('xxh64 oracle supports < 32 bytes, got ' || n) AS HUGEINT)
              ELSE ($h0)::HUGEINT END AS h
  FROM $base)"""
    for (w <- 1 to 3)
      ctes += lvl(s"${out}_s$w", s"${out}_s${w - 1}",
        s"CASE WHEN n // 8 >= $w THEN ${wstep("h", s"__w$w")} ELSE h END")
    ctes += lvl(s"${out}_s4", s"${out}_s3",
      s"CASE WHEN (n % 8) >= 4 THEN ${i4step("h", "__k4")} ELSE h END")
    for (j <- 1 to 3)
      ctes += lvl(s"${out}_s${4 + j}", s"${out}_s${3 + j}",
        s"CASE WHEN (n % 4) >= $j THEN ${bstep("h", s"__b$j")} ELSE h END")
    ctes += s"""$out AS (
  SELECT $keys, (${fmixExpr("h")})::HUGEINT AS __xxh FROM ${out}_s7)"""
    ctes.result().mkString(",\n")
  }

  // ---- general-length fold (recursive CTE over an opcode list) — used
  // only for the >= 32-byte banding bucket strings ----

  private def st(c: Int, k1: String = "0::HUGEINT", k2: String = "0::HUGEINT",
      k3: String = "0::HUGEINT", k4: String = "0::HUGEINT",
      h: String = "0::HUGEINT", v1: String = "0::HUGEINT",
      v2: String = "0::HUGEINT", v3: String = "0::HUGEINT",
      v4: String = "0::HUGEINT"): String =
    s"{'c': $c, 'k1': ($k1)::HUGEINT, 'k2': ($k2)::HUGEINT, " +
      s"'k3': ($k3)::HUGEINT, 'k4': ($k4)::HUGEINT, 'h': ($h)::HUGEINT, " +
      s"'v1': ($v1)::HUGEINT, 'v2': ($v2)::HUGEINT, 'v3': ($v3)::HUGEINT, " +
      s"'v4': ($v4)::HUGEINT}"

  private def le(o: String, k: Int): String =
    "(" + (0 until k).map(j => s"(bs[($o) + ${j + 1}] << ${8 * j})")
      .mkString(" + ") + ")"

  /** Opcode columns: 0 stripe round; 1 merge-init; 2..5 merge-fold v1..v4;
    * 7 add length; 8 word; 9 4-byte; 10 byte; 11..15 fmix steps. */
  private def opsCols(seed: String): Seq[String] = {
    val init = st(-1, h = add64(seed, P5),
      v1 = add64(add64(seed, P1), P2), v2 = add64(seed, P2),
      v3 = s"(($seed) & $M)",
      v4 = s"((($seed) - ($P1) + 36893488147419103232::HUGEINT) & $M)")
    val stripeOp = st(0, k1 = le("x*32", 8), k2 = le("x*32+8", 8),
      k3 = le("x*32+16", 8), k4 = le("x*32+24", 8))
    val wordOp = st(8, k1 = le("__nst*32 + x*8", 8))
    val byteOp = st(10, k1 = "bs[__ob + x + 1]")
    val mergeOps = Seq(1, 2, 3, 4, 5).map(st(_)).mkString(", ")
    val fmixOps = Seq(11, 12, 13, 14, 15).map(st(_)).mkString(", ")
    Seq(
      "(n // 32) AS __nst",
      "((n - __nst * 32) // 8) AS __nw",
      "(__nst * 32 + __nw * 8) AS __o4",
      "CASE WHEN n - __o4 >= 4 THEN __o4 + 4 ELSE __o4 END AS __ob",
      s"""list_concat(list_concat(list_concat(list_concat(list_concat(
      [$init],
      CASE WHEN __nst > 0 THEN list_concat(
        list_transform(range(__nst), x -> $stripeOp), [$mergeOps])
      ELSE [] END),
      [${st(7, k1 = "n::HUGEINT")}]),
      list_transform(range(__nw), x -> $wordOp)),
      CASE WHEN n - __o4 >= 4 THEN [${st(9, k1 = le("__o4", 4))}] ELSE [] END),
      list_concat(
        list_transform(range(n - __ob), x -> $byteOp),
        [$fmixOps])) AS __ops""")
  }

  private def stepExpr(acc: String, op: String): String = {
    def a(f: String) = s"struct_extract($acc, '$f')"
    def o(f: String) = s"struct_extract($op, '$f')"
    val keepV = s"'v1': ${a("v1")}, 'v2': ${a("v2")}, 'v3': ${a("v3")}, 'v4': ${a("v4")}"
    val zk = "'c': 0, 'k1': 0::HUGEINT, 'k2': 0::HUGEINT, 'k3': 0::HUGEINT, 'k4': 0::HUGEINT"
    def ret(hExpr: String) = s"{$zk, 'h': ($hExpr)::HUGEINT, $keepV}"
    val mergeInit = add64(add64(rotl(a("v1"), 1), rotl(a("v2"), 7)),
      add64(rotl(a("v3"), 12), rotl(a("v4"), 18)))
    s"""CASE struct_extract($op, 'c')
      WHEN 0 THEN {$zk, 'h': ${a("h")},
        'v1': ${srnd(a("v1"), o("k1"))}, 'v2': ${srnd(a("v2"), o("k2"))},
        'v3': ${srnd(a("v3"), o("k3"))}, 'v4': ${srnd(a("v4"), o("k4"))}}
      WHEN 1 THEN ${ret(mergeInit)}
      WHEN 2 THEN ${ret(mstep(a("h"), a("v1")))}
      WHEN 3 THEN ${ret(mstep(a("h"), a("v2")))}
      WHEN 4 THEN ${ret(mstep(a("h"), a("v3")))}
      WHEN 5 THEN ${ret(mstep(a("h"), a("v4")))}
      WHEN 7 THEN ${ret(add64(a("h"), o("k1")))}
      WHEN 8 THEN ${ret(wstep(a("h"), o("k1")))}
      WHEN 9 THEN ${ret(i4step(a("h"), o("k1")))}
      WHEN 10 THEN ${ret(bstep(a("h"), o("k1")))}
      WHEN 11 THEN ${ret(xorS(a("h"), s"(${a("h")}) >> 33"))}
      WHEN 12 THEN ${ret(mul64(a("h"), P2))}
      WHEN 13 THEN ${ret(xorS(a("h"), s"(${a("h")}) >> 29"))}
      WHEN 14 THEN ${ret(mul64(a("h"), P3))}
      ELSE ${ret(xorS(a("h"), s"(${a("h")}) >> 32"))} END"""
  }

  private def foldCtes(base: String, keys: String, name: String): String =
    s"""__f$name AS (
  SELECT $keys, __ops, 1 AS __i, __ops[1] AS __a FROM $base
  UNION ALL
  SELECT $keys, __ops, __i + 1,
         ${stepExpr("__a", "__ops[__i + 1]")}
  FROM __f$name WHERE __i < len(__ops)),
$name AS (SELECT $keys, struct_extract(__a, 'h') AS __xxh
  FROM __f$name WHERE __i = len(__ops))"""

  // ---- Spark XXH64.hashInt in Scala (wrapping Long arithmetic), for the
  // per-band bucket seeds: Spark's xxhash64(lit(b), str) hashes the INT
  // literal first (hashInt(b, 42)) and uses the result as the string seed.
  private val P1L = 0x9E3779B185EBCA87L
  private val P2L = 0xC2B2AE3D27D4EB4FL
  private val P3L = 0x165667B19E3779F9L
  private val P5L = 0x27D4EB2F165667C5L
  private def fmixL(h0: Long): Long = {
    var h = h0
    h ^= h >>> 33; h *= P2L; h ^= h >>> 29; h *= P3L; h ^= h >>> 32
    h
  }
  private def hashIntL(i: Int, seed: Long): Long = {
    var h = seed + P5L + 4L
    h ^= (i & 0xFFFFFFFFL) * P1L
    h = java.lang.Long.rotateLeft(h, 23) * P2L + P3L
    fmixL(h)
  }
  private def unsignedHuge(v: Long): String =
    java.lang.Long.toUnsignedString(v) + "::HUGEINT"

  /** All pairs within Hamming distance 3 over the 64-bit xxhash64 SimHash —
    * exactly `DedupOps.simhashNearDup`'s output: the 16-bit-chunk bucketing
    * is COMPLETE for maxHamming <= 3 by the pigeonhole principle, so the
    * bucketed candidate set equals the all-pairs set and the oracle can
    * skip the banding. */
  def simhashNearDup: String =
    s"""WITH RECURSIVE
dt AS (SELECT min(doc_id) AS doc, text FROM documents GROUP BY text),
tk AS (SELECT doc, unnest(list_distinct(list_filter(
         regexp_split_to_array(trim(lower(text)), '\\s+'),
         x -> length(x) > 0))) AS __s FROM dt),
tb AS (SELECT __s, $bytesCols FROM (SELECT DISTINCT __s FROM tk) u),
${xxhShortCtes("tb", "__s", "42::HUGEINT", "xh")},
th AS (SELECT tk.doc, xh.__xxh FROM tk JOIN xh ON xh.__s = tk.__s),
v AS (SELECT doc, j.j,
        CASE WHEN (__xxh >> j.j) & 1 = 1 THEN 1 ELSE -1 END AS vote
      FROM th CROSS JOIN (SELECT unnest(range(64)) AS j) j),
sb AS (SELECT doc, j, CASE WHEN sum(vote) > 0 THEN (1::HUGEINT << j)
                           ELSE 0::HUGEINT END AS bitv
       FROM v GROUP BY doc, j),
sg AS (SELECT doc, ${signed("sum(bitv)")} AS sig FROM sb GROUP BY doc),
p AS (SELECT a.doc AS id_a, b.doc AS id_b,
             bit_count(xor(a.sig, b.sig)) AS hamming
      FROM sg a JOIN sg b ON a.doc < b.doc)
SELECT id_a, id_b, CAST(hamming AS INT) AS hamming FROM p WHERE hamming <= 3"""

  /** Full `DedupOps.minhashLsh` replay: 32 seeded-XXH64 min-signatures over
    * word 3-shingles, 8x4 banding with Spark's `xxhash64(lit(band),
    * cast(slice(sig) as string))` bucket key (the string render of a LONG
    * slice, hashed with hashInt(band, 42) as seed — the string is 12..88
    * bytes, hence the recursive general-length fold), candidate pairs from
    * bucket co-membership, exact-Jaccard verification at 0.4. */
  def minhashPairs: String = {
    val bands = 8; val rowsPerBand = 4; val num = bands * rowsPerBand
    val bandSeeds = (0 until bands)
      .map(b => s"($b, ${unsignedHuge(hashIntL(b, 42L))})").mkString(", ")
    val bops = opsCols("bseed").mkString(",\n  ")
    s"""WITH RECURSIVE
dt AS (SELECT min(doc_id) AS doc, text FROM documents GROUP BY text),
d AS (SELECT doc, list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
             x -> length(x) > 0) AS toks FROM dt),
s AS (SELECT doc, CASE WHEN len(toks) >= 3 THEN
        list_distinct(list_transform(range(1, len(toks) - 1),
          i -> array_to_string(toks[i:i+2], ' ')))
      WHEN len(toks) > 0 THEN [array_to_string(toks, ' ')] ELSE [] END AS sh FROM d),
sn AS (SELECT doc, sh FROM s WHERE len(sh) > 0),
e AS (SELECT doc, unnest(sh) AS __s FROM sn),
tb0 AS (SELECT __s, $bytesCols FROM (SELECT DISTINCT __s FROM e) u),
tb AS (SELECT __s, bs, n, seed.seed FROM tb0
       CROSS JOIN (SELECT unnest(range($num)) AS seed) seed),
${xxhShortCtes("tb", "__s, seed", "seed::HUGEINT", "xh")},
hv AS (SELECT __s, seed, ${signed("__xxh")} AS hv FROM xh),
m AS (SELECT e.doc, hv.seed, min(hv.hv) AS minh
      FROM e JOIN hv ON hv.__s = e.__s GROUP BY e.doc, hv.seed),
sg AS (SELECT doc, band,
         '[' || string_agg(minh, ', ' ORDER BY seed) || ']' AS __s
       FROM (SELECT doc, seed, seed // $rowsPerBand AS band, minh FROM m) q
       GROUP BY doc, band),
bss AS (SELECT doc, band, bseed, $bytesCols
        FROM (SELECT sg.*, bsd.bseed FROM sg
              JOIN (VALUES $bandSeeds) bsd(band, bseed) USING (band)) w),
bso AS (SELECT doc, band, bs, n, $bops FROM bss),
${foldCtes("bso", "doc, band", "bh")},
p AS (SELECT DISTINCT a.doc AS id_a, b.doc AS id_b
      FROM bh a JOIN bh b ON a.band = b.band AND a.__xxh = b.__xxh
        AND a.doc < b.doc),
j AS (SELECT p.id_a, p.id_b,
             round(CAST(len(list_intersect(x.sh, y.sh)) AS DOUBLE) /
                   len(list_distinct(x.sh || y.sh)), 6) AS jaccard
      FROM p JOIN sn x ON x.doc = p.id_a JOIN sn y ON y.doc = p.id_b)
SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= 0.4"""
  }

  private def lloydIter(i: Int, prevCents: String): String =
    s"""a$i AS (SELECT vec_id, v, list FROM (
  SELECT n.vec_id, n.v, c.list,
         row_number() OVER (PARTITION BY n.vec_id
           ORDER BY -list_inner_product(n.v, c.vec) ASC, c.list ASC) AS rn
  FROM n, $prevCents c) q WHERE rn = 1),
m$i AS (SELECT list, i.range AS pos, avg(v[i.range + 1]) AS m
  FROM a$i, range(0, 64) i GROUP BY list, i.range),
l$i AS (SELECT list, list(m ORDER BY pos) AS mv FROM m$i GROUP BY list),
c$i AS (SELECT p.list,
  CASE WHEN l.mv IS NULL THEN p.vec
       WHEN sqrt(list_inner_product(l.mv, l.mv)) > 0 THEN
         list_transform(l.mv, x -> x / sqrt(list_inner_product(l.mv, l.mv)))
       ELSE l.mv END AS vec
  FROM $prevCents p LEFT JOIN l$i l USING (list))"""

  /** Full `VectorOps.ivfTopK` replay: deterministic seeding by the 16
    * lowest `xxhash64(cast(vec_id as string))` rows, two unrolled spherical
    * Lloyd iterations (assign by max-dot argmin with list-index tiebreak,
    * per-dimension mean, renormalize, empty lists keep their centroid),
    * nProbe=2 probing, top-5 by (sim desc, nn_id). */
  def annIvf: String = {
    val k = 5; val nLists = 16; val nProbe = 2
    s"""WITH RECURSIVE
u AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v0
      FROM embeddings),
n AS (SELECT vec_id,
        CASE WHEN sqrt(list_inner_product(v0, v0)) > 0 THEN
          list_transform(v0, x -> x / sqrt(list_inner_product(v0, v0)))
        ELSE v0 END AS v
      FROM u),
ids AS (SELECT vec_id, CAST(vec_id AS VARCHAR) AS __s FROM n),
idb AS (SELECT vec_id, $bytesCols FROM ids),
${xxhShortCtes("idb", "vec_id", "42::HUGEINT", "ih")},
seed AS (SELECT n.vec_id, n.v,
           row_number() OVER (ORDER BY ${signed("ih.__xxh")} ASC) AS rn
         FROM n JOIN ih USING (vec_id)),
c0 AS (SELECT CAST(rn - 1 AS INT) AS list, v AS vec FROM seed WHERE rn <= $nLists),
${lloydIter(1, "c0")},
${lloydIter(2, "c1")},
asg AS (SELECT vec_id, v, list FROM (
  SELECT n.vec_id, n.v, c.list,
         row_number() OVER (PARTITION BY n.vec_id
           ORDER BY -list_inner_product(n.v, c.vec) ASC, c.list ASC) AS rn
  FROM n, c2 c) q WHERE rn = 1),
q AS (SELECT vec_id AS query_id, v AS qv, list FROM (
  SELECT n.vec_id, n.v, c.list,
         row_number() OVER (PARTITION BY n.vec_id
           ORDER BY -list_inner_product(n.v, c.vec) ASC, c.list ASC) AS rn
  FROM n, c2 c WHERE n.vec_id % 100 = 0) p WHERE rn <= $nProbe),
cand AS (SELECT q.query_id, a.vec_id AS nn_id,
                list_inner_product(a.v, q.qv) AS sim
         FROM asg a JOIN q ON a.list = q.list
         WHERE a.vec_id <> q.query_id),
r AS (SELECT query_id, nn_id, sim,
             row_number() OVER (PARTITION BY query_id
               ORDER BY sim DESC, nn_id) AS rnk
      FROM cand)
SELECT query_id, nn_id, round(sim, 6) AS sim, CAST(rnk AS INT) AS rank
FROM r WHERE rnk <= $k"""
  }
}
