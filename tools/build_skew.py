#!/usr/bin/env python3
"""Build a ZIPF-SKEWED replica — the axis tools/build_sf1.py can't probe.

build_sf1.py multiplies every key UNIFORMLY; real corpora are zipfian
(one viral doc / hot customer / dominant domain can be 1e4x the median).
This builder replicates selected tables with PER-ROW multiplicities
m_r ~ C / rank^s (s=1.1), ranked by a hash of the SKEW AXIS column so
the hot key's rows get the largest multiplicities:

- orders:    ranked by hash(o_custkey) — ONE customer ends up owning a
             double-digit percentage of all orders (hot foreign key for
             q_lookup_agg's join, hot volume for q_group_global / the
             $merge batch). o_orderkey gets the +j*1e7 copy offset
             (stays unique); o_custkey replicates VERBATIM (the skew).
- lineitem:  ranked by hash(l_returnflag, l_linestatus) — one of the 6
             groups dominates (hot group key for q_group's partial agg).
             l_orderkey/l_partkey/l_suppkey offset; group cols verbatim.
- documents: ranked by hash(source) — one domain dominates
             (llm_domain_cap). Copy j>0 rewrites text -> text||' uq'||j:
             DISTINCT near-identical texts, so the hot docs become one
             huge NEAR-dup cluster that the exact-dup pre-collapse
             cannot fold (the llm_dedup_near / minhashLsh stress).
             doc_id offset; source verbatim.
- customer:  uniform copies (volume only — makes the lookup dim too big
             to trivially broadcast, so join skew is actually exercised).
- events:    ranked by hash(user_id) — one VIRAL user owns a double-digit
             share of all events (the WINDOW-FUNCTION skew pole:
             sessionize / per-user windows sort one unsplittable
             partition). event_id offset; user_id verbatim; ts nudged
             +j ms, (event_type, ts) uniqueness asserted post-build.
- region/nation/part/supplier/embeddings: verbatim single copy.

Volume target per replicated table = copies x source rows (default 10x
sf0.1 = the sf1-equivalent volume the round-15 probe wants).

Usage: build_skew.py [src_dir] [dst_dir] [copies] [s]
"""
import sys, os, math
import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/skew1"
copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
S = float(sys.argv[4]) if len(sys.argv) > 4 else 1.1
OFF = 10_000_000

con = duckdb.connect()
os.makedirs(dst, exist_ok=True)

def nrows(t):
    return con.execute(
        f"SELECT count(*) FROM read_parquet('{src}/{t}.parquet')").fetchone()[0]

def zipf_scale(n, target):
    """C such that sum_r max(1, round(C / r^s)) ~= target."""
    # two Newton-ish passes over the exact sum are plenty for a perf probe
    c = (target - n) / sum(i ** -S for i in range(1, n + 1))
    for _ in range(2):
        tot = sum(max(1, round(c * r ** -S)) for r in range(1, n + 1))
        c *= target / tot
    return c

VERBATIM = ["region", "nation", "part", "supplier", "embeddings"]
for t in VERBATIM:
    con.execute(f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
                f"TO '{dst}/{t}.parquet' (FORMAT parquet)")
    print(f"{t}: verbatim")

# customer: uniform volume (same as build_sf1)
cols = [c[0] for c in con.execute(
    f"DESCRIBE SELECT * FROM read_parquet('{src}/customer.parquet')").fetchall()]
parts = []
for i in range(copies):
    sel = [f"c_custkey + {i * OFF} AS c_custkey" if c == "c_custkey" else c
           for c in cols]
    parts.append(f"SELECT {', '.join(sel)} FROM read_parquet('{src}/customer.parquet')")
con.execute(f"COPY ({' UNION ALL '.join(parts)}) TO '{dst}/customer.parquet' (FORMAT parquet)")
print(f"customer: uniform {copies}x")

# (table, skew-rank expression, offset-key columns, per-copy text rewrite)
SKEWED = [
    ("orders", "hash(o_custkey)", ["o_orderkey"], None),
    ("lineitem", "hash(l_returnflag || l_linestatus)",
     ["l_orderkey", "l_partkey", "l_suppkey"], None),
    ("documents", "hash(source)", ["doc_id"],
     ("text", "CASE WHEN j = 0 THEN text ELSE text || ' uq' || CAST(j AS VARCHAR) END")),
    # events: ranked by hash(user_id) -> one VIRAL user owns a double-digit
    # share of all events — the WINDOW-FUNCTION skew pole (sessionize and
    # the per-user windows sort one unsplittable partition). user_id stays
    # verbatim (the skew); ts nudges +j ms so the window-calculus sort axis
    # stays unique (asserted below, the build_sf1 discipline).
    ("events", "hash(user_id)", ["event_id"],
     ("ts", "ts + to_microseconds(j * 1000)")),
]
for t, rank_expr, off_keys, rewrite in SKEWED:
    n = nrows(t)
    target = copies * n
    c = zipf_scale(n, target)
    cols = [x[0] for x in con.execute(
        f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet')").fetchall()]
    sel = []
    for col in cols:
        if col in off_keys:
            sel.append(f"{col} + j * {OFF} AS {col}")
        elif rewrite and col == rewrite[0]:
            sel.append(f"{rewrite[1]} AS {col}")
        else:
            sel.append(col)
    con.execute(f"""
      COPY (
        WITH ranked AS (
          SELECT *, row_number() OVER (ORDER BY {rank_expr}, {off_keys[0]}) AS r
          FROM read_parquet('{src}/{t}.parquet')),
        mult AS (
          SELECT *, greatest(1, CAST(round({c} / pow(r, {S})) AS BIGINT)) AS m
          FROM ranked),
        expanded AS (
          SELECT *, unnest(range(m)) AS j FROM mult)
        SELECT {', '.join(sel)} FROM expanded
      ) TO '{dst}/{t}.parquet' (FORMAT parquet)""")
    got = nrows_dst = con.execute(
        f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')").fetchone()[0]
    top = con.execute(f"""
      SELECT m FROM (
        SELECT *, row_number() OVER (ORDER BY {rank_expr}, {off_keys[0]}) AS r
        FROM read_parquet('{src}/{t}.parquet')) ranked,
      LATERAL (SELECT greatest(1, CAST(round({c} / pow(r, {S})) AS BIGINT)) AS m)
      ORDER BY m DESC LIMIT 1""").fetchone()[0]
    print(f"{t}: {got} rows (target {target}), top-row multiplicity {top}")

# the window-calculus oracles need a unique (event_type, ts) axis — same
# load-bearing assertion as build_sf1.py (the +j ms nudge must not collide
# two different base rows' shifted timestamps)
dup = con.execute(
    f"SELECT count(*) FROM (SELECT event_type, ts FROM "
    f"read_parquet('{dst}/events.parquet') GROUP BY 1, 2 HAVING count(*) > 1)"
).fetchone()[0]
assert dup == 0, (
    f"{dup} duplicate (event_type, ts) pairs in {dst}/events.parquet — "
    "raise the per-copy ts nudge")

# skew evidence: the hot keys the probe will hit
for q, label in [
    ("SELECT o_custkey, count(*) c FROM read_parquet('" + dst + "/orders.parquet') GROUP BY 1 ORDER BY 2 DESC LIMIT 3", "hot o_custkey"),
    ("SELECT l_returnflag, l_linestatus, count(*) c FROM read_parquet('" + dst + "/lineitem.parquet') GROUP BY 1,2 ORDER BY 3 DESC LIMIT 3", "hot lineitem group"),
    ("SELECT source, count(*) c FROM read_parquet('" + dst + "/documents.parquet') GROUP BY 1 ORDER BY 2 DESC LIMIT 3", "hot domain"),
]:
    print(label, con.execute(q).fetchall())
print(f"skew replica at {dst}")
