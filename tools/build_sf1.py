#!/usr/bin/env python3
"""Build the /tmp/sf1 correctness replica: sf0.1 replicated 10x with
per-copy key offsets (+i*1e7 on every entity key) so each copy is a
self-contained universe — the recipe behind the round-7/8 sf1 sweeps,
now committed instead of ad hoc.

- region/nation stay single (shared dims; their keys join un-offset
  foreign keys c_nationkey/s_nationkey, which replicate as-is).
- events.ts nudges +i microseconds per copy: the driver generation has
  unique ts and the document-window oracles rely on a unique sort axis
  (BASELINE.md round-7 lesson #1).
- documents/embeddings replicate verbatim apart from ids: every doc is
  then an exact 10x duplicate, which the dedup oracles fold identically
  (BASELINE.md round-8 note).

Usage: build_sf1.py [src_dir] [dst_dir] [copies]
"""
import sys, os
import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
OFF = 10_000_000  # +i*1e7 per copy

# key columns to offset, per table (everything else replicates verbatim)
KEYS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
}
SINGLE = ["region", "nation"]

os.makedirs(dst, exist_ok=True)
con = duckdb.connect()
for t in SINGLE:
    con.execute(f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
                f"TO '{dst}/{t}.parquet' (FORMAT parquet)")
    print(f"{t}: single copy")
for t, keys in KEYS.items():
    cols = [c[0] for c in con.execute(
        f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet')").fetchall()]
    parts = []
    for i in range(copies):
        sel = []
        for c in cols:
            if c in keys:
                sel.append(f"{c} + {i * OFF} AS {c}")
            elif t == "events" and c == "ts":
                sel.append(f"ts + INTERVAL {i} MICROSECOND AS ts")
            else:
                sel.append(c)
        parts.append(f"SELECT {', '.join(sel)} FROM read_parquet('{src}/{t}.parquet')")
    con.execute(f"COPY ({' UNION ALL '.join(parts)}) TO '{dst}/{t}.parquet' "
                f"(FORMAT parquet)")
    n = con.execute(f"SELECT count(*) FROM read_parquet('{dst}/{t}.parquet')").fetchone()[0]
    print(f"{t}: {n} rows ({copies}x)")

# ts uniqueness per (event_type) partition is LOAD-BEARING: the engine's
# $derivative/$integral take exactly ONE sortBy field (MongoDB contract, no
# tiebreak possible), and the q_window_calc oracle maps rows to fold indices
# via count() OVER (ORDER BY ts) while foldBlocks uses row_number() — two
# independently tie-broken orders. Duplicate ts would misalign them
# NONDETERMINISTICALLY rather than fail loudly (round-12 advisor find), so
# fail here instead.
dup = con.execute(
    f"SELECT count(*) FROM (SELECT event_type, ts FROM "
    f"read_parquet('{dst}/events.parquet') GROUP BY 1, 2 HAVING count(*) > 1)"
).fetchone()[0]
assert dup == 0, (
    f"{dup} duplicate (event_type, ts) pairs in {dst}/events.parquet — "
    "the window-calculus oracles need a unique time axis; raise the per-copy "
    "ts nudge above the copy count")
print("events: (event_type, ts) unique — window-calculus sort axis OK")
print(f"replica at {dst}")
