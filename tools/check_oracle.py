#!/usr/bin/env python3
"""Local pre-check of SparkEntry.oracleSql vs the Verify parquet dumps.
Mimics the driver's DuckDB compare: sort columns by name, sort rows, compare values.
Usage: check_oracle.py <verify_out_dir> <sf_dir>"""
import sys, json, glob, os
import duckdb, pandas as pd, numpy as np

outdir, sfdir = sys.argv[1], sys.argv[2]
only = sys.argv[3].split(",") if len(sys.argv) > 3 else None  # optional name filter
oracle = json.load(open(f"{outdir}/oracle_sql.json"))
# local-only strict oracles (nested-schema fixtures the driver never sees
# — see SparkEntry.localOracleSql). Dumped by Verify to the SIBLING dir
# <outdir>.local/ so no driver enumeration of outdir can find them (r13:
# even a __local/ SUBdir was globbed as a pseudo-query and crashed pandas).
localdir = outdir.rstrip("/") + ".local"
for loc in (f"{localdir}/local_oracle_sql.json",
            f"{outdir}/local_oracle_sql.json"):  # pre-r14 dump layout
    if os.path.exists(loc):
        oracle.update(json.load(open(loc))); break
if only:
    oracle = {k: v for k, v in oracle.items() if k in only}
con = duckdb.connect()
# big-SF runs: cap DuckDB and let it spill instead of tripping the OOM killer
# (round-11: the full sf1 sweep at 64GB was OOM-killed at 130GB RSS —
# DuckDB's cap doesn't count pandas copies; run big sweeps chunked with
# DUCKDB_MEM=32GB)
con.execute(f"SET memory_limit='{os.environ.get('DUCKDB_MEM', '64GB')}'")
con.execute("SET temp_directory='/tmp/duckdb_spill'")
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

def canon_cell(v):
    """Nested (struct/array/map) cells → one canonical string, floats
    rendered SIGNBIT-STRICT (-0.0 != 0.0, matching the driver's value-hash
    discipline). Also makes multi-key row sorts possible at all — pandas
    factorizes sort keys, and dict/ndarray cells are unhashable."""
    if v is None:
        return "null"
    if isinstance(v, (list, np.ndarray)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon_cell(v[k])}" for k in sorted(v)) + "}"
    if isinstance(v, (float, np.floating)):
        if np.isnan(v):
            return "nan"
        if v == 0:
            return "-0.0" if np.signbit(v) else "0.0"
        return repr(float(v))
    return repr(v)

def normalize_nested(df):
    for c in df.columns:
        if df[c].dtype == object and df[c].map(
                lambda v: isinstance(v, (dict, list, np.ndarray))).any():
            df[c] = df[c].map(lambda v: None if v is None else canon_cell(v))
    return df

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

fails = []
def fail(name, msg):
    # surface failures immediately — a crash mid-run (OOM) must not lose
    # the earlier failure messages
    fails.append((name, msg))
    print(f"FAIL  {name}: {msg}", flush=True)

# Big-output lane: above this many rows the pandas sort_values compare is
# the bottleneck (q_expr_arith at sf10 = 60M rows timed out at 1500 s),
# so compare row MULTISETS inside DuckDB instead: count(*) plus a
# commutative (order-free) sum of per-row hashes over the to_json
# rendering of the row struct with columns in sorted order. Multiset
# equality of rows is exactly what the driver's row-sort+hash checks.
# to_json renders DOUBLEs shortest-roundtrip (verified: 0.30000000000000004
# does NOT collapse to 0.3), so value discrimination is exact — EXCEPT the
# sign of zero: DuckDB renders -0.0 as "0.0" in every string lane, so this
# path is NOT signbit-strict. That is acceptable here and only here: every
# driver-visible query is -0.0-canonicalized on BOTH sides by Verify
# (normNegZero + wrapOracle, unconditional on all float columns, scale-
# independent), and the signbit-strict pandas lane still covers the full
# surface at sf0.01. Both sides render inside the SAME DuckDB session, so
# representation is identical by construction. Set BIGCMP_ROWS=0 to disable.
BIGCMP_ROWS = int(os.environ.get("BIGCMP_ROWS", "5000000"))

# NO width equivalences (ADVICE r14): the driver's pandas lane fails on
# str(dtype) inequality (int32 vs int64, float32 vs float64), so the hash
# lane must be exactly as strict — an INTEGER-vs-BIGINT mismatch that the
# old _TYPE_EQUIV waved through at sf10 would still fail the driver at
# sf0.01. The two lanes now agree on what a dtype failure is.
def _norm_type(t):
    return t

def hash_compare(name, sql, files):
    flist = ",".join(f"'{f}'" for f in files)
    got_desc = dict((r[0], r[1]) for r in con.execute(
        f"DESCRIBE SELECT * FROM read_parquet([{flist}])").fetchall())
    want_desc = dict((r[0], r[1]) for r in con.execute(
        f"DESCRIBE SELECT * FROM ({sql}) q LIMIT 0").fetchall())
    got_cols, want_cols = list(got_desc), list(want_desc)
    if sorted(got_cols) != sorted(want_cols):
        fail(name, f"cols: spark={sorted(got_cols)} duck={sorted(want_cols)}")
        return
    # dtype check the to_json rendering would hide (ADVICE r13): an INT32
    # where the oracle yields BIGINT renders identically under to_json but
    # fails the driver's pandas-lane str(dtype) compare
    mism = [(c, got_desc[c], want_desc[c]) for c in sorted(got_cols)
            if _norm_type(got_desc[c]) != _norm_type(want_desc[c])]
    if mism:
        fail(name, f"dtypes (hash lane): {mism}")
        return
    def dq(c):
        return '"' + c.replace('"', '""') + '"'
    cols = ", ".join(dq(c) for c in sorted(got_cols))
    def digest(src):
        # two independent commutative digests (ADVICE r13 hardening, still
        # O(1) memory): the plain hash sum, plus a sum of modular products
        # of the hash under two unrelated primes — offsetting per-row
        # deltas would have to cancel in both simultaneously. Each second-
        # digest term is < 2^60 so the HUGEINT sum cannot overflow.
        return con.execute(
            f"SELECT count(*), sum(h::HUGEINT),"
            f" sum((h % 1000000007)::HUGEINT * (h % 998244353)::HUGEINT)"
            f" FROM (SELECT hash(to_json(struct_pack({cols}))::VARCHAR) AS h"
            f"       FROM ({src}) t) u").fetchone()
    gn, gh, gh2 = digest(f"SELECT * FROM read_parquet([{flist}])")
    wn, wh, wh2 = digest(sql)
    if gn != wn:
        fail(name, f"rows: spark={gn} duck={wn}")
    elif gh != wh or gh2 != wh2:
        fail(name, f"row-multiset hash: spark=({gh},{gh2}) duck=({wh},{wh2}) ({gn} rows)")
    else:
        print(f"OK    {name} ({gn} rows, hash lane)", flush=True)

for name, sql in sorted(oracle.items()):
    try:
        files = (glob.glob(f"{outdir}/{name}/*.parquet")
                 # local-only nested fixtures live in the sibling
                 # <outdir>.local/ (invisible to the driver — its
                 # comparator crashes on nested sort keys, r12/r13 find)
                 or glob.glob(f"{localdir}/{name}/*.parquet")
                 or glob.glob(f"{outdir}/__local/{name}/*.parquet"))
        if not files:
            fail(name, "no spark output"); continue
        if BIGCMP_ROWS:
            flist = ",".join(f"'{f}'" for f in files)
            n = con.execute(
                f"SELECT count(*) FROM read_parquet([{flist}])").fetchone()[0]
            if n >= BIGCMP_ROWS:
                hash_compare(name, sql, files); continue
        got = normalize_nested(
            pd.concat([pd.read_parquet(f) for f in files], ignore_index=True))
        want = normalize_nested(con.execute(sql).fetchdf())
        if sorted(got.columns) != sorted(want.columns):
            fail(name, f"cols: spark={sorted(got.columns)} duck={sorted(want.columns)}"); continue
        if len(got) != len(want):
            fail(name, f"rows: spark={len(got)} duck={len(want)}"); continue
        g, w = canon(got), canon(want)
        for c in g.columns:
            gv, wv = g[c], w[c]
            if str(gv.dtype) != str(wv.dtype):
                fail(name, f"dtype {c}: spark={gv.dtype} duck={wv.dtype}"); break
            if gv.dtype == object:
                eq = (gv.fillna("\0") == wv.fillna("\0")).all()
            elif np.issubdtype(gv.dtype, np.floating):
                # the driver hash-compares string representations, so -0.0 vs
                # 0.0 must FAIL here too (round-10 lesson: np.allclose alone is
                # blind to signbit — two rounds shipped red on exactly that)
                eq = (np.allclose(gv.fillna(0), wv.fillna(0), rtol=0, atol=0)
                      and (gv.isna() == wv.isna()).all()
                      and (np.signbit(gv.fillna(0).to_numpy())
                           == np.signbit(wv.fillna(0).to_numpy())).all())
            else:
                eq = gv.equals(wv)
            if not eq:
                bad = (gv != wv) & ~(gv.isna() & wv.isna())
                if np.issubdtype(gv.dtype, np.floating):
                    bad = bad | pd.Series(
                        np.signbit(gv.fillna(0).to_numpy())
                        != np.signbit(wv.fillna(0).to_numpy()), index=gv.index)
                i = bad.idxmax()
                fail(name, f"value {c} row{i}: spark={gv[i]!r} duck={wv[i]!r} ({int(bad.sum())} diffs)"); break
        else:
            print(f"OK    {name} ({len(got)} rows)")
    except Exception as e:
        fail(name, f"EXC {type(e).__name__}: {e}")
print(f"\n{len(oracle)-len(fails)}/{len(oracle)} pass")
sys.exit(1 if fails else 0)
