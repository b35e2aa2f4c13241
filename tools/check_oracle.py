#!/usr/bin/env python3
"""Local pre-check of SparkEntry.oracleSql vs the Verify parquet dumps.
Mimics the driver's DuckDB compare: sort columns by name, sort rows, compare values.
Usage: check_oracle.py <verify_out_dir> <sf_dir>"""
import sys, json, glob, os
import duckdb, pandas as pd, numpy as np

outdir, sfdir = sys.argv[1], sys.argv[2]
only = sys.argv[3].split(",") if len(sys.argv) > 3 else None  # optional name filter
oracle = json.load(open(f"{outdir}/oracle_sql.json"))
# local-only strict oracles (nested-schema fixtures the driver checks
# rows-only — see SparkEntry.localOracleSql)
if os.path.exists(f"{outdir}/local_oracle_sql.json"):
    oracle.update(json.load(open(f"{outdir}/local_oracle_sql.json")))
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
for name, sql in sorted(oracle.items()):
    try:
        files = (glob.glob(f"{outdir}/{name}/*.parquet")
                 # local-only nested fixtures live under __local/ (hidden
                 # from the driver's glob — its comparator crashes on
                 # nested sort keys, r12 find)
                 or glob.glob(f"{outdir}/__local/{name}/*.parquet"))
        if not files:
            fail(name, "no spark output"); continue
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
