#!/usr/bin/env python3
"""Linear pandas replay of the growing-frame window oracles that the exact
DuckDB compare can't carry at sf1-scale events (1M rows): three whose SQL is
quadratic (list() OVER ROWS UNBOUNDED PRECEDING), plus q_window_calc, whose
cumulative $integral crosses 2-dp rounding boundaries under fp accumulation
drift (~20/1M rows at |area|~1e8, i.e. 1e-10 relative) — here it gets a
one-rounding-quantum tolerance instead of the driver-gate exact hash.

Usage: check_window_sf1.py <verify_out_dir> <sf_dir>
"""
import sys, glob
import pandas as pd, numpy as np

outdir, sfdir = sys.argv[1], sys.argv[2]
ev = pd.read_parquet(f"{sfdir}/events.parquet")

def rd(name):
    return pd.concat([pd.read_parquet(f) for f in glob.glob(f"{outdir}/{name}/*.parquet")],
                     ignore_index=True)

def round_half_up(s, nd):
    # DuckDB/Spark round() is half-away-from-zero; numpy is half-to-even
    m = 10.0 ** nd
    return np.sign(s) * np.floor(np.abs(s) * m + 0.5) / m

def ema_fold(vals):
    # list_reduce(h, (acc, y) -> y/3 + acc*2/3): init = first element
    out = np.empty(len(vals)); acc = None
    for i, y in enumerate(vals):
        acc = y if acc is None else y * (2.0 / 6.0) + acc * (1.0 - 2.0 / 6.0)
        out[i] = acc
    return out

fails = []
def check(name, got, want, keys, atol=0.0):
    got = got.sort_values(keys, ignore_index=True)
    want = want.sort_values(keys, ignore_index=True)
    if len(got) != len(want):
        fails.append(name); print(f"FAIL  {name}: rows spark={len(got)} pandas={len(want)}", flush=True); return
    atols = atol if isinstance(atol, dict) else {c: atol for c in want.columns}
    for c in want.columns:
        atol = atols.get(c, 0.0)
        gv, wv = got[c], want[c]
        if np.issubdtype(wv.dtype, np.floating):
            both_na = gv.isna() & wv.isna()
            eq = (both_na | (np.abs(gv - wv) <= atol)).all()
            if not eq:
                bad = ~(both_na | (np.abs(gv - wv) <= atol))
                i = bad.idxmax()
                fails.append(name)
                print(f"FAIL  {name}: {c} row{i} spark={gv[i]!r} pandas={wv[i]!r} "
                      f"({int(bad.sum())} diffs, max={np.nanmax(np.abs(gv-wv)):.3g})", flush=True)
                return
        else:
            if not gv.equals(wv):
                bad = (gv != wv) & ~(gv.isna() & wv.isna())
                i = bad.idxmax()
                fails.append(name)
                print(f"FAIL  {name}: {c} row{i} spark={gv[i]!r} pandas={wv[i]!r} "
                      f"({int(bad.sum())} diffs)", flush=True)
                return
    print(f"OK    {name} ({len(got)} rows)")

# ---- q_dynamic_window_calc / q_window_fill: interp fill + running EMA ----
e = ev[["event_id", "event_type", "user_id", "value"]].copy()
e["v"] = np.where(e.user_id % 10 == 0, np.nan, e.value)
e["x"] = e.event_id.astype(float)
e = e.sort_values(["event_type", "event_id"], ignore_index=True)
g = e.groupby("event_type", sort=False)
vx = e.v.where(e.v.notna(), np.nan)
xnn = e.x.where(e.v.notna(), np.nan)
e["pv0"] = g.v.shift(1); e["px0"] = g.x.shift(1)
e["pv"] = vx.groupby(e.event_type).ffill()
e["px"] = xnn.groupby(e.event_type).ffill()
e["nv"] = vx.groupby(e.event_type).bfill()
e["nx"] = xnn.groupby(e.event_type).bfill()
ema = np.full(len(e), np.nan)
for _, idx in e.groupby("event_type", sort=False).indices.items():
    sub = e.v.values[idx]
    nn = ~np.isnan(sub)
    if nn.any():
        folded = ema_fold(sub[nn])
        vals = np.full(len(sub), np.nan)
        vals[nn] = folded
        # rows before the first non-null keep NaN; after: last fold value
        last = pd.Series(vals).ffill().values
        ema[idx] = last
e["ema"] = ema
e["slope"] = (e.v - e.pv0) / (e.x - e.px0)
e["fill"] = np.where(e.v.notna(), e.v,
                     e.pv + (e.nv - e.pv) * (e.x - e.px) / (e.nx - e.px))

want_calc = e.rename(columns={"event_id": "_id"})[["_id", "slope", "fill", "ema"]]
check("q_dynamic_window_calc", rd("q_dynamic_window_calc"), want_calc, ["_id"])

want_fill = e.rename(columns={"fill": "filled"})[["event_id", "filled", "ema"]]
check("q_window_fill", rd("q_window_fill"), want_fill, ["event_id"])

# ---- q_window_stats: rolling stddev, partition covar, cumulative slots ----
s = ev[["event_id", "event_type", "ts", "user_id", "value"]].copy()
s = s.sort_values(["event_type", "ts", "event_id"], ignore_index=True)
gs = s.groupby("event_type", sort=False)
s["sdp"] = round_half_up(gs.value.rolling(6, min_periods=1).std(ddof=0)
                         .reset_index(level=0, drop=True).sort_index(), 4)
sds_raw = gs.value.rolling(6, min_periods=1).std(ddof=1) \
            .reset_index(level=0, drop=True).sort_index()
s["sds"] = round_half_up(sds_raw, 4)
uid = s.user_id.astype(float)
mv = gs.value.transform("mean"); mu = uid.groupby(s.event_type).transform("mean")
prod = (s.value - mv) * (uid - mu)
n = gs.value.transform("count")
s["cvp"] = round_half_up(prod.groupby(s.event_type).transform("sum") / n, 2)
s["cvs"] = round_half_up(prod.groupby(s.event_type).transform("sum") / (n - 1), 2)
slots = np.empty(len(s), dtype=object)
for _, idx in s.groupby("event_type", sort=False).indices.items():
    seen = set(); out = []
    for u in s.user_id.values[idx]:
        seen.add(int(u) % 4)
        out.append("," + ",".join(str(x) for x in sorted(seen)))
    slots[idx] = out
s["slots"] = slots
want_stats = s[["event_id", "sdp", "sds", "cvp", "cvs", "slots"]]
# rolling stddev: pandas two-pass vs DuckDB/Spark one-pass can differ 1 ulp
# pre-round; allow 1e-4 (one rounding quantum) and report the max observed
check("q_window_stats", rd("q_window_stats"), want_stats, ["event_id"], atol=1e-4)

# ---- q_window_nfamily / q_dynamic_window_nfamily: $minN/$lastN/$top ----
# running 3-smallest (ascending), lastN(2) over [-3,current], and running
# $top by (value desc, id asc) — all O(n) per partition here vs the
# quadratic list() OVER in the DuckDB oracle
import bisect
nf = ev[["event_id", "event_type", "ts", "value"]].copy()
nf = nf.sort_values(["event_type", "ts", "event_id"], ignore_index=True)
m1 = np.empty(len(nf)); m2 = np.full(len(nf), np.nan); m3 = np.full(len(nf), np.nan)
la = np.empty(len(nf), dtype=np.int64); lb = np.full(len(nf), np.nan)
topv = np.empty(len(nf), dtype=np.int64)
for _, idx in nf.groupby("event_type", sort=False).indices.items():
    vals = nf.value.values[idx]; ids = nf.event_id.values[idx]
    small = []  # ascending, ≤3
    bv, bi = -np.inf, None
    for i in range(len(idx)):
        v, d = vals[i], ids[i]
        if len(small) < 3: bisect.insort(small, v)
        elif v < small[-1]: bisect.insort(small, v); small.pop()
        j = idx[i]
        m1[j] = small[0]
        if len(small) > 1: m2[j] = small[1]
        if len(small) > 2: m3[j] = small[2]
        la[j] = ids[i - 1] if i >= 1 else d
        if i >= 1: lb[j] = d
        if v > bv or (v == bv and d < bi): bv, bi = v, d
        topv[j] = bi
nf["m1"], nf["m2"], nf["m3"] = m1, m2, m3
nf["la"] = la; nf["lb"] = lb; nf["topv"] = topv
want_nf = nf[["event_id", "m1", "m2", "m3", "la", "lb", "topv"]]
got_nf = rd("q_window_nfamily")
got_nf["lb"] = got_nf["lb"].astype(float)  # null on partition-first rows
check("q_window_nfamily", got_nf, want_nf, ["event_id"])
got_dnf = rd("q_dynamic_window_nfamily")
got_dnf["lb"] = got_dnf["lb"].astype(float)
check("q_dynamic_window_nfamily", got_dnf, want_nf, ["event_id"])

# ---- q_window_calc: $derivative [-3,current] + cumulative $integral ----
# x-axis = unix_millis(ts)/1000.0 (unit: second, ms-truncated like the
# engine and the DuckDB oracle); sortBy ts alone (Mongo's one-sortBy-field
# contract for calculus ops) — requires unique ts per partition, true for
# the driver tables and the nudged sf1 replica
c = ev[["event_id", "event_type", "ts", "value"]].copy()
# resolution-independent ms truncation: pandas hands back datetime64[ns]
# for ns-typed parquet but datetime64[us] for the regenerated us-typed
# testdata — astype int64 alone would be off 1000x on the latter
c["x"] = c.ts.astype("datetime64[ms]").astype("int64") / 1000.0
c = c.sort_values(["event_type", "ts"], ignore_index=True)
gc = c.groupby("event_type", sort=False)
x0, v0 = gc.x.shift(3), gc.value.shift(3)
pos = gc.cumcount()
for k in (2, 1, 0):  # frame start clamps to the partition head
    m = pos == k
    x0[m] = gc.x.transform("first")[m]
    v0[m] = gc.value.transform("first")[m]
dx = c.x - x0
c["slope"] = round_half_up(np.where(dx != 0, (c.value - v0) / dx, np.nan), 4)
pa = (c.x - gc.x.shift(1)) * (c.value + gc.value.shift(1)) / 2.0
c["area"] = round_half_up(pa.fillna(0).groupby(c.event_type).cumsum(), 2)
want_calc2 = c[["event_id", "slope", "area"]]
check("q_window_calc", rd("q_window_calc"), want_calc2, ["event_id"],
      atol={"slope": 0.00011, "area": 0.011})

print(f"\n{6-len(set(fails))}/6 pass")
