"""Exact distributed quantiles (order statistics) WITHOUT a global
sort: iterative histogram bracketing.

Pass 0 reduces (n, min, max) from per-batch partials.  Each subsequent
pass histograms every still-active quantile's bracket [lo, hi) into
`bins` equal-width cells (one shared map_batches over the column emits
sparse per-(quantile, bin) count partials + in-bracket min/max), the
driver walks the cumulative counts to the cell containing the target
rank, and the bracket shrinks by ~`bins`x.  A quantile resolves when
its bracket holds one distinct value, or few enough rows to collect
and select exactly (<= max_driver_rows, the standard size gate).

log_bins(n / max_driver_rows) passes total — 2 histogram passes cover
1e12 rows at the defaults — each pass a column-pruned streaming scan;
nothing corpus-sized ever lands on the driver.

Index rule matches DuckDB's quantile_disc: k = max(0, ceil(q*n) - 1),
0-based in ascending order — so the SQL oracle is exact, not
approximate.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa


def _minmax_count(ds, col: str):
    def partial(b: pa.Table) -> pa.Table:
        v = b[col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return pa.table({"n": pa.array([], pa.int64()),
                             "lo": pa.array([], pa.float64()),
                             "hi": pa.array([], pa.float64())})
        return pa.table({"n": pa.array([len(v)], pa.int64()),
                         "lo": pa.array([float(v.min())]),
                         "hi": pa.array([float(v.max())])})

    p = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if len(p) == 0 or p["n"].sum() == 0:
        return 0, math.nan, math.nan
    return int(p["n"].sum()), float(p["lo"].min()), float(p["hi"].max())


class _Bracket:
    __slots__ = ("k", "lo", "hi", "hi_incl", "before", "count", "value")

    def __init__(self, k, lo, hi):
        self.k = k          # global 0-based target rank
        self.lo, self.hi = lo, hi
        self.hi_incl = True  # outermost bracket includes its max
        self.before = 0     # rows strictly left of the bracket
        self.count = None   # rows inside the bracket (set per pass)
        self.value = None   # resolved exact value


def exact_quantiles(ds, col: str, qs: list[float], bins: int = 8192,
                    max_driver_rows: int = 500_000,
                    max_passes: int = 12) -> pd.DataFrame:
    """Exact q-quantiles of `ds[col]` (DataFrame (q, val)).  NaNs are
    ignored (SQL semantics).  Index rule = DuckDB quantile_disc:
    k = max(0, ceil(q*n) - 1).  See module docstring for the plan."""
    ds = ds.materialize()  # one lineage, several scans
    n, glo, ghi = _minmax_count(ds, col)
    if n == 0:
        return pd.DataFrame({"q": list(qs),
                             "val": [math.nan] * len(qs)})
    ks = [max(0, math.ceil(q * n) - 1) for q in qs]
    vmap = _rank_values(ds, col, sorted(set(ks)), n, glo, ghi, bins,
                        max_driver_rows, max_passes)
    return pd.DataFrame({"q": list(qs), "val": [vmap[k] for k in ks]})


def interpolated_quantiles(ds, col: str, qs: list[float],
                           bins: int = 8192,
                           max_driver_rows: int = 500_000,
                           max_passes: int = 12) -> pd.DataFrame:
    """Continuous (interpolated) quantiles — DuckDB quantile_cont /
    SQL percentile_cont semantics: h = q*(n-1), linear interpolation
    between the floor(h) and ceil(h) order statistics.  Same
    histogram-bracketing passes as exact_quantiles (the two boundary
    ranks per q resolve in ONE shared sweep), val rounded to 6."""
    ds = ds.materialize()
    n, glo, ghi = _minmax_count(ds, col)
    if n == 0:
        return pd.DataFrame({"q": list(qs),
                             "val": [math.nan] * len(qs)})
    hs = [q * (n - 1) for q in qs]
    ks = sorted({int(math.floor(h)) for h in hs}
                | {int(math.ceil(h)) for h in hs})
    vmap = _rank_values(ds, col, ks, n, glo, ghi, bins,
                        max_driver_rows, max_passes)
    out = []
    for h in hs:
        lo = vmap[int(math.floor(h))]
        hi = vmap[int(math.ceil(h))]
        frac = h - math.floor(h)
        # DuckDB's Interpolator: lo + delta * (hi - lo)
        out.append(lo + frac * (hi - lo) if frac > 0 else lo)
    return pd.DataFrame({"q": list(qs),
                         "val": np.round(np.array(out, np.float64), 6)})


def _rank_values(ds, col: str, ks: list[int], n: int, glo: float,
                 ghi: float, bins: int, max_driver_rows: int,
                 max_passes: int) -> dict[int, float]:
    """Resolve the exact order statistics at the given 0-based ranks;
    returns {rank: value}.  `ds` must be materialized, `n`/`glo`/`ghi`
    from _minmax_count."""
    brs = [_Bracket(k, glo, ghi) for k in ks]
    for b in brs:
        b.count = n

    for _ in range(max_passes):
        live = [b for b in brs if b.value is None
                and b.count > max_driver_rows and b.lo < b.hi]
        if not live:
            break
        # brackets sharing a range (every quantile starts with the full
        # [min, max]) share ONE histogram
        spec = sorted({(b.lo, b.hi, b.hi_incl) for b in live})
        sidx = {s: i for i, s in enumerate(spec)}

        def hist_partial(t: pa.Table, spec=spec) -> pa.Table:
            v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
            ki, bi, cn, vlo, vhi = [], [], [], [], []
            for i, (lo, hi, hincl) in enumerate(spec):
                m = (v >= lo) & ((v <= hi) if hincl else (v < hi))
                x = v[m]
                if len(x) == 0:
                    continue
                h, edges = np.histogram(x, bins=bins, range=(lo, hi))
                nz = np.flatnonzero(h)
                ki.append(np.full(len(nz), i, np.int64))
                bi.append(nz.astype(np.int64))
                cn.append(h[nz].astype(np.int64))
                vlo.append(np.full(len(nz), x.min()))
                vhi.append(np.full(len(nz), x.max()))
            if not ki:
                return pa.table({"ki": pa.array([], pa.int64()),
                                 "bi": pa.array([], pa.int64()),
                                 "cn": pa.array([], pa.int64()),
                                 "vlo": pa.array([], pa.float64()),
                                 "vhi": pa.array([], pa.float64())})
            return pa.table({"ki": pa.array(np.concatenate(ki)),
                             "bi": pa.array(np.concatenate(bi)),
                             "cn": pa.array(np.concatenate(cn)),
                             "vlo": pa.array(np.concatenate(vlo)),
                             "vhi": pa.array(np.concatenate(vhi))})

        p = ds.map_batches(hist_partial,
                           batch_format="pyarrow").to_pandas()
        for b in live:
            rows = p[p["ki"] == sidx[(b.lo, b.hi, b.hi_incl)]]
            if len(rows) == 0:
                raise RuntimeError(
                    f"quantile bracket emptied unexpectedly (k={b.k})")
            vmin, vmax = rows["vlo"].min(), rows["vhi"].max()
            if vmin == vmax:  # one distinct value left: resolved
                b.value = float(vmin)
                continue
            counts = np.zeros(bins, np.int64)
            np.add.at(counts, rows["bi"].to_numpy(),
                      rows["cn"].to_numpy())
            cum = np.cumsum(counts)
            r_local = b.k - b.before
            cell = int(np.searchsorted(cum, r_local + 1))
            edges = np.linspace(b.lo, b.hi, bins + 1)
            b.before += int(cum[cell - 1]) if cell > 0 else 0
            b.count = int(counts[cell])
            b.lo = float(edges[cell])
            b.hi = float(edges[cell + 1])
            # np.histogram folds values == hi into the LAST cell only
            b.hi_incl = (cell == bins - 1) and b.hi_incl

    # collect every unresolved bracket's rows in ONE filter pass
    live = [b for b in brs if b.value is None]
    if live:
        spec = sorted({(b.lo, b.hi, b.hi_incl) for b in live})
        sidx = {s: i for i, s in enumerate(spec)}

        def collect(t: pa.Table, spec=spec) -> pa.Table:
            v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
            ki, vv = [], []
            for i, (lo, hi, hincl) in enumerate(spec):
                m = (v >= lo) & ((v <= hi) if hincl else (v < hi))
                x = v[m]
                ki.append(np.full(len(x), i, np.int64))
                vv.append(x)
            return pa.table({"ki": pa.array(np.concatenate(ki)),
                             "v": pa.array(np.concatenate(vv))})

        got = ds.map_batches(collect, batch_format="pyarrow").to_pandas()
        for b in live:
            i = sidx[(b.lo, b.hi, b.hi_incl)]
            x = np.sort(got.loc[got["ki"] == i, "v"].to_numpy())
            if b.k - b.before >= len(x):
                raise RuntimeError(
                    f"quantile rank {b.k} fell outside its bracket "
                    f"(before={b.before}, in-bracket={len(x)})")
            b.value = float(x[b.k - b.before])

    return {b.k: b.value for b in brs}


GROUP_BUCKET_ROWS = 200_000


def grouped_quantiles(ds, key: str, col: str, qs: list[float]):
    """Exact per-key quantiles (Dataset of key, q, val): one coarse
    deterministic key-hash bucket shuffle co-locates each key's rows,
    then a vectorized segment kernel (ONE sort per bucket, per-segment
    rank offsets) selects every key's order statistics.

    Partitioning assumption (same as joins.py): all rows of one KEY fit
    in one bucket task — buckets scale with total rows, keys never
    split.  For the global (single-group) case use exact_quantiles,
    which needs no such assumption.  Index rule = DuckDB quantile_disc.
    """
    ds = ds.materialize()
    nb = max(32, ds.count() // GROUP_BUCKET_ROWS)
    qarr = np.asarray(qs, np.float64)

    def salt(b: pa.Table) -> pa.Table:
        k = b[key].to_numpy(zero_copy_only=False)
        if np.issubdtype(k.dtype, np.integer):
            with np.errstate(over="ignore"):
                h = k.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                h ^= h >> np.uint64(31)
            kb = (h % np.uint64(nb)).astype(np.int64)
        else:
            kb = (pd.util.hash_array(np.asarray(k, object))
                  % np.uint64(nb)).astype(np.int64)
        return pa.table({key: b[key], col: b[col],
                         "kb": pa.array(kb)})

    def bucket_q(g: pd.DataFrame) -> pd.DataFrame:
        k = g[key].to_numpy()
        v = g[col].to_numpy(np.float64)
        ok = ~np.isnan(v)
        k, v = k[ok], v[ok]
        if len(k) == 0:
            return pd.DataFrame({key: k, "q": np.empty(0, np.float64),
                                 "val": np.empty(0, np.float64)})
        order = np.lexsort((v, k))
        k, v = k[order], v[order]
        starts = np.flatnonzero(np.concatenate([[True], k[1:] != k[:-1]]))
        lens = np.diff(np.concatenate([starts, [len(k)]]))
        # per (segment, q): rank = start + max(0, ceil(q*len)-1)
        kk = np.repeat(k[starts], len(qarr))
        ql = np.tile(qarr, len(starts))
        ll = np.repeat(lens, len(qarr))
        ss = np.repeat(starts, len(qarr))
        idx = ss + np.maximum(0, np.ceil(ql * ll).astype(np.int64) - 1)
        return pd.DataFrame({key: kk, "q": ql, "val": v[idx]})

    return (ds.map_batches(salt, batch_format="pyarrow")
            .groupby("kb").map_groups(bucket_q, batch_format="pandas"))


def global_value_ranks(ds, value: str = "value",
                       id_col: str = "event_id", n_buckets: int = 64):
    """Global row_number() OVER (ORDER BY value, id) WITHOUT a global
    sort — the textbook distributed ranking: exact quantile boundaries
    range-partition the value domain into balanced buckets (skew-proof
    by construction, unlike uniform bins), per-bucket counts prefix-sum
    on the driver (n_buckets ints), and each bucket lexsorts locally
    and adds its offset.  Returns a Dataset (id, rnk), rnk 1-based."""
    import ray

    ds = ds.materialize()
    n = ds.count()
    if n == 0:
        import ray.data as rd

        return rd.from_arrow(pa.table({id_col: pa.array([], pa.int64()),
                                       "rnk": pa.array([], pa.int64())}))
    qs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = np.unique(exact_quantiles(ds, value, qs)["val"].to_numpy())
    bounds = bounds[~np.isnan(bounds)]
    bref = ray.put(bounds)
    nb = len(bounds) + 1

    import pyarrow.compute as _pc

    def tag(b: pa.Table) -> pa.Table:
        bo = ray.get(bref)
        v = b[value].to_numpy(zero_copy_only=False).astype(np.float64)
        vb = np.searchsorted(bo, v, side="left").astype(np.int64)
        return pa.table({id_col: _pc.cast(b[id_col], pa.int64()),
                         value: pa.array(v), "vb": pa.array(vb)})

    tagged = ds.map_batches(tag, batch_format="pyarrow").materialize()

    def counts(b: pa.Table) -> pa.Table:
        c = np.bincount(b["vb"].to_numpy(zero_copy_only=False),
                        minlength=nb)
        return pa.table({"vb": pa.array(np.arange(nb, dtype=np.int64)),
                         "c": pa.array(c.astype(np.int64))})

    total = np.zeros(nb, np.int64)
    for t in tagged.map_batches(counts, batch_format="pyarrow") \
                   .iter_batches(batch_format="pyarrow",
                                 batch_size=None):
        total[t["vb"].to_numpy(zero_copy_only=False)] += \
            t["c"].to_numpy(zero_copy_only=False)
    offsets = np.cumsum(total) - total
    oref = ray.put(offsets)

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(oref)
        ids = g[id_col].to_numpy(np.int64)
        v = g[value].to_numpy(np.float64)
        o = np.lexsort((ids, v))
        pos = off[int(g["vb"].iloc[0])] \
            + np.arange(len(v), dtype=np.int64) + 1
        return pd.DataFrame({id_col: ids[o], "rnk": pos})

    return tagged.groupby("vb").map_groups(rank, batch_format="pandas")


GROUPED_RANK_SAMPLE = 4096  # per-key bottom-k-by-hash boundary sample


def _mix_ids(ids: np.ndarray) -> np.ndarray:
    h = ids.astype(np.int64).astype(np.uint64)
    with np.errstate(over="ignore"):
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(29)
        h *= np.uint64(0xC4CEB9FE1A85EC53)
        h ^= h >> np.uint64(32)
    return h


def grouped_value_ranks(ds, key: str, value: str, id_col: str,
                        n_buckets: int = 64,
                        sample_per_key: int = GROUPED_RANK_SAMPLE):
    """Per-key row_number() OVER (PARTITION BY key ORDER BY value, id)
    for a BOUNDED key domain (languages, sources, labels) whose per-key
    row counts are unbounded — the regime where the coarse
    key-hash-bucket shuffle (grouped_quantiles) would put one whole key
    in one task.  The generalization of global_value_ranks:

    1. per-key value boundaries from a mergeable bottom-k-by-id-hash
       sample (deterministic; boundaries only steer BALANCE — rank
       exactness never depends on them);
    2. rows tagged (key, value-range) -> one composite-bucket shuffle;
    3. per-(key, range) counts are map-side bincount partials over the
       bounded key x n_buckets domain; the driver prefix-sums them into
       per-bucket rank offsets;
    4. each bucket lexsorts (value, id) locally and adds its offset.

    Equal values never split across ranges (searchsorted side='left'),
    so ranks are exact.  Returns a Dataset (id_col, key, rnk), rnk
    1-based per key."""
    import ray
    import ray.data as rd
    import pyarrow.compute as pc

    ds = ds.materialize()
    if ds.count() == 0:
        return rd.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            key: pa.array([], pa.string()),
            "rnk": pa.array([], pa.int64())}))

    def sample(b: pa.Table) -> pa.Table:
        kv = b[key].to_numpy(zero_copy_only=False)
        v = b[value].to_numpy(zero_copy_only=False).astype(np.float64)
        h = _mix_ids(b[id_col].to_numpy(zero_copy_only=False))
        df = pd.DataFrame({"k": kv, "h": h, "v": v})
        df = df.sort_values(["k", "h"]).groupby("k", sort=False) \
               .head(sample_per_key)
        return pa.table({"k": pa.array(df["k"].to_numpy()),
                         "h": pa.array(df["h"].to_numpy(np.uint64)),
                         "v": pa.array(df["v"].to_numpy(np.float64))})

    parts = ds.map_batches(sample, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(["k", "h"]).groupby("k", sort=False) \
                 .head(sample_per_key)
    keys = np.sort(parts["k"].unique())
    bounds = {}
    for kk, g in parts.groupby("k"):
        sv = np.sort(g["v"].to_numpy())
        qi = np.minimum((np.arange(1, n_buckets) * len(sv)) // n_buckets,
                        len(sv) - 1)
        bounds[kk] = np.unique(sv[qi])
    nb = n_buckets
    key_arr = keys  # sorted; index = position
    bref = ray.put((key_arr, bounds))

    def tag(b: pa.Table) -> pa.Table:
        ka, bo = ray.get(bref)
        kv = b[key].to_numpy(zero_copy_only=False)
        v = b[value].to_numpy(zero_copy_only=False).astype(np.float64)
        ki = np.searchsorted(ka, kv)
        vb = np.empty(len(v), dtype=np.int64)
        for i, kk in enumerate(ka):  # bounded key domain
            m = ki == i
            if m.any():
                vb[m] = np.searchsorted(bo[kk], v[m], side="left")
        return pa.table({id_col: pc.cast(b[id_col], pa.int64()),
                         key: b[key], value: pa.array(v),
                         "kb": pa.array(ki * nb + vb)})

    tagged = ds.map_batches(tag, batch_format="pyarrow").materialize()
    dom = len(key_arr) * nb

    def counts(b: pa.Table) -> pa.Table:
        c = np.bincount(b["kb"].to_numpy(zero_copy_only=False),
                        minlength=dom)
        nz = np.flatnonzero(c)
        return pa.table({"kb": pa.array(nz.astype(np.int64)),
                         "c": pa.array(c[nz].astype(np.int64))})

    total = np.zeros(dom, np.int64)
    for t in tagged.map_batches(counts, batch_format="pyarrow") \
                   .iter_batches(batch_format="pyarrow", batch_size=None):
        total[t["kb"].to_numpy(zero_copy_only=False)] += \
            t["c"].to_numpy(zero_copy_only=False)
    # prefix sums restart at each key's first range cell (ranks are
    # 1-based PER KEY, not global)
    offsets = (np.cumsum(total.reshape(-1, nb), axis=1).reshape(-1)
               - total)
    oref = ray.put(offsets)

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(oref)
        ids = g[id_col].to_numpy(np.int64)
        v = g[value].to_numpy(np.float64)
        o = np.lexsort((ids, v))
        pos = off[int(g["kb"].iloc[0])] \
            + np.arange(len(v), dtype=np.int64) + 1
        return pd.DataFrame({id_col: ids[o],
                             key: g[key].to_numpy()[o],
                             value: v[o], "rnk": pos})

    return tagged.groupby("kb").map_groups(rank, batch_format="pandas")
