"""Time-series joins over keyed event streams — as-of join and range
(interval-aggregate) join, two operators the task brief calls out that
Ray Data lacks natively.

Both use the engine's standard wide-step shape: ONE coarse
deterministic key-hash bucket shuffle (groupby(bucket).map_groups) that
co-locates every row of a key, then a fully vectorized kernel inside
the bucket (pandas merge_asof / numpy composite-key searchsorted +
prefix sums).  Never a per-key hash aggregate and never a driver
materialization.

Partitioning assumption (documented per the brief): all rows of one KEY
fit in one bucket task.  Bucket count scales with total rows
(~TARGET_ROWS_PER_BUCKET each), keys never split across buckets, so a
single pathological key bounded only by the corpus is the one skew case
— the same assumption pandas merge_asof itself makes per group.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

TARGET_ROWS_PER_BUCKET = 200_000


def _n_buckets(n_rows: int, floor: int = 32) -> int:
    return max(floor, int(n_rows) // TARGET_ROWS_PER_BUCKET)


def _key_bucket(keys: np.ndarray, nb: int) -> np.ndarray:
    """Deterministic coarse bucket for int or string keys (pandas
    siphash — stable across worker processes, unlike builtin hash
    under PYTHONHASHSEED)."""
    if np.issubdtype(np.asarray(keys).dtype, np.integer):
        with np.errstate(over="ignore"):
            h = np.asarray(keys).astype(np.uint64) \
                * np.uint64(0x9E3779B97F4A7C15)
            h ^= h >> np.uint64(31)
        return (h % np.uint64(nb)).astype(np.int64)
    h = pd.util.hash_array(np.asarray(keys, dtype=object))
    return (h % np.uint64(nb)).astype(np.int64)


def _tag_union(left_ds, right_ds, key: str, ts: str,
               left_cols: list[str], right_cols: list[str], nb: int):
    """Union the two sides under one schema (key, ts, t, *left, *right)
    with a deterministic key bucket; the other side's columns ride as
    nulls."""
    shared = set(left_cols) & set(right_cols)
    if shared:
        raise ValueError(
            f"left/right payload column names must be disjoint in the "
            f"union schema (shared: {sorted(shared)}); rename one side")
    l_schema = left_ds.schema()
    r_schema = right_ds.schema()
    l_types = {n: t for n, t in zip(l_schema.names, l_schema.types)}
    r_types = {n: t for n, t in zip(r_schema.names, r_schema.types)}

    def tag(is_left: bool):
        own = left_cols if is_left else right_cols
        other = right_cols if is_left else left_cols
        other_types = r_types if is_left else l_types

        def f(b: pa.Table) -> pa.Table:
            k = b[key].to_numpy(zero_copy_only=False)
            cols = {key: b[key], ts: b[ts],
                    "t": pa.array(np.full(b.num_rows,
                                          1 if is_left else 0, np.int8)),
                    "kb": pa.array(_key_bucket(k, nb))}
            for c in own:
                cols[c] = b[c]
            for c in other:
                cols[c] = pa.nulls(b.num_rows, other_types[c])
            order = [key, ts, "t", "kb"] + left_cols + right_cols
            return pa.table({c: cols[c] for c in order})

        return f

    return (left_ds.map_batches(tag(True), batch_format="pyarrow")
            .union(right_ds.map_batches(tag(False),
                                        batch_format="pyarrow")))


def asof_join(left_ds, right_ds, key: str, ts: str,
              left_cols: list[str], right_cols: dict[str, str],
              tie_col: str | None = None):
    """For each left row, attach the LATEST right row of the same key
    with right.ts <= left.ts (inclusive).  Ties among right rows at the
    same ts break toward the largest `tie_col` (default: first of
    right_cols) — fully deterministic.

    `right_cols` maps right column -> output column name.  Returns a
    Dataset of left rows (+key, ts) with the mapped right columns
    (null where no right row precedes).
    """
    left_ds = left_ds.materialize()
    right_ds = right_ds.materialize()
    nb = _n_buckets(left_ds.count() + right_ds.count())
    ren = dict(right_cols)
    rout = list(right_cols.values())
    tie = ren[tie_col or next(iter(right_cols))]

    # output-name the right payload BEFORE the union so identical
    # left/right source names (e.g. event_id on both sides) can't
    # collide in the shared union schema
    def rename_right(b: pa.Table) -> pa.Table:
        return pa.table({(ren.get(c, c) if c not in (key, ts) else c):
                         b[c] for c in b.column_names})

    right2 = right_ds.map_batches(rename_right, batch_format="pyarrow")
    u = _tag_union(left_ds, right2, key, ts, left_cols, rout, nb)

    def bucket_asof(g: pd.DataFrame) -> pd.DataFrame:
        is_l = g["t"].to_numpy() == 1
        lf = g.loc[is_l, [key, ts] + left_cols] \
            .sort_values(ts, kind="mergesort").reset_index(drop=True)
        rf = g.loc[~is_l, [key, ts] + rout] \
            .sort_values([ts, tie], kind="mergesort") \
            .reset_index(drop=True)
        if len(lf) == 0:
            return pd.DataFrame(
                {**{c: lf[c] for c in [key, ts] + left_cols},
                 **{o: pd.Series(dtype="float64") for o in rout}})
        m = pd.merge_asof(lf, rf, on=ts, by=key, direction="backward",
                          allow_exact_matches=True)
        return m[[key, ts] + left_cols + rout]

    return u.groupby("kb").map_groups(bucket_asof, batch_format="pandas")


def range_agg_join(left_ds, right_ds, key: str, ts: str,
                   left_cols: list[str], value_col: str,
                   window_us: int):
    """For each left row, COUNT and SUM the right rows of the same key
    with right.ts in [left.ts - window, left.ts] (both ends inclusive)
    — a range join + aggregate in one pass.

    In-bucket kernel: dense-rank keys, compose rank*span + relative-ts
    into one sortable int64, then two searchsorteds against the sorted
    right keys give each left row its match range; counts are index
    differences and sums come from a prefix-sum array.  O((L+R) log R)
    per bucket, no per-key loop.
    """
    left_ds = left_ds.materialize()
    right_ds = right_ds.materialize()
    nb = _n_buckets(left_ds.count() + right_ds.count())
    u = _tag_union(left_ds, right_ds, key, ts, left_cols, [value_col], nb)

    def bucket_range(g: pd.DataFrame) -> pd.DataFrame:
        is_l = g["t"].to_numpy() == 1
        lf = g.loc[is_l]
        out = {c: lf[c].to_numpy() for c in [key, ts] + left_cols}
        n_l = len(lf)
        if n_l == 0:
            return pd.DataFrame(
                {**out, "n_matches": np.empty(0, np.int64),
                 "sum_value": np.empty(0, np.float64)})
        rf = g.loc[~is_l]
        lts = lf[ts].to_numpy().astype("datetime64[us]").view(np.int64)
        rts = rf[ts].to_numpy().astype("datetime64[us]").view(np.int64)
        lk = lf[key].to_numpy()
        rk = rf[key].to_numpy()
        if len(rf) == 0:
            return pd.DataFrame(
                {**out, "n_matches": np.zeros(n_l, np.int64),
                 "sum_value": np.zeros(n_l, np.float64)})
        t0 = min(lts.min(), rts.min())
        rel_l, rel_r = lts - t0, rts - t0
        span = int(max(rel_l.max(), rel_r.max())) + int(window_us) + 2
        keys = np.unique(np.concatenate([lk, rk]))
        lrank = np.searchsorted(keys, lk).astype(np.int64)
        rrank = np.searchsorted(keys, rk).astype(np.int64)
        if (len(keys)) * span >= 2 ** 62:
            raise ValueError(
                "range_agg_join: rank*span composite would overflow "
                f"int64 (keys={len(keys)}, span_us={span}); shrink the "
                "bucket (raise TARGET_ROWS_PER_BUCKET granularity) or "
                "the time range")
        rkey = rrank * span + rel_r
        order = np.argsort(rkey, kind="stable")
        rkey = rkey[order]
        rvals = rf[value_col].to_numpy(np.float64)[order]
        csum = np.concatenate([[0.0], np.cumsum(rvals)])
        base = lrank * span
        hi = np.searchsorted(rkey, base + rel_l, side="right")
        lo = np.searchsorted(
            rkey, base + np.maximum(rel_l - int(window_us), 0),
            side="left")
        return pd.DataFrame(
            {**out, "n_matches": (hi - lo).astype(np.int64),
             "sum_value": csum[hi] - csum[lo]})

    return u.groupby("kb").map_groups(bucket_range, batch_format="pandas")


# --------------------------------------------------- semi / anti join

# right-side row cap for the broadcast plan: a distinct-key array of
# this size is ~16 MB of int64 — ray.put once, read zero-copy per task
SEMI_BROADCAST_CAP = 2_000_000


def semi_join(left_ds, right_ds, key: str):
    """Left rows whose key appears in `right_ds` (EXISTS)."""
    return _key_filter_join(left_ds, right_ds, key, anti=False)


def anti_join(left_ds, right_ds, key: str):
    """Left rows whose key appears nowhere in `right_ds` (NOT EXISTS)."""
    return _key_filter_join(left_ds, right_ds, key, anti=True)


def _key_filter_join(left_ds, right_ds, key: str, anti: bool,
                     broadcast_cap: int | None = None):
    """Size-gated key-membership filter (the semi/anti-join pair Ray
    Data lacks natively).  Below the cap the right side's DISTINCT keys
    are broadcast once (ray.put, sorted array + searchsorted inside
    map_batches — the small-side-broadcast rule instead of a shuffle
    join); above it, ONE coarse key-hash bucket shuffle co-locates both
    sides and a vectorized in-bucket membership test filters the left
    rows.  Output schema == left schema in both plans."""
    import ray

    from .runtime import counted

    cap = SEMI_BROADCAST_CAP if broadcast_cap is None else broadcast_cap
    # materialize the key projection ONCE: the gate count, the broadcast
    # collect and the distributed tag-union all read it (counted() rule)
    right_keys, n_right = counted(right_ds.select_columns([key]))
    if n_right == 0:
        # empty datasets lose their schema (repo gotcha) — short-circuit:
        # nothing matches, so anti keeps everything and semi keeps nothing
        if anti:
            return left_ds
        return left_ds.map_batches(lambda b: b.slice(0, 0),
                                   batch_format="pyarrow")
    if n_right <= cap:
        kp = right_keys.to_pandas()[key].to_numpy()
        if not np.issubdtype(kp.dtype, np.number):
            kp = kp.astype(object)
        keys_ref = ray.put(np.unique(kp))

        def filt(b: pa.Table) -> pa.Table:
            ks = ray.get(keys_ref)  # zero-copy; sorted by np.unique
            v = b[key].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(ks, v)
            pos_c = np.minimum(pos, max(len(ks) - 1, 0))
            hit = (len(ks) > 0) & (pos < len(ks)) & (ks[pos_c] == v) \
                if len(ks) else np.zeros(len(v), dtype=bool)
            return b.filter(pa.array(~hit if anti else hit))

        return left_ds.map_batches(filt, batch_format="pyarrow")

    # distributed plan: tag-union on a deterministic coarse key bucket
    from .runtime import tune_context
    tune_context()
    left_ds = left_ds.materialize()
    nb = _n_buckets(left_ds.count() + n_right)
    l_schema = left_ds.schema()
    l_names = list(l_schema.names)
    l_types = {n: t for n, t in zip(l_schema.names, l_schema.types)}

    def tag(is_left: bool):
        def f(b: pa.Table) -> pa.Table:
            k = b[key].to_numpy(zero_copy_only=False)
            cols = {"kb": pa.array(_key_bucket(k, nb)),
                    "t": pa.array(np.full(b.num_rows,
                                          1 if is_left else 0, np.int8))}
            for c in l_names:
                cols[c] = b[c] if is_left or c == key else \
                    pa.nulls(b.num_rows, l_types[c])
            return pa.table(cols)

        return f

    u = (left_ds.map_batches(tag(True), batch_format="pyarrow")
         .union(right_keys.map_batches(tag(False), batch_format="pyarrow")))

    def bucket_filter(g: pd.DataFrame) -> pd.DataFrame:
        is_l = g["t"].to_numpy() == 1
        lf = g.loc[is_l, l_names]
        rk = g.loc[~is_l, key].to_numpy()
        hit = np.isin(lf[key].to_numpy(), rk)
        return lf.loc[~hit if anti else hit].reset_index(drop=True)

    return u.groupby("kb").map_groups(bucket_filter, batch_format="pandas")


ATTACH_BROADCAST_CAP = 5_000_000


def _probe_values(mk: np.ndarray, mv: np.ndarray, p: np.ndarray,
                  missing: str) -> np.ndarray:
    """Sorted-map lookup for one probe array under the attach policy."""
    if missing == "self":
        if len(mk) == 0:
            return p.copy()
        pos = np.minimum(np.searchsorted(mk, p), len(mk) - 1)
        return np.where(mk[pos] == p, mv[pos], p)
    if missing.startswith("fill:"):
        # absent keys take a constant (e.g. "fill:0" for sparse count
        # maps, "fill:-1" for optional labels)
        fill = np.int64(int(missing[5:]))
        if len(mk) == 0:
            return np.full(len(p), fill, np.int64)
        pos = np.minimum(np.searchsorted(mk, p), len(mk) - 1)
        return np.where(mk[pos] == p, mv[pos], fill)
    return mv[np.searchsorted(mk, p)]


def attach_by_key(probe_ds, map_ds, probe_cols, key: str, value: str,
                  out_prefix: str = "", missing: str = "error"):
    """Gated lookup join: attach `value` from the (key, value) map table
    onto each of `probe_cols` in the probe Dataset.  With the default
    ``missing="error"`` every probe key must exist in the map — an inner
    semantics with full coverage, e.g. vertex -> CC/LP label, vertex ->
    degree.  ``missing="self"`` keeps the probe key itself as the value
    when absent (the identity-default shape of sparse override maps,
    e.g. doc -> dup-cluster representative).

    Map tables under ATTACH_BROADCAST_CAP rows broadcast once (sorted
    arrays, ray.put) and the attach is a per-batch searchsorted — zero
    shuffles.  Larger maps co-group probes and map rows under a coarse
    key bucket per probe column (one shuffle per column), the same
    union + groupby shape as the other gated joins (robust to Ray
    2.49's empty-hash-partition join crash).

    Output columns: probe columns unchanged + `{out_prefix}{value}_<c>`
    per probe column c.
    """
    import ray

    map_ds = map_ds.materialize()
    nmap = map_ds.count()

    if nmap <= ATTACH_BROADCAST_CAP:
        ks, vs = [], []
        for t in map_ds.iter_batches(batch_format="pyarrow",
                                     batch_size=None):
            ks.append(t[key].to_numpy(zero_copy_only=False)
                      .astype(np.int64))
            vs.append(t[value].to_numpy(zero_copy_only=False)
                      .astype(np.int64))
        k = np.concatenate(ks) if ks else np.empty(0, np.int64)
        v = np.concatenate(vs) if vs else np.empty(0, np.int64)
        o = np.argsort(k)
        mref = ray.put((k[o], v[o]))

        def attach(b: pa.Table) -> pa.Table:
            mk, mv = ray.get(mref)
            for c in probe_cols:
                p = b[c].to_numpy(zero_copy_only=False).astype(np.int64)
                got = _probe_values(mk, mv, p, missing)
                b = b.append_column(f"{out_prefix}{value}_{c}",
                                    pa.array(got, pa.int64()))
            return b

        return probe_ds.map_batches(attach, batch_format="pyarrow")

    # bucketed twin: one co-group pass per probe column
    from .runtime import tune_context
    tune_context()

    out = probe_ds
    nb = _n_buckets(nmap)
    for c in probe_cols:
        vcol = f"{out_prefix}{value}_{c}"

        def tag_probe(b: pa.Table, c=c) -> pa.Table:
            p = b[c].to_numpy(zero_copy_only=False).astype(np.int64)
            return b.append_column(
                "__is_map", pa.array(np.zeros(b.num_rows, np.int8))) \
                .append_column("__k", pa.array(p)) \
                .append_column("__v", pa.array(
                    np.zeros(b.num_rows, np.int64))) \
                .append_column("__jb", pa.array(_key_bucket(p, nb)))

        probe_tagged = out.map_batches(
            tag_probe, batch_format="pyarrow").materialize()
        # pad the map side to the probe schema (union needs one schema);
        # capture (name, type) pairs EAGERLY — never close over a Dataset
        schema = probe_tagged.schema().base_schema
        fields = tuple((f.name, f.type) for f in schema)

        def pad_map(b: pa.Table, fields=fields) -> pa.Table:
            k_ = b[key].to_numpy(zero_copy_only=False).astype(np.int64)
            v_ = b[value].to_numpy(zero_copy_only=False).astype(np.int64)
            n = len(k_)
            have = {"__is_map": pa.array(np.ones(n, np.int8)),
                    "__k": pa.array(k_), "__v": pa.array(v_),
                    "__jb": pa.array(_key_bucket(k_, nb))}

            def zero(typ):
                # typed zeros, NOT nulls: a null int column turns
                # float64 through the pandas map_groups conversion
                try:
                    return pa.array(np.zeros(n, dtype=typ
                                             .to_pandas_dtype()),
                                    type=typ)
                except (pa.ArrowNotImplementedError, TypeError,
                        ValueError):
                    return pa.nulls(n, typ)

            cols = {name: have.get(name, zero(typ))
                    for name, typ in fields}
            return pa.table(cols)

        def bucket(g: pd.DataFrame, vcol=vcol) -> pd.DataFrame:
            is_map = g["__is_map"].to_numpy(np.int8) == 1
            mk = g.loc[is_map, "__k"].to_numpy(np.int64)
            mv = g.loc[is_map, "__v"].to_numpy(np.int64)
            o = np.argsort(mk)
            mk, mv = mk[o], mv[o]
            pr = g.loc[~is_map].drop(columns=["__is_map", "__v", "__jb"])
            if len(pr) == 0:
                pr = pr.drop(columns=["__k"])
                pr[vcol] = pd.Series([], dtype=np.int64)
                return pr
            pk = pr["__k"].to_numpy(np.int64)
            pr = pr.drop(columns=["__k"])
            pr[vcol] = _probe_values(mk, mv, pk, missing)
            return pr

        out = probe_tagged.union(map_ds.map_batches(
            pad_map, batch_format="pyarrow")) \
            .groupby("__jb").map_groups(bucket, batch_format="pandas") \
            .map_batches(lambda b: b, batch_format="pyarrow")
    return out


BLOOM_JOIN_K = 4            # probes per key
BLOOM_BITS_PER_KEY = 10     # ~1% fp rate at k=4
BLOOM_MAX_BITS = 1 << 30    # 128 MB bitmap cap (broadcast once)


def _bloom_u64(keys: np.ndarray, n: int | None = None) -> np.ndarray:
    """Keys -> uint64 (numeric reinterpreted, strings sha-truncated)."""
    a = np.asarray(keys)
    if np.issubdtype(a.dtype, np.number):
        return a.astype(np.int64).astype(np.uint64)
    from .hashing import hash64_str
    return hash64_str(list(a))


def _bloom_positions(keys_u64: np.ndarray, m_bits: int) -> np.ndarray:
    """(n, K) bit positions via double hashing h1 + i*h2 (mod m, m a
    power of two); h1/h2 are independent splitmix64-style avalanches of
    the key (the dedup.py SimHash mix), so sequential int keys spread."""
    def mix(x, seed):
        h = x + np.uint64(seed)
        with np.errstate(over="ignore"):
            h ^= h >> np.uint64(33)
            h *= np.uint64(0xFF51AFD7ED558CCD)
            h ^= h >> np.uint64(29)
            h *= np.uint64(0xC4CEB9FE1A85EC53)
            h ^= h >> np.uint64(32)
        return h

    h1 = mix(keys_u64, 0x9E3779B97F4A7C15)
    h2 = mix(keys_u64, 0xA5A5A5A5A5A5A5A5) | np.uint64(1)
    i = np.arange(BLOOM_JOIN_K, dtype=np.uint64)
    with np.errstate(over="ignore"):
        pos = h1[:, None] + i[None, :] * h2[:, None]
    return (pos & np.uint64(m_bits - 1)).astype(np.int64)


def bloom_semi_join(left_ds, right_ds, key: str,
                    m_bits: int | None = None,
                    broadcast_cap: int | None = None):
    """Bloom-filter semi-join: EXACT left-rows-with-key-in-right, with a
    compact broadcast Bloom prefilter so only PROBABLE matches reach the
    exact membership stage — the classic distributed-join optimization
    for a right side too large to broadcast as raw keys.

    Plan: (1) right keys -> bit positions map-side, unique positions
    stream to the driver which ORs an m-bit bitmap (m/8 bytes, capped at
    128 MB — vs 8 bytes/key for a raw broadcast); (2) the bitmap is
    ray.put once and every left batch drops rows failing any of the K
    probes (no false negatives); (3) survivors — true matches plus the
    ~1% false-positive tail — run through the exact size-gated
    semi_join, which now shuffles only the pruned set.  The result is
    therefore EXACT (the SQL oracle is a plain EXISTS), while the wide
    exchange sees |matches| + fp*|left| rows instead of |left|.

    Below SEMI_BROADCAST_CAP right-side rows the raw-key broadcast plan
    is strictly better — callers should use semi_join directly; this
    function still honors `broadcast_cap` for forced-path tests."""
    import ray

    from .runtime import counted

    # one execution of the right side total: the materialized key
    # projection feeds the gate count, the bitmap build AND the exact
    # semi_join pass below (which only reads the key column anyway)
    right_keys, n_right = counted(right_ds.select_columns([key]))
    if n_right == 0:
        return left_ds.map_batches(lambda b: b.slice(0, 0),
                                   batch_format="pyarrow")
    if m_bits is None:
        m_bits = 1 << int(np.ceil(np.log2(
            max(1024, BLOOM_BITS_PER_KEY * n_right))))
        m_bits = min(m_bits, BLOOM_MAX_BITS)

    def build(b: pa.Table) -> pa.Table:
        k = _bloom_u64(b[key].to_numpy(zero_copy_only=False))
        pos = np.unique(_bloom_positions(k, m_bits).reshape(-1))
        return pa.table({"pos": pa.array(pos)})

    bits = np.zeros(m_bits >> 3, dtype=np.uint8)
    for t in (right_keys
              .map_batches(build, batch_format="pyarrow")
              .iter_batches(batch_format="pyarrow", batch_size=None)):
        p = t["pos"].to_numpy(zero_copy_only=False)
        np.bitwise_or.at(bits, p >> 3, np.uint8(1) << (p & 7).astype(np.uint8))
    bits_ref = ray.put(bits)

    def prefilter(b: pa.Table) -> pa.Table:
        bm = ray.get(bits_ref)  # zero-copy view of the shared bitmap
        k = _bloom_u64(b[key].to_numpy(zero_copy_only=False))
        pos = _bloom_positions(k, m_bits)
        hit = ((bm[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1) \
            .all(axis=1)
        return b.filter(pa.array(hit))

    pruned = left_ds.map_batches(prefilter, batch_format="pyarrow")
    return _key_filter_join(pruned, right_keys, key, anti=False,
                            broadcast_cap=broadcast_cap)


def table_diff(left_ds, right_ds, key: str, value: str):
    """Data reconciliation: full-outer diff of two (key, value) tables.
    Emits one row per key with status 'removed' (left only), 'added'
    (right only), 'changed' (both, values differ) or 'unchanged'.

    Scale shape: the union-tag pattern — both sides stream into ONE
    coarse key-bucket shuffle (never a driver materialization), and a
    vectorized kernel per bucket lines the sides up with a lexsort +
    segment scan.  Value comparison is exact string/array equality in
    the kernel (no hashing, no collision caveat).  Assumes `key` is
    unique per side (a primary key), same as any reconciliation."""
    from .algos.triangles import n_buckets_for
    from .runtime import tune_context

    tune_context()
    left_ds = left_ds.materialize()
    right_ds = right_ds.materialize()
    nb = n_buckets_for(left_ds.count() + right_ds.count())

    def tag(side: int, ds):
        def f(b: pa.Table) -> pa.Table:
            k = b[key].to_numpy(zero_copy_only=False).astype(np.int64)
            with np.errstate(over="ignore"):
                h = k.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                h ^= h >> np.uint64(31)
            return pa.table({
                key: pa.array(k),
                "__v": pc.cast(b[value], pa.string()),
                "__side": pa.array(np.full(len(k), side, np.int64)),
                "__jb": pa.array((h % np.uint64(nb)).astype(np.int64))})
        return ds.map_batches(f, batch_format="pyarrow")

    both = tag(0, left_ds).union(tag(1, right_ds))

    def kernel(g: pd.DataFrame) -> pd.DataFrame:
        k = g[key].to_numpy(np.int64)
        s = g["__side"].to_numpy(np.int64)
        v = g["__v"].to_numpy()
        order = np.lexsort((s, k))
        k, s, v = k[order], s[order], v[order]
        starts = np.flatnonzero(np.concatenate([[True],
                                                k[1:] != k[:-1]]))
        lens = np.diff(np.concatenate([starts, [len(k)]]))
        two = lens == 2
        bad = (lens > 2) | (two & ~((s[starts] == 0)
                                    & (s[np.minimum(starts + 1,
                                                    len(s) - 1)] == 1)))
        if bad.any():
            raise ValueError("table_diff: duplicate key within a side")
        out_k = k[starts]
        status = np.empty(len(starts), object)
        single = lens == 1
        # lens==1: side 0 -> removed, side 1 -> added
        status[single & (s[starts] == 0)] = "removed"
        status[single & (s[starts] == 1)] = "added"
        pair = ~single
        eq = v[starts[pair]] == v[starts[pair] + 1]
        status[pair] = np.where(eq, "unchanged", "changed")
        return pd.DataFrame({key: out_k, "status": status.astype(str)})

    return both.groupby("__jb").map_groups(kernel, batch_format="pandas")
