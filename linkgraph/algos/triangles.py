"""Exact triangle counting (north-rule addition; no reference
implementation — design per SURVEY.md §2.3).

Degree-orientation method, fully as a Ray Data pipeline (no shard
actors):

  1. canonicalize edges to u<v, dedup, drop self-loops;
  2. vertex degrees (both endpoints) via groupby-count;
  3. orient every edge from lower (degree, id) to higher — each triangle
     has exactly ONE wedge whose two out-edges leave its minimum vertex,
     and out-degrees are bounded ~O(sqrt(m)), so wedge count is
     O(Σ deg+²) = O(m^1.5) (SURVEY.md §7.5.7);
  4. wedges: groupby(a).map_groups emitting ordered out-neighbor pairs;
  5. closure: inner-join wedges against the oriented edge set on
     (src, dst); the row count is the exact triangle count.

Shuffles: 2 degree-attach joins + 1 groupby + 1 closure join, all keyed
by vertex id; wedges stream through the join — never materialized on the
driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _canonical(b: pa.Table) -> pa.Table:
    s = b["src"].to_numpy(zero_copy_only=False)
    d = b["dst"].to_numpy(zero_copy_only=False)
    keep = s != d
    s, d = s[keep], d[keep]
    return pa.table({"src": np.minimum(s, d), "dst": np.maximum(s, d)})


# Ray 2.49's hash aggregate spins per-KEY machinery: a
# groupby(["src","dst"]).count() over millions of distinct edge keys
# measured 25x slower than a coarse-bucket groupby + vectorized
# in-bucket kernel on the same rows (49s vs 2s at 2M edges).  All
# wide steps below therefore shuffle on ~|rows|/TARGET_ROWS_PER_BUCKET
# coarse hash buckets and run numpy/pandas kernels per bucket.
TARGET_ROWS_PER_BUCKET = 200_000


def n_buckets_for(n_rows: int, floor: int = 32) -> int:
    return max(floor, int(n_rows) // TARGET_ROWS_PER_BUCKET)


def _pair_bucket(s: np.ndarray, d: np.ndarray, nb: int) -> np.ndarray:
    """Coarse hash bucket of an id pair (uint64 mix, overflow wraps)."""
    with np.errstate(over="ignore"):
        h = (s.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
             ) ^ d.astype(np.uint64)
        h ^= h >> np.uint64(31)
    return (h % np.uint64(nb)).astype(np.int64)


def _run_dedup(lo: np.ndarray, hi: np.ndarray):
    """Sorted first-of-run dedup of an id-pair list (any int64 ids)."""
    order = np.lexsort((hi, lo))
    lo, hi = lo[order], hi[order]
    if len(lo) == 0:
        return lo, hi
    first = np.concatenate(
        [[True], (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])])
    return lo[first], hi[first]


def _run_counts(s: np.ndarray, d: np.ndarray, w: np.ndarray | None = None):
    """(unique (s, d) pairs, per-pair summed weight) via lexsort runs —
    integer weights only, so reduceat order is irrelevant."""
    order = np.lexsort((d, s))
    s, d = s[order], d[order]
    if len(s) == 0:
        return s, d, np.zeros(0, np.int64)
    starts = np.flatnonzero(np.concatenate(
        [[True], (s[1:] != s[:-1]) | (d[1:] != d[:-1])]))
    if w is None:
        cnt = np.diff(np.concatenate([starts, [len(s)]])).astype(np.int64)
    else:
        cnt = np.add.reduceat(w[order].astype(np.int64), starts)
    return s[starts], d[starts], cnt


def canon_dedup_ds(edges_ds, n_edges: int):
    """Canonical (src<dst, no loops) DEDUPED simple edge set, as a
    Dataset.  Per-batch dedup combiner, then one coarse-bucket shuffle
    with a vectorized in-bucket dedup — never a per-edge-key hash
    aggregate (see TARGET_ROWS_PER_BUCKET note)."""
    nb = n_buckets_for(n_edges)

    def salt(b: pa.Table) -> pa.Table:
        c = _canonical(b)
        lo, hi = _run_dedup(c["src"].to_numpy(zero_copy_only=False),
                            c["dst"].to_numpy(zero_copy_only=False))
        return pa.table({"src": pa.array(lo, pa.int64()),
                         "dst": pa.array(hi, pa.int64()),
                         "cb": pa.array(_pair_bucket(lo, hi, nb))})

    def bucket_dedup(g: pd.DataFrame) -> pd.DataFrame:
        lo, hi = _run_dedup(g["src"].to_numpy(np.int64),
                            g["dst"].to_numpy(np.int64))
        return pd.DataFrame({"src": lo, "dst": hi})

    return (edges_ds.map_batches(salt, batch_format="pyarrow")
            .groupby("cb").map_groups(bucket_dedup, batch_format="pandas"))


def _vertex_degrees(canon_ds, n_edges: int):
    """(v, degree) over both endpoints: per-batch unique-count partials
    (combiner), then one coarse-bucket shuffle keyed v % nb with an
    in-bucket bincount merge."""
    nb = n_buckets_for(2 * n_edges)

    def partial(b: pa.Table) -> pa.Table:
        v = np.concatenate(
            [b["src"].to_numpy(zero_copy_only=False).astype(np.int64),
             b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)])
        u, c = np.unique(v, return_counts=True)
        return pa.table({"v": pa.array(u, pa.int64()),
                         "cnt": pa.array(c.astype(np.int64)),
                         "db": pa.array((u % nb).astype(np.int64))})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        u, inv = np.unique(g["v"].to_numpy(np.int64), return_inverse=True)
        deg = np.bincount(inv, weights=g["cnt"].to_numpy(np.float64),
                          minlength=len(u)).astype(np.int64)
        return pd.DataFrame({"v": u, "degree": deg})

    return (canon_ds.map_batches(partial, batch_format="pyarrow")
            .groupby("db").map_groups(merge, batch_format="pandas"))


# degree tables up to this row count ride the broadcast path (ray.put a
# dense/sorted lookup once, read zero-copy in every orient task); larger
# vertex sets fall back to the two hash joins — the same size-gate rule
# as dedup.DRIVER_PAIR_CAP
BROADCAST_DEG_CAP = 5_000_000


def _orient(b: pa.Table) -> pa.Table:
    s = b["src"].to_numpy(zero_copy_only=False)
    d = b["dst"].to_numpy(zero_copy_only=False)
    sd = b["src_deg"].to_numpy(zero_copy_only=False)
    dd = b["dst_deg"].to_numpy(zero_copy_only=False)
    src_first = (sd < dd) | ((sd == dd) & (s < d))
    a = np.where(src_first, s, d)
    bb = np.where(src_first, d, s)
    bdeg = np.where(src_first, dd, sd)
    return pa.table({"a": pa.array(a, pa.int64()),
                     "b": pa.array(bb, pa.int64()),
                     "b_deg": pa.array(bdeg, pa.int64())})


def oriented_edges(edges_ds, num_partitions: int = 16):
    """Canonical simple edges -> (a, b, b_deg) oriented low->high (deg, id)."""
    from ..runtime import tune_context
    tune_context()
    edges_ds = edges_ds.materialize()
    canon = canon_dedup_ds(edges_ds, edges_ds.count()).materialize()
    n_canon = canon.count()
    deg = _vertex_degrees(canon, n_canon).materialize()  # gate + consume
    if deg.count() <= BROADCAST_DEG_CAP:
        import ray

        pdf = deg.to_pandas()
        dref = ray.put((np.sort(pdf["v"].to_numpy()),
                        pdf["degree"].to_numpy()[
                            np.argsort(pdf["v"].to_numpy())]))

        def orient_bc(b: pa.Table) -> pa.Table:
            vs, dg = ray.get(dref)
            s = b["src"].to_numpy(zero_copy_only=False)
            d = b["dst"].to_numpy(zero_copy_only=False)
            t = pa.table({
                "src": b["src"], "dst": b["dst"],
                "src_deg": pa.array(dg[np.searchsorted(vs, s)]),
                "dst_deg": pa.array(dg[np.searchsorted(vs, d)])})
            return _orient(t)

        return canon.map_batches(orient_bc, batch_format="pyarrow")
    sdeg = deg.map_batches(
        lambda b: pa.table({"src": b["v"], "src_deg": b["degree"]}),
        batch_format="pyarrow")
    ddeg = deg.map_batches(
        lambda b: pa.table({"dst": b["v"], "dst_deg": b["degree"]}),
        batch_format="pyarrow")
    j = canon.join(sdeg, join_type="inner", num_partitions=num_partitions,
                   on=("src",))
    j = j.join(ddeg, join_type="inner", num_partitions=num_partitions,
               on=("dst",))
    return j.map_batches(_orient, batch_format="pyarrow")


# wedge-stage salt: scale the bucket count with the edge set so a
# map_groups task holds ~TARGET_EDGES_PER_WEDGE_BUCKET oriented edges
# instead of |E|/64 (VERDICT r2 #4: a fixed 64-way salt is a memory
# cliff at 100x).  Per-task wedge emission is bounded in expectation by
# the orientation's O(sqrt m) out-degree cap; a single source's wedges
# never split across tasks (closure correctness needs no co-location,
# this is purely a memory bound).
WEDGE_BUCKETS = 64  # floor
TARGET_EDGES_PER_WEDGE_BUCKET = 100_000


def wedge_buckets_for(n_edges: int) -> int:
    return max(WEDGE_BUCKETS,
               int(n_edges) // TARGET_EDGES_PER_WEDGE_BUCKET)


def _wedges_bucket(g: pd.DataFrame) -> pd.DataFrame:
    """All ordered out-neighbor pairs for EVERY source in one coarse
    hash bucket, via segment arithmetic — one map_groups call per bucket
    (a small constant) instead of one per source vertex (the same
    vectorization that took the LSH pairing from 52.9s to sub-second,
    dedup._band_pairs_factory)."""
    empty = pd.DataFrame({"src": np.empty(0, np.int64),
                          "dst": np.empty(0, np.int64)})
    a = g["a"].to_numpy(np.int64)
    b = g["b"].to_numpy(np.int64)
    bd = g["b_deg"].to_numpy(np.int64)
    order = np.lexsort((b, bd, a))  # per-source neighbors in (deg, id) order
    a, b = a[order], b[order]
    starts = np.flatnonzero(np.concatenate([[True], a[1:] != a[:-1]]))
    lens = np.diff(np.concatenate([starts, [len(a)]]))
    seg = np.repeat(np.arange(len(starts)), lens)
    pos = np.arange(len(a)) - starts[seg]
    reps = lens[seg] - pos - 1  # pairs where this slot is the first element
    total = int(reps.sum())
    if total == 0:
        return empty
    i_idx = np.repeat(np.arange(len(a)), reps)
    csum = np.cumsum(reps) - reps
    j_idx = i_idx + 1 + (np.arange(total) - csum[i_idx])
    return pd.DataFrame({"src": b[i_idx], "dst": b[j_idx]})


# edge sets up to this size count triangles in one driver numpy kernel
# (exact, same orientation rule); larger graphs run the distributed
# pipeline below — the standard size-gate
DRIVER_TRI_CAP = 500_000


def _triangle_count_local(pdf: pd.DataFrame) -> int:
    """Exact in-process count: canonicalize -> degree-orient -> wedge
    segments -> closure membership via composite-key searchsorted."""
    s = pdf["src"].to_numpy(np.int64)
    d = pdf["dst"].to_numpy(np.int64)
    keep = s != d
    lo = np.minimum(s[keep], d[keep])
    hi = np.maximum(s[keep], d[keep])
    if len(lo) == 0:
        return 0
    edges = np.unique((lo << 32) | hi)
    lo, hi = edges >> 32, edges & 0xFFFFFFFF
    deg = np.bincount(lo, minlength=int(hi.max()) + 1) \
        + np.bincount(hi, minlength=int(hi.max()) + 1)
    src_first = (deg[lo] < deg[hi]) | ((deg[lo] == deg[hi]) & (lo < hi))
    a = np.where(src_first, lo, hi)
    b = np.where(src_first, hi, lo)
    # per-source neighbor lists ordered by (deg, id) — wedge pairs are
    # then (closer, farther) in orientation order
    order = np.lexsort((b, deg[b], a))
    a, b = a[order], b[order]
    starts = np.flatnonzero(np.concatenate([[True], a[1:] != a[:-1]]))
    lens = np.diff(np.concatenate([starts, [len(a)]]))
    seg = np.repeat(np.arange(len(starts)), lens)
    pos = np.arange(len(a)) - starts[seg]
    reps = lens[seg] - pos - 1
    total = int(reps.sum())
    if total == 0:
        return 0
    i_idx = np.repeat(np.arange(len(a)), reps)
    csum = np.cumsum(reps) - reps
    j_idx = i_idx + 1 + (np.arange(total) - csum[i_idx])
    wkey = (b[i_idx].astype(np.int64) << 32) | b[j_idx]
    okey = np.sort((a.astype(np.int64) << 32) | b)
    p = np.searchsorted(okey, wkey)
    p = np.minimum(p, len(okey) - 1)
    return int((okey[p] == wkey).sum())


# oriented edge sets up to this many rows broadcast their packed
# (a<<32)|b key array once (ray.put, 8 bytes/edge — 160MB at the cap)
# and the closure becomes a shuffle-free per-batch membership filter;
# larger edge sets (or ids >= 2^31) run the coarse-bucket merge
EDGE_KEY_BROADCAST_CAP = 20_000_000


def triangle_count(edges_ds, num_partitions: int = 16) -> int:
    """Exact global triangle count of the undirected simple graph.

    Edge sets under DRIVER_TRI_CAP (and ids < 2^31) run the vectorized
    driver kernel.  Larger graphs run the distributed pipeline; the
    closure (does wedge (b,c) exist as an oriented edge?) is size-gated:

    - <= EDGE_KEY_BROADCAST_CAP oriented edges with ids < 2^31: the
      sorted packed edge-key array is ray.put once and every wedge batch
      filters via searchsorted — zero shuffles, one int64 count partial
      per batch.
    - above: wedges and edges union under a coarse pair-hash bucket;
      each bucket counts membership with one vectorized pandas merge —
      a ~|rows|/TARGET_ROWS_PER_BUCKET-key shuffle, never a per-edge-key
      hash aggregate (measured 25x slower, see TARGET_ROWS_PER_BUCKET).
    """
    import ray

    edges_ds = edges_ds.materialize()
    if edges_ds.count() <= DRIVER_TRI_CAP:
        pdf = edges_ds.to_pandas()
        if len(pdf) == 0:
            return 0
        mx = max(pdf["src"].max(), pdf["dst"].max())
        if mx < 2 ** 31:
            return _triangle_count_local(pdf)

    # materialized: `oe` feeds the wedge stage AND the closure side — a
    # diamond over un-materialized lineage deadlocks the streaming
    # executor (observed on Ray 2.49); O(|E|) blocks, spills if needed
    oe = oriented_edges(edges_ds, num_partitions).materialize()
    n_oe = oe.count()
    if n_oe == 0:
        return 0
    nb = wedge_buckets_for(n_oe)
    salted = oe.map_batches(
        lambda b: b.append_column("wb", pa.array(
            (b["a"].to_numpy(zero_copy_only=False) % nb)
            .astype(np.int64))),
        batch_format="pyarrow")
    wedges = salted.groupby("wb").map_groups(_wedges_bucket,
                                             batch_format="pandas")

    if n_oe <= EDGE_KEY_BROADCAST_CAP:
        mx = max(int(oe.max("a")), int(oe.max("b")))
        if mx < 2 ** 31:
            keys = np.sort(np.concatenate(
                [(t["a"].to_numpy(zero_copy_only=False).astype(np.uint64)
                  << np.uint64(32))
                 | t["b"].to_numpy(zero_copy_only=False).astype(np.uint64)
                 for t in oe.iter_batches(batch_format="pyarrow",
                                          batch_size=None)] or
                [np.empty(0, np.uint64)]))
            kref = ray.put(keys)

            def member_count(b: pa.Table) -> pa.Table:
                k = ray.get(kref)
                wk = (b["src"].to_numpy(zero_copy_only=False)
                      .astype(np.uint64) << np.uint64(32)) \
                    | b["dst"].to_numpy(zero_copy_only=False).astype(np.uint64)
                if len(k) == 0:
                    n = 0
                else:
                    p = np.minimum(np.searchsorted(k, wk), len(k) - 1)
                    n = int((k[p] == wk).sum())
                return pa.table({"tri": pa.array([n], pa.int64())})

            total = wedges.map_batches(
                member_count, batch_format="pyarrow").sum("tri")
            return int(total) if total is not None else 0

    # coarse-bucket merge closure (huge graphs / 64-bit ids)
    cb = n_buckets_for(n_oe)

    def tag_edges(b: pa.Table) -> pa.Table:
        a = b["a"].to_numpy(zero_copy_only=False)
        bb = b["b"].to_numpy(zero_copy_only=False)
        return pa.table({"src": pa.array(a, pa.int64()),
                         "dst": pa.array(bb, pa.int64()),
                         "t": pa.array(np.zeros(len(a), np.int8)),
                         "ub": pa.array(_pair_bucket(a, bb, cb))})

    def tag_wedges(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        return pa.table({"src": pa.array(s, pa.int64()),
                         "dst": pa.array(d, pa.int64()),
                         "t": pa.array(np.ones(len(s), np.int8)),
                         "ub": pa.array(_pair_bucket(s, d, cb))})

    def bucket_closure(g: pd.DataFrame) -> pd.DataFrame:
        is_e = g["t"].to_numpy() == 0
        e = g.loc[is_e, ["src", "dst"]]
        w = g.loc[~is_e, ["src", "dst"]]
        if len(e) == 0 or len(w) == 0:
            return pd.DataFrame({"tri": [0]})
        return pd.DataFrame(
            {"tri": [len(w.merge(e, on=["src", "dst"], how="inner"))]})

    tagged = wedges.map_batches(tag_wedges, batch_format="pyarrow").union(
        oe.map_batches(tag_edges, batch_format="pyarrow"))
    closed = tagged.groupby("ub").map_groups(bucket_closure,
                                             batch_format="pandas")
    total = closed.sum("tri")
    return int(total) if total is not None else 0


def _tri_endpoints_local(pdf: pd.DataFrame):
    """Driver kernel: matched triangle endpoint arrays (a, b, c) of the
    canonical simple graph — same orientation/wedge/closure recurrence
    as _triangle_count_local, returning the triples instead of a count."""
    s = pdf["src"].to_numpy(np.int64)
    d = pdf["dst"].to_numpy(np.int64)
    keep = s != d
    lo = np.minimum(s[keep], d[keep])
    hi = np.maximum(s[keep], d[keep])
    z = np.empty(0, np.int64)
    if len(lo) == 0:
        return z, z, z
    edges = np.unique((lo << 32) | hi)
    lo, hi = edges >> 32, edges & 0xFFFFFFFF
    deg = np.bincount(lo, minlength=int(hi.max()) + 1) \
        + np.bincount(hi, minlength=int(hi.max()) + 1)
    src_first = (deg[lo] < deg[hi]) | ((deg[lo] == deg[hi]) & (lo < hi))
    a = np.where(src_first, lo, hi)
    b = np.where(src_first, hi, lo)
    order = np.lexsort((b, deg[b], a))
    a, b = a[order], b[order]
    starts = np.flatnonzero(np.concatenate([[True], a[1:] != a[:-1]]))
    lens = np.diff(np.concatenate([starts, [len(a)]]))
    seg = np.repeat(np.arange(len(starts)), lens)
    pos = np.arange(len(a)) - starts[seg]
    reps = lens[seg] - pos - 1
    total = int(reps.sum())
    if total == 0:
        return z, z, z
    i_idx = np.repeat(np.arange(len(a)), reps)
    csum = np.cumsum(reps) - reps
    j_idx = i_idx + 1 + (np.arange(total) - csum[i_idx])
    wkey = (b[i_idx].astype(np.int64) << 32) | b[j_idx]
    okey = np.sort((a.astype(np.int64) << 32) | b)
    p = np.minimum(np.searchsorted(okey, wkey), len(okey) - 1)
    m = okey[p] == wkey
    return a[i_idx[m]], b[i_idx[m]], b[j_idx[m]]


def _wedges_bucket_v(g: pd.DataFrame) -> pd.DataFrame:
    """_wedges_bucket carrying the wedge source vertex `wa` (needed to
    credit the triangle to all three endpoints)."""
    empty = pd.DataFrame({"wa": np.empty(0, np.int64),
                          "src": np.empty(0, np.int64),
                          "dst": np.empty(0, np.int64)})
    a = g["a"].to_numpy(np.int64)
    b = g["b"].to_numpy(np.int64)
    bd = g["b_deg"].to_numpy(np.int64)
    order = np.lexsort((b, bd, a))
    a, b = a[order], b[order]
    starts = np.flatnonzero(np.concatenate([[True], a[1:] != a[:-1]]))
    lens = np.diff(np.concatenate([starts, [len(a)]]))
    seg = np.repeat(np.arange(len(starts)), lens)
    pos = np.arange(len(a)) - starts[seg]
    reps = lens[seg] - pos - 1
    total = int(reps.sum())
    if total == 0:
        return empty
    i_idx = np.repeat(np.arange(len(a)), reps)
    csum = np.cumsum(reps) - reps
    j_idx = i_idx + 1 + (np.arange(total) - csum[i_idx])
    return pd.DataFrame({"wa": a[i_idx], "src": b[i_idx], "dst": b[j_idx]})


def _count_partial(vs: np.ndarray, nb: int) -> pa.Table:
    u, c = np.unique(vs, return_counts=True)
    return pa.table({"v": pa.array(u, pa.int64()),
                     "cnt": pa.array(c.astype(np.int64)),
                     "vb": pa.array((u % nb).astype(np.int64))})


def clustering_coefficients(edges_ds, num_partitions: int = 16):
    """Per-vertex local clustering coefficient of the undirected simple
    graph: clustering(v) = 2 * triangles(v) / (deg(v) * (deg(v) - 1)),
    0.0 when deg < 2, over every vertex incident to an edge.

    Same size gates as triangle_count: a driver numpy kernel under
    DRIVER_TRI_CAP, else the distributed wedge pipeline with the wedge
    source carried through the (broadcast | coarse-bucket) closure, a
    coarse-bucket per-vertex sum of matched-endpoint partials, and one
    final bucket merge against the degree table.  Returns a Dataset
    (doc_id, clustering) — or a pandas frame on the driver path.
    """
    import ray
    import ray.data as rd

    edges_ds = edges_ds.materialize()
    n_edges = edges_ds.count()
    if n_edges == 0:
        return pd.DataFrame({"doc_id": np.empty(0, np.int64),
                             "clustering": np.empty(0, np.float64)})
    if n_edges <= DRIVER_TRI_CAP:
        pdf = edges_ds.to_pandas()
        mx = max(pdf["src"].max(), pdf["dst"].max())
        if mx < 2 ** 31:
            ta, tb, tc = _tri_endpoints_local(pdf)
            s = pdf["src"].to_numpy(np.int64)
            d = pdf["dst"].to_numpy(np.int64)
            keep = s != d
            lo = np.minimum(s[keep], d[keep])
            hi = np.maximum(s[keep], d[keep])
            edges = np.unique((lo << 32) | hi)
            lo, hi = edges >> 32, edges & 0xFFFFFFFF
            n = int(mx) + 1
            deg = np.bincount(lo, minlength=n) + np.bincount(hi, minlength=n)
            t = np.bincount(np.concatenate([ta, tb, tc]), minlength=n)
            v = np.flatnonzero(deg > 0)
            dv = deg[v].astype(np.float64)
            with np.errstate(divide="ignore", invalid="ignore"):
                cl = np.where(dv >= 2, 2.0 * t[v] / (dv * (dv - 1.0)), 0.0)
            return pd.DataFrame({"doc_id": v.astype(np.int64),
                                 "clustering": np.round(cl, 6)})

    canon = canon_dedup_ds(edges_ds, n_edges).materialize()
    n_ce = canon.count()
    degrees = _vertex_degrees(canon, n_ce)
    oe = oriented_edges(edges_ds, num_partitions).materialize()
    n_oe = oe.count()
    nb = wedge_buckets_for(n_oe)
    vb = n_buckets_for(2 * n_oe)
    salted = oe.map_batches(
        lambda b: b.append_column("wb", pa.array(
            (b["a"].to_numpy(zero_copy_only=False) % nb)
            .astype(np.int64))),
        batch_format="pyarrow")
    wedges = salted.groupby("wb").map_groups(_wedges_bucket_v,
                                             batch_format="pandas")

    mx = max(int(oe.max("a")), int(oe.max("b")))
    if n_oe <= EDGE_KEY_BROADCAST_CAP and mx < 2 ** 31:
        keys = np.sort(np.concatenate(
            [(t["a"].to_numpy(zero_copy_only=False).astype(np.uint64)
              << np.uint64(32))
             | t["b"].to_numpy(zero_copy_only=False).astype(np.uint64)
             for t in oe.iter_batches(batch_format="pyarrow",
                                      batch_size=None)] or
            [np.empty(0, np.uint64)]))
        kref = ray.put(keys)

        def member_partial(b: pa.Table) -> pa.Table:
            k = ray.get(kref)
            s = b["src"].to_numpy(zero_copy_only=False).astype(np.uint64)
            d = b["dst"].to_numpy(zero_copy_only=False).astype(np.uint64)
            wk = (s << np.uint64(32)) | d
            if len(k) == 0:
                m = np.zeros(len(wk), bool)
            else:
                p = np.minimum(np.searchsorted(k, wk), len(k) - 1)
                m = k[p] == wk
            wa = b["wa"].to_numpy(zero_copy_only=False)
            vs = np.concatenate([wa[m], s[m].astype(np.int64),
                                 d[m].astype(np.int64)])
            return _count_partial(vs, vb)

        partials = wedges.map_batches(member_partial, batch_format="pyarrow")
    else:
        cb = n_buckets_for(n_oe)

        def tag_edges(b: pa.Table) -> pa.Table:
            a = b["a"].to_numpy(zero_copy_only=False)
            bb = b["b"].to_numpy(zero_copy_only=False)
            return pa.table({"wa": pa.array(np.full(len(a), -1, np.int64)),
                             "src": pa.array(a, pa.int64()),
                             "dst": pa.array(bb, pa.int64()),
                             "ub": pa.array(_pair_bucket(a, bb, cb))})

        def tag_wedges(b: pa.Table) -> pa.Table:
            s = b["src"].to_numpy(zero_copy_only=False)
            d = b["dst"].to_numpy(zero_copy_only=False)
            return pa.table({"wa": b["wa"],
                             "src": pa.array(s, pa.int64()),
                             "dst": pa.array(d, pa.int64()),
                             "ub": pa.array(_pair_bucket(s, d, cb))})

        def bucket_closure_v(g: pd.DataFrame) -> pd.DataFrame:
            is_e = g["wa"].to_numpy() < 0
            e = g.loc[is_e, ["src", "dst"]]
            w = g.loc[~is_e, ["wa", "src", "dst"]]
            if len(e) == 0 or len(w) == 0:
                return pd.DataFrame({"v": np.empty(0, np.int64),
                                     "cnt": np.empty(0, np.int64),
                                     "vb": np.empty(0, np.int64)})
            m = w.merge(e, on=["src", "dst"], how="inner")
            vs = np.concatenate([m["wa"].to_numpy(np.int64),
                                 m["src"].to_numpy(np.int64),
                                 m["dst"].to_numpy(np.int64)])
            return _count_partial(vs, vb).to_pandas()

        tagged = wedges.map_batches(tag_wedges, batch_format="pyarrow") \
            .union(oe.map_batches(tag_edges, batch_format="pyarrow"))
        partials = tagged.groupby("ub").map_groups(
            bucket_closure_v, batch_format="pandas") \
            .map_batches(lambda b: b, batch_format="pyarrow")  # arrow blocks
        # (the later union with the degree side asserts matching block types)

    # per-vertex triangle sums + degree merge, one coarse-bucket shuffle:
    # tag degree rows cnt=-1-degree so the in-bucket kernel can split them
    def tag_deg(b: pa.Table) -> pa.Table:
        v = b["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        dg = b["degree"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"v": pa.array(v), "cnt": pa.array(-1 - dg),
                         "vb": pa.array((v % vb).astype(np.int64))})

    def merge_cluster(g: pd.DataFrame) -> pd.DataFrame:
        v = g["v"].to_numpy(np.int64)
        c = g["cnt"].to_numpy(np.int64)
        is_deg = c < 0
        dv_ids = v[is_deg]
        dv = (-1 - c[is_deg]).astype(np.float64)
        u, inv = np.unique(v[~is_deg], return_inverse=True)
        t = np.bincount(inv, weights=c[~is_deg].astype(np.float64),
                        minlength=len(u))
        pos = np.searchsorted(u, dv_ids)
        tt = np.zeros(len(dv_ids), np.float64)
        ok = (pos < len(u))
        ok[ok] &= u[pos[ok]] == dv_ids[ok]
        tt[ok] = t[pos[ok]]
        with np.errstate(divide="ignore", invalid="ignore"):
            cl = np.where(dv >= 2, 2.0 * tt / (dv * (dv - 1.0)), 0.0)
        return pd.DataFrame({"doc_id": dv_ids, "clustering": np.round(cl, 6)})

    both = partials.union(degrees.map_batches(tag_deg,
                                              batch_format="pyarrow"))
    return both.groupby("vb").map_groups(merge_cluster,
                                         batch_format="pandas")


def _four_clique_count_local(pdf: pd.DataFrame) -> int:
    """Driver kernel: exact 4-clique count via the kClist recurrence on
    the degree-ordered DAG — every 4-clique is counted once from its
    lowest oriented triangle (a, b, c) as |N+(a) ∩ N+(b) ∩ N+(c)|,
    with the triple intersection evaluated as packed-key membership of
    (b, x) and (c, x) for each x in N+(a)."""
    ta, tb, tc = _tri_endpoints_local(pdf)
    if len(ta) == 0:
        return 0
    s = pdf["src"].to_numpy(np.int64)
    d = pdf["dst"].to_numpy(np.int64)
    keep = s != d
    lo = np.minimum(s[keep], d[keep])
    hi = np.maximum(s[keep], d[keep])
    edges = np.unique((lo << 32) | hi)
    lo, hi = edges >> 32, edges & 0xFFFFFFFF
    deg = np.bincount(lo, minlength=int(hi.max()) + 1) \
        + np.bincount(hi, minlength=int(hi.max()) + 1)
    src_first = (deg[lo] < deg[hi]) | ((deg[lo] == deg[hi]) & (lo < hi))
    a = np.where(src_first, lo, hi)
    b = np.where(src_first, hi, lo)
    okey = np.sort((a.astype(np.uint64) << np.uint64(32))
                   | b.astype(np.uint64))
    # N+(ta) slices via packed-key range search (no |V|-sized arrays)
    lo_p = np.searchsorted(okey, ta.astype(np.uint64) << np.uint64(32))
    hi_p = np.searchsorted(okey,
                           (ta.astype(np.uint64) + 1) << np.uint64(32))
    cnt = hi_p - lo_p
    total = int(cnt.sum())
    if total == 0:
        return 0
    row = np.repeat(np.arange(len(ta)), cnt)
    gather = (np.arange(total) - np.repeat(np.cumsum(cnt) - cnt, cnt)
              + np.repeat(lo_p, cnt))
    x = okey[gather] & np.uint64(0xFFFFFFFF)
    k1 = (tb[row].astype(np.uint64) << np.uint64(32)) | x
    k2 = (tc[row].astype(np.uint64) << np.uint64(32)) | x
    p1 = np.minimum(np.searchsorted(okey, k1), len(okey) - 1)
    p2 = np.minimum(np.searchsorted(okey, k2), len(okey) - 1)
    return int(((okey[p1] == k1) & (okey[p2] == k2)).sum())


def four_clique_count(edges_ds, num_partitions: int = 16) -> int:
    """Exact global 4-clique count of the undirected simple graph
    (motif counting) — the kClist recurrence one level above
    triangle_count, with the same size gates:

    - under DRIVER_TRI_CAP (ids < 2^31): the driver numpy kernel;
    - under EDGE_KEY_BROADCAST_CAP oriented edges (ids < 2^31): the
      sorted packed edge-key array is ray.put ONCE and doubles as both
      the wedge-closure membership test and the N+(a) adjacency (range
      search on the packed keys) — zero shuffles past the wedge stage;
    - above: coarse-bucket merges all the way — triangle closure
      bucketed by the wedge pair, candidate expansion bucketed by the
      triangle's low vertex (adjacency co-located by the same key),
      and the final (b,x)/(c,x) conjunction bucketed by x so BOTH
      probes of a candidate land in one bucket (no per-candidate
      groupby)."""
    import ray

    edges_ds = edges_ds.materialize()
    if edges_ds.count() <= DRIVER_TRI_CAP:
        pdf = edges_ds.to_pandas()
        if len(pdf) == 0:
            return 0
        mx = max(pdf["src"].max(), pdf["dst"].max())
        if mx < 2 ** 31:
            return _four_clique_count_local(pdf)

    oe = oriented_edges(edges_ds, num_partitions).materialize()
    n_oe = oe.count()
    if n_oe == 0:
        return 0
    nb = wedge_buckets_for(n_oe)
    salted = oe.map_batches(
        lambda b: b.append_column("wb", pa.array(
            (b["a"].to_numpy(zero_copy_only=False) % nb)
            .astype(np.int64))),
        batch_format="pyarrow")
    wedges = salted.groupby("wb").map_groups(_wedges_bucket_v,
                                             batch_format="pandas")

    if n_oe <= EDGE_KEY_BROADCAST_CAP:
        mx = max(int(oe.max("a")), int(oe.max("b")))
        if mx < 2 ** 31:
            keys = np.sort(np.concatenate(
                [(t["a"].to_numpy(zero_copy_only=False).astype(np.uint64)
                  << np.uint64(32))
                 | t["b"].to_numpy(zero_copy_only=False).astype(np.uint64)
                 for t in oe.iter_batches(batch_format="pyarrow",
                                          batch_size=None)] or
                [np.empty(0, np.uint64)]))
            kref = ray.put(keys)

            def count4(t: pa.Table) -> pa.Table:
                k = ray.get(kref)
                zero = pa.table({"c4": pa.array([0], pa.int64())})
                if len(k) == 0 or len(t) == 0:
                    return zero
                wa = t["wa"].to_numpy(zero_copy_only=False) \
                    .astype(np.uint64)
                bb = t["src"].to_numpy(zero_copy_only=False) \
                    .astype(np.uint64)
                cc = t["dst"].to_numpy(zero_copy_only=False) \
                    .astype(np.uint64)
                wk = (bb << np.uint64(32)) | cc
                p = np.minimum(np.searchsorted(k, wk), len(k) - 1)
                m = k[p] == wk  # wedge closes -> oriented triangle
                wa, bb, cc = wa[m], bb[m], cc[m]
                if len(wa) == 0:
                    return zero
                lo_p = np.searchsorted(k, wa << np.uint64(32))
                hi_p = np.searchsorted(k, (wa + np.uint64(1))
                                       << np.uint64(32))
                cnt = hi_p - lo_p
                total = int(cnt.sum())
                if total == 0:
                    return zero
                row = np.repeat(np.arange(len(wa)), cnt)
                gather = (np.arange(total)
                          - np.repeat(np.cumsum(cnt) - cnt, cnt)
                          + np.repeat(lo_p, cnt))
                x = k[gather] & np.uint64(0xFFFFFFFF)
                k1 = (bb[row] << np.uint64(32)) | x
                k2 = (cc[row] << np.uint64(32)) | x
                p1 = np.minimum(np.searchsorted(k, k1), len(k) - 1)
                p2 = np.minimum(np.searchsorted(k, k2), len(k) - 1)
                n = int(((k[p1] == k1) & (k[p2] == k2)).sum())
                return pa.table({"c4": pa.array([n], pa.int64())})

            total = wedges.map_batches(
                count4, batch_format="pyarrow").sum("c4")
            return int(total) if total is not None else 0

    # coarse-bucket fallback (giant edge sets / 64-bit ids)
    cb = n_buckets_for(n_oe)

    def tag_edges_pair(b: pa.Table) -> pa.Table:
        a = b["a"].to_numpy(zero_copy_only=False)
        bb = b["b"].to_numpy(zero_copy_only=False)
        z = np.full(len(a), -1, np.int64)
        return pa.table({"wa": pa.array(z),
                         "src": pa.array(a, pa.int64()),
                         "dst": pa.array(bb, pa.int64()),
                         "ub": pa.array(_pair_bucket(a, bb, cb))})

    def tag_wedges_pair(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        return pa.table({"wa": pc.cast(b["wa"], pa.int64()),
                         "src": pa.array(s, pa.int64()),
                         "dst": pa.array(d, pa.int64()),
                         "ub": pa.array(_pair_bucket(s, d, cb))})

    def close_tri(g: pd.DataFrame) -> pd.DataFrame:
        is_e = g["wa"].to_numpy() < 0
        e = g.loc[is_e, ["src", "dst"]]
        w = g.loc[~is_e, ["wa", "src", "dst"]]
        if len(e) == 0 or len(w) == 0:
            return pd.DataFrame({"wa": np.empty(0, np.int64),
                                 "b": np.empty(0, np.int64),
                                 "c": np.empty(0, np.int64)})
        m = w.merge(e, on=["src", "dst"], how="inner")
        return pd.DataFrame({"wa": m["wa"].to_numpy(np.int64),
                             "b": m["src"].to_numpy(np.int64),
                             "c": m["dst"].to_numpy(np.int64)})

    tris = wedges.map_batches(tag_wedges_pair, batch_format="pyarrow") \
        .union(oe.map_batches(tag_edges_pair, batch_format="pyarrow")) \
        .groupby("ub").map_groups(close_tri, batch_format="pandas") \
        .materialize()

    def tag_adj(b: pa.Table) -> pa.Table:
        a = b["a"].to_numpy(zero_copy_only=False)
        return pa.table({"wa": pa.array(a, pa.int64()),
                         "b": pc.cast(b["b"], pa.int64()),
                         "c": pa.array(np.full(len(a), -1, np.int64)),
                         "ab": pa.array((a % cb).astype(np.int64))})

    def tag_tri(b: pa.Table) -> pa.Table:
        wa = b["wa"].to_numpy(zero_copy_only=False)
        return pa.table({"wa": pa.array(wa, pa.int64()),
                         "b": b["b"], "c": b["c"],
                         "ab": pa.array((wa % cb).astype(np.int64))})

    def expand(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"b": np.empty(0, np.int64),
                              "c": np.empty(0, np.int64),
                              "x": np.empty(0, np.int64)})
        is_adj = g["c"].to_numpy() < 0
        adj = g.loc[is_adj, ["wa", "b"]]
        tri = g.loc[~is_adj, ["wa", "b", "c"]]
        if len(adj) == 0 or len(tri) == 0:
            return empty
        av = adj["wa"].to_numpy(np.int64)
        ax = adj["b"].to_numpy(np.int64)
        o = np.argsort(av, kind="stable")
        av, ax = av[o], ax[o]
        tw = tri["wa"].to_numpy(np.int64)
        lo_p = np.searchsorted(av, tw, "left")
        hi_p = np.searchsorted(av, tw, "right")
        cnt = hi_p - lo_p
        total = int(cnt.sum())
        if total == 0:
            return empty
        row = np.repeat(np.arange(len(tw)), cnt)
        gather = (np.arange(total)
                  - np.repeat(np.cumsum(cnt) - cnt, cnt)
                  + np.repeat(lo_p, cnt))
        return pd.DataFrame({
            "b": tri["b"].to_numpy(np.int64)[row],
            "c": tri["c"].to_numpy(np.int64)[row],
            "x": ax[gather]})

    cands = tris.map_batches(tag_tri, batch_format="pyarrow") \
        .union(oe.map_batches(tag_adj, batch_format="pyarrow")) \
        .groupby("ab").map_groups(expand, batch_format="pandas")

    def tag_edges_x(b: pa.Table) -> pa.Table:
        a = b["a"].to_numpy(zero_copy_only=False)
        bb = b["b"].to_numpy(zero_copy_only=False)
        return pa.table({"b": pa.array(a, pa.int64()),
                         "c": pa.array(np.full(len(a), -1, np.int64)),
                         "x": pa.array(bb, pa.int64()),
                         "xb": pa.array((bb % cb).astype(np.int64))})

    def tag_cands_x(b: pa.Table) -> pa.Table:
        x = b["x"].to_numpy(zero_copy_only=False)
        return pa.table({"b": b["b"], "c": b["c"], "x": b["x"],
                         "xb": pa.array((x % cb).astype(np.int64))})

    def conj(g: pd.DataFrame) -> pd.DataFrame:
        is_e = g["c"].to_numpy() < 0
        e = g.loc[is_e, ["b", "x"]].rename(columns={"b": "s", "x": "t"})
        cd = g.loc[~is_e, ["b", "c", "x"]].reset_index(drop=True)
        if len(e) == 0 or len(cd) == 0:
            return pd.DataFrame({"c4": [0]})
        cd2 = cd.reset_index()
        m1 = cd2.merge(e, left_on=["b", "x"],
                       right_on=["s", "t"])["index"].to_numpy()
        m2 = cd2.merge(e, left_on=["c", "x"],
                       right_on=["s", "t"])["index"].to_numpy()
        return pd.DataFrame(
            {"c4": [int(len(np.intersect1d(m1, m2)))]})

    closed = cands.map_batches(tag_cands_x, batch_format="pyarrow") \
        .union(oe.map_batches(tag_edges_x, batch_format="pyarrow")) \
        .groupby("xb").map_groups(conj, batch_format="pandas")
    total = closed.sum("c4")
    return int(total) if total is not None else 0


# ------------------------------------------------------------ 4-cycles

# one square-count task emits unordered neighbor pairs in vectorized
# slices of at most this many rows — a hub apex's C(deg, 2) pair block
# never sits in memory at once (the same memory bound VERDICT r2 #4
# asked of the wedge salt)
SQUARE_CHUNK_PAIRS = 4_000_000
# the driver kernel additionally gates on FULL wedge volume (sum of
# C(deg, 2)): squares need unoriented wedges, whose count is degree-
# quadratic rather than O(m^1.5)
DRIVER_SQUARE_WEDGES = 30_000_000


def _full_wedge_chunks(m: np.ndarray, x: np.ndarray,
                       chunk: int | None = None):
    """Yield composite (u<<32)|w keys (u < w, both neighbors of one
    apex) for ALL unordered neighbor pairs of every apex, in bounded
    slices.  `m`/`x` are symmetric adjacency rows lexsorted by (m, x);
    within an apex segment x is ascending, so pair keys come out
    canonical without a min/max pass."""
    starts = np.flatnonzero(np.concatenate([[True], m[1:] != m[:-1]]))
    lens = np.diff(np.concatenate([starts, [len(m)]]))
    seg = np.repeat(np.arange(len(starts)), lens)
    pos = np.arange(len(m)) - starts[seg]
    reps = lens[seg] - pos - 1
    total = int(reps.sum())
    if total == 0:
        return
    first = (np.cumsum(reps) - reps).astype(np.int64)
    step = int(chunk) if chunk else SQUARE_CHUNK_PAIRS
    off = 0
    while off < total:
        hi_ = min(off + step, total)
        ts = np.arange(off, hi_, dtype=np.int64)
        # slot of each global pair index: last tied `first` entry is
        # the one with reps > 0 (zero-rep slots alias its first index)
        i = np.searchsorted(first, ts, side="right") - 1
        j = i + 1 + (ts - first[i])
        yield (x[i].astype(np.int64) << 32) | x[j]
        off = hi_


def _square_sum(keys_iter) -> int:
    """sum of C(c, 2) over per-pair wedge counts (single-process:
    exact because all chunks see one merged count per pair)."""
    ks = [k for k in keys_iter]
    if not ks:
        return 0
    _, c = np.unique(np.concatenate(ks), return_counts=True)
    return int((c * (c - 1) // 2).sum())


def _square_count_local(pdf: pd.DataFrame) -> int:
    s = pdf["src"].to_numpy(np.int64)
    d = pdf["dst"].to_numpy(np.int64)
    keep = s != d
    lo = np.minimum(s[keep], d[keep])
    hi = np.maximum(s[keep], d[keep])
    if len(lo) == 0:
        return 0
    edges = np.unique((lo << 32) | hi)
    lo, hi = edges >> 32, edges & 0xFFFFFFFF
    m = np.concatenate([lo, hi])
    x = np.concatenate([hi, lo])
    order = np.lexsort((x, m))
    m, x = m[order], x[order]
    return _square_sum(_full_wedge_chunks(m, x)) // 2


def square_count(edges_ds, num_partitions: int = 16,
                 force_distributed: bool = False,
                 chunk_pairs: int | None = None) -> int:
    """Exact number of 4-cycles (squares, chords allowed) in the simple
    undirected graph: squares = (1/2) * sum over unordered vertex pairs
    of C(common_neighbors, 2) — each cycle is counted once by each of
    its two diagonals.

    Distributed plan: apex-bucketed FULL wedge emission (sliced, memory
    bounded) -> per-chunk (pair, count) partials -> one coarse
    pair-bucket shuffle summing counts per pair and folding
    C(c, 2) into a single int64 per bucket -> driver sum.  Never a
    per-pair-key hash aggregate and never a global pair table."""
    import ray.data as rd  # noqa: F401

    n_edges = edges_ds.count()
    if not force_distributed and n_edges <= DRIVER_TRI_CAP:
        pdf = edges_ds.to_pandas()
        sdeg = pd.concat([pdf["src"], pdf["dst"]]).value_counts()
        wedges = int((sdeg * (sdeg - 1) // 2).sum())
        if wedges <= DRIVER_SQUARE_WEDGES:
            return _square_count_local(pdf)

    from ..runtime import tune_context
    tune_context()
    canon = canon_dedup_ds(edges_ds, n_edges).materialize()
    n_canon = canon.count()
    ab = wedge_buckets_for(2 * n_canon)
    pb_n = n_buckets_for(2 * n_canon)

    def sym_rows(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        mm = np.concatenate([s, d])
        xx = np.concatenate([d, s])
        return pa.table({"m": pa.array(mm), "x": pa.array(xx),
                         "ab": pa.array((mm % ab).astype(np.int64))})

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        mm = g["m"].to_numpy(np.int64)
        xx = g["x"].to_numpy(np.int64)
        order = np.lexsort((xx, mm))
        mm, xx = mm[order], xx[order]
        us, ws, cs = [], [], []
        for keys in _full_wedge_chunks(mm, xx, chunk_pairs):
            k, c = np.unique(keys, return_counts=True)
            us.append((k >> 32).astype(np.int64))
            ws.append((k & 0xFFFFFFFF).astype(np.int64))
            cs.append(c.astype(np.int64))
        if not us:
            return pd.DataFrame({"u": np.empty(0, np.int64),
                                 "w": np.empty(0, np.int64),
                                 "cnt": np.empty(0, np.int64),
                                 "pb": np.empty(0, np.int64)})
        u = np.concatenate(us)
        w = np.concatenate(ws)
        return pd.DataFrame({"u": u, "w": w, "cnt": np.concatenate(cs),
                             "pb": _pair_bucket(u, w, pb_n)})

    def fold_bucket(g: pd.DataFrame) -> pd.DataFrame:
        _, _, c = _run_counts(g["u"].to_numpy(np.int64),
                              g["w"].to_numpy(np.int64),
                              g["cnt"].to_numpy(np.int64))
        return pd.DataFrame({"part": [int((c * (c - 1) // 2).sum())]})

    parts = (canon.map_batches(sym_rows, batch_format="pyarrow")
             .groupby("ab").map_groups(bucket_pairs,
                                       batch_format="pandas")
             .groupby("pb").map_groups(fold_bucket,
                                       batch_format="pandas")
             .to_pandas())
    return int(parts["part"].sum()) // 2 if len(parts) else 0


# --------------------------------------- sampled (approximate) triangles

# deterministic wedge sampling: keep a wedge iff its avalanche hash is
# below TRI_SAMPLE_KEEP (rate = KEEP / 2^64 = 1/4).  sha-free so the
# SQL twin reproduces every kept wedge bit-for-bit (HUGEINT % 2^64).
TRI_SAMPLE_KEEP = 1 << 62
_WH_A = 0x9E3779B97F4A7C15
_WH_B = 0xC2B2AE3D27D4EB4F
_WH_C = 0x165667B19E3779F9
_AV_M1 = 0xFF51AFD7ED558CCD
_AV_M2 = 0xC4CEB9FE1A85EC53


def _wedge_hash(apex: np.ndarray, x: np.ndarray,
                y: np.ndarray) -> np.ndarray:
    """splitmix64-style avalanche of the linear wedge key
    (apex*A + x*B + y*C) mod 2^64 — ids must be < 2^31 so the SQL twin
    can form each product in one HUGEINT multiply."""
    with np.errstate(over="ignore"):
        h = (apex.astype(np.uint64) * np.uint64(_WH_A)
             + x.astype(np.uint64) * np.uint64(_WH_B)
             + y.astype(np.uint64) * np.uint64(_WH_C))
        h ^= h >> np.uint64(33)
        h *= np.uint64(_AV_M1)
        h ^= h >> np.uint64(29)
        h *= np.uint64(_AV_M2)
        h ^= h >> np.uint64(32)
    return h


def _approx_result(n_wedges: int, n_sampled: int,
                   n_closed: int) -> pd.DataFrame:
    est = round(n_closed * float(n_wedges) / n_sampled, 6) \
        if n_sampled else 0.0
    return pd.DataFrame({
        "n_wedges": pd.Series([n_wedges], dtype=np.int64),
        "n_sampled": pd.Series([n_sampled], dtype=np.int64),
        "n_closed_sampled": pd.Series([n_closed], dtype=np.int64),
        "triangles_est": pd.Series([est], dtype=np.float64)})


def approx_triangle_count(edges_ds, num_partitions: int = 16,
                          force_distributed: bool = False):
    """Wedge-sampling triangle estimate (the documented 10^12-file
    scale path for the north-rule exact counter): enumerate degree-
    oriented wedges, keep the DETERMINISTIC 1/4 hash sample, probe
    closure only for kept wedges, and scale the closed count by the
    exact wedge total.  estimate = closed * n_wedges / n_sampled.

    The sample is a pure function of (apex, x, y), so the result is
    partition-count invariant and the SQL oracle reproduces it
    exactly; at scale the saving is the closure probe volume (the
    all-to-all stage), not the wedge scan."""
    n_edges = edges_ds.count()
    if n_edges <= DRIVER_TRI_CAP and not force_distributed:
        pdf = edges_ds.to_pandas()
        s = pdf["src"].to_numpy(np.int64)
        d = pdf["dst"].to_numpy(np.int64)
        keep = s != d
        lo = np.minimum(s[keep], d[keep])
        hi = np.maximum(s[keep], d[keep])
        if len(lo) == 0:
            return _approx_result(0, 0, 0)
        edges = np.unique((lo << 32) | hi)
        lo, hi = edges >> 32, edges & 0xFFFFFFFF
        deg = np.bincount(lo, minlength=int(hi.max()) + 1) \
            + np.bincount(hi, minlength=int(hi.max()) + 1)
        src_first = (deg[lo] < deg[hi]) | ((deg[lo] == deg[hi])
                                           & (lo < hi))
        a = np.where(src_first, lo, hi)
        b = np.where(src_first, hi, lo)
        order = np.lexsort((b, deg[b], a))
        a, b = a[order], b[order]
        starts = np.flatnonzero(np.concatenate([[True],
                                                a[1:] != a[:-1]]))
        lens = np.diff(np.concatenate([starts, [len(a)]]))
        seg = np.repeat(np.arange(len(starts)), lens)
        pos = np.arange(len(a)) - starts[seg]
        reps = lens[seg] - pos - 1
        total = int(reps.sum())
        if total == 0:
            return _approx_result(0, 0, 0)
        i_idx = np.repeat(np.arange(len(a)), reps)
        csum = np.cumsum(reps) - reps
        j_idx = i_idx + 1 + (np.arange(total) - csum[i_idx])
        apex, x, y = a[i_idx], b[i_idx], b[j_idx]
        kept = _wedge_hash(apex, x, y) < np.uint64(TRI_SAMPLE_KEEP)
        xk, yk = x[kept], y[kept]
        wkey = (np.minimum(xk, yk).astype(np.int64) << 32) \
            | np.maximum(xk, yk)
        p = np.minimum(np.searchsorted(edges, wkey),
                       max(len(edges) - 1, 0))
        closed = int((edges[p] == wkey).sum()) if len(wkey) else 0
        return _approx_result(total, int(kept.sum()), closed)

    import ray

    from ..runtime import tune_context
    tune_context()
    oe = oriented_edges(edges_ds, num_partitions).materialize()
    n_oe = oe.count()
    ab = wedge_buckets_for(n_oe)

    def wedges_sampled(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"wa": np.empty(0, np.int64),
                              "wb": np.empty(0, np.int64),
                              "tot": np.empty(0, np.int64),
                              "kept": np.empty(0, np.int64)})
        a = g["a"].to_numpy(np.int64)
        b = g["b"].to_numpy(np.int64)
        bd = g["b_deg"].to_numpy(np.int64)
        order = np.lexsort((b, bd, a))
        a, b = a[order], b[order]
        starts = np.flatnonzero(np.concatenate([[True],
                                                a[1:] != a[:-1]]))
        lens = np.diff(np.concatenate([starts, [len(a)]]))
        seg = np.repeat(np.arange(len(starts)), lens)
        pos = np.arange(len(a)) - starts[seg]
        reps = lens[seg] - pos - 1
        total = int(reps.sum())
        if total == 0:
            return empty
        i_idx = np.repeat(np.arange(len(a)), reps)
        csum = np.cumsum(reps) - reps
        j_idx = i_idx + 1 + (np.arange(total) - csum[i_idx])
        apex, x, y = a[i_idx], b[i_idx], b[j_idx]
        kept = _wedge_hash(apex, x, y) < np.uint64(TRI_SAMPLE_KEEP)
        out = pd.DataFrame({"wa": x[kept], "wb": y[kept]})
        # one counts row per bucket rides along (wa = -1 sentinel)
        out = pd.concat([out.assign(tot=0, kept=0),
                         pd.DataFrame({"wa": [-1], "wb": [-1],
                                       "tot": [total],
                                       "kept": [int(kept.sum())]})],
                        ignore_index=True)
        return out

    rows = oe.map_batches(
        lambda t: t.append_column("bkt", pa.array(
            (t["a"].to_numpy(zero_copy_only=False) % ab)
            .astype(np.int64))),
        batch_format="pyarrow") \
        .groupby("bkt").map_groups(wedges_sampled,
                                   batch_format="pandas") \
        .materialize()

    tot_tbl = rows.map_batches(
        lambda b: pa.table({
            "tot": pa.array([int(b["tot"].to_numpy(
                zero_copy_only=False).sum())], pa.int64()),
            "kept": pa.array([int(b["kept"].to_numpy(
                zero_copy_only=False).sum())], pa.int64())}),
        batch_format="pyarrow")
    n_wedges = int(tot_tbl.sum("tot") or 0)
    n_sampled = int(tot_tbl.sum("kept") or 0)

    use_bc = False
    if 0 < n_oe <= EDGE_KEY_BROADCAST_CAP:
        use_bc = max(int(oe.max("a")), int(oe.max("b"))) < 2 ** 31
    if use_bc:
        keys = np.sort(np.concatenate(
            [(t["a"].to_numpy(zero_copy_only=False).astype(np.uint64)
              << np.uint64(32))
             | t["b"].to_numpy(zero_copy_only=False).astype(np.uint64)
             for t in oe.iter_batches(batch_format="pyarrow",
                                      batch_size=None)]))
        kref = ray.put(keys)

        def closed_partial(b: pa.Table) -> pa.Table:
            k = ray.get(kref)
            x = b["wa"].to_numpy(zero_copy_only=False)
            y = b["wb"].to_numpy(zero_copy_only=False)
            m = x >= 0
            x, y = x[m], y[m]
            wk = (x.astype(np.uint64) << np.uint64(32)) \
                | y.astype(np.uint64)
            p = np.minimum(np.searchsorted(k, wk), len(k) - 1)
            return pa.table({"n": pa.array(
                [int((k[p] == wk).sum())], pa.int64())})

        n_closed = int(rows.map_batches(
            closed_partial, batch_format="pyarrow").sum("n") or 0)
    else:
        cbn = n_buckets_for(n_oe)

        def tag_e(t: pa.Table) -> pa.Table:
            a_ = t["a"].to_numpy(zero_copy_only=False)
            b_ = t["b"].to_numpy(zero_copy_only=False)
            return pa.table({"wa": pa.array(a_, pa.int64()),
                             "wb": pa.array(b_, pa.int64()),
                             "t": pa.array(np.zeros(len(a_), np.int8)),
                             "ub": pa.array(_pair_bucket(a_, b_, cbn))})

        def tag_w(t: pa.Table) -> pa.Table:
            x = t["wa"].to_numpy(zero_copy_only=False)
            y = t["wb"].to_numpy(zero_copy_only=False)
            m = x >= 0
            x, y = x[m].astype(np.int64), y[m].astype(np.int64)
            return pa.table({"wa": pa.array(x), "wb": pa.array(y),
                             "t": pa.array(np.ones(len(x), np.int8)),
                             "ub": pa.array(_pair_bucket(x, y, cbn))})

        def bucket_closed(g: pd.DataFrame) -> pd.DataFrame:
            is_e = g["t"].to_numpy(np.int8) == 0
            e = g.loc[is_e, ["wa", "wb"]]
            w = g.loc[~is_e, ["wa", "wb"]]
            if len(e) == 0 or len(w) == 0:
                return pd.DataFrame({"n": [0]})
            m = w.merge(e.drop_duplicates(), on=["wa", "wb"],
                        how="inner")
            return pd.DataFrame({"n": [int(len(m))]})

        n_closed = int(
            rows.map_batches(tag_w, batch_format="pyarrow")
            .union(oe.map_batches(tag_e, batch_format="pyarrow"))
            .groupby("ub").map_groups(bucket_closed,
                                      batch_format="pandas")
            .sum("n") or 0)
    return _approx_result(n_wedges, n_sampled, n_closed)
