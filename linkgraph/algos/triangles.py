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


def _vertex_degrees(canon_ds):
    def both(b: pa.Table) -> pa.Table:
        return pa.table({"v": pa.concat_arrays(
            [pc.cast(b["src"], pa.int64()).combine_chunks(),
             pc.cast(b["dst"], pa.int64()).combine_chunks()])})

    deg = canon_ds.map_batches(both, batch_format="pyarrow").groupby("v").count()
    return deg.map_batches(
        lambda b: pa.table({"v": b["v"],
                            "degree": pc.cast(b["count()"], pa.int64())}),
        batch_format="pyarrow")


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
    canon = (edges_ds.map_batches(_canonical, batch_format="pyarrow")
             .groupby(["src", "dst"]).count()
             .select_columns(["src", "dst"]).materialize())
    deg = _vertex_degrees(canon)
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


def triangle_count(edges_ds, num_partitions: int = 16) -> int:
    """Exact global triangle count of the undirected simple graph.

    Edge sets under DRIVER_TRI_CAP (and ids < 2^31) run the vectorized
    driver kernel; larger graphs run the distributed pipeline: closure
    check is a union + groupby(["src","dst"]) aggregate rather than a
    hash join: wedge rows carry wc=1, oriented-edge rows ec=1; a wedge
    (b,c) closes iff its group contains an edge row.  The groupby runs
    with partial (combiner) aggregation and, unlike Dataset.join, is
    robust to empty hash partitions on tiny inputs.
    """
    from ray.data.aggregate import Sum

    edges_ds = edges_ds.materialize()
    if edges_ds.count() <= DRIVER_TRI_CAP:
        pdf = edges_ds.to_pandas()
        if len(pdf) == 0:
            return 0
        mx = max(pdf["src"].max(), pdf["dst"].max())
        if mx < 2 ** 31:
            return _triangle_count_local(pdf)

    # materialized: `oe` feeds BOTH union branches below — a diamond over
    # un-materialized lineage deadlocks the streaming executor (observed
    # on Ray 2.49); O(|E|) blocks, object store spills if needed
    oe = oriented_edges(edges_ds, num_partitions).materialize()
    oe_tagged = oe.map_batches(
        lambda b: pa.table({"src": b["a"], "dst": b["b"],
                            "wc": pa.array(np.zeros(b.num_rows, np.int64)),
                            "ec": pa.array(np.ones(b.num_rows, np.int64))}),
        batch_format="pyarrow")
    nb = wedge_buckets_for(oe.count())
    salted = oe.map_batches(
        lambda b: b.append_column("wb", pa.array(
            (b["a"].to_numpy(zero_copy_only=False) % nb)
            .astype(np.int64))),
        batch_format="pyarrow")
    wedges = salted.groupby("wb").map_groups(_wedges_bucket,
                                             batch_format="pandas")
    w_tagged = wedges.map_batches(
        lambda b: pa.table({"src": b["src"], "dst": b["dst"],
                            "wc": pa.array(np.ones(b.num_rows, np.int64)),
                            "ec": pa.array(np.zeros(b.num_rows, np.int64))}),
        batch_format="pyarrow")
    grouped = w_tagged.union(oe_tagged).groupby(["src", "dst"]).aggregate(
        Sum("wc", alias_name="wc"), Sum("ec", alias_name="ec"))
    closed = grouped.map_batches(
        lambda b: pa.table({"tri": pc.multiply(
            b["wc"], pc.min_element_wise(b["ec"], pa.scalar(1, pa.int64())))}),
        batch_format="pyarrow")
    total = closed.sum("tri")
    return int(total) if total is not None else 0
