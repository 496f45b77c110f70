"""k-truss decomposition (coverage-widening; not in the reference
toolkit): the maximal subgraph in which every edge participates in at
least k-2 triangles — the standard cohesive-subgraph generalization of
triangle counting.

The k-truss is a UNIQUE fixpoint (independent of peel order), reached by
iterated support-filter rounds:

    repeat: support(e) = #triangles containing e (within current edges);
            drop edges with support < k-2
    until nothing drops.

Physical plans (same size-gate convention as triangles.py):

  * driver kernel under DRIVER_TRI_CAP edges: the vectorized
    wedge-closure support count (composite-key searchsorted + bincount)
    peels to the fixpoint in-process;
  * distributed path: per round, degree-oriented wedges carrying their
    apex join the oriented edge set (closure), each closed triangle
    explodes into its three canonical edges, a groupby counts support,
    and a broadcast-filter keeps qualifying edges.  O(m^1.5) work per
    round; rounds = peel depth (documented: extreme-scale trusses
    usually batch the peel — this engine bounds rounds and reports
    them).

Both paths are tested equal (tests/test_algos_extra.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .triangles import DRIVER_TRI_CAP, oriented_edges


def _support_local(keys: np.ndarray) -> np.ndarray:
    """Per-edge triangle support for sorted canonical composite keys
    (lo<<32 | hi)."""
    lo, hi = keys >> 32, keys & 0xFFFFFFFF
    n = int(hi.max(initial=0)) + 1 if len(hi) else 1
    deg = np.bincount(lo, minlength=n) + np.bincount(hi, minlength=n)
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
    supp = np.zeros(len(keys), dtype=np.int64)
    if total == 0:
        return supp
    i_idx = np.repeat(np.arange(len(a)), reps)
    csum = np.cumsum(reps) - reps
    j_idx = i_idx + 1 + (np.arange(total) - csum[i_idx])
    apex = a[i_idx]
    x, y = b[i_idx], b[j_idx]
    # wedge endpoints are (deg, id)-ordered; `keys` are ID-canonical —
    # canonicalize before the membership probe
    wkey = (np.minimum(x, y).astype(np.int64) << 32) | np.maximum(x, y)
    p = np.minimum(np.searchsorted(keys, wkey), len(keys) - 1)
    closed = keys[p] == wkey
    if not closed.any():
        return supp
    apex, x, y, wpos = apex[closed], x[closed], y[closed], p[closed]
    for u, v in ((apex, x), (apex, y)):
        k2 = (np.minimum(u, v).astype(np.int64) << 32) | np.maximum(u, v)
        q = np.minimum(np.searchsorted(keys, k2), len(keys) - 1)
        supp += np.bincount(q, minlength=len(keys))
    supp += np.bincount(wpos, minlength=len(keys))
    return supp


def _ktruss_local(pdf: pd.DataFrame, k: int) -> tuple[pd.DataFrame, int]:
    s = pdf["src"].to_numpy(np.int64)
    d = pdf["dst"].to_numpy(np.int64)
    keep = s != d
    lo = np.minimum(s[keep], d[keep])
    hi = np.maximum(s[keep], d[keep])
    keys = np.unique((lo << 32) | hi) if len(lo) else lo
    rounds = 0
    while len(keys):
        supp = _support_local(keys)
        m = supp >= k - 2
        if m.all():
            break
        keys = keys[m]
        rounds += 1
    return (pd.DataFrame({"src": (keys >> 32).astype(np.int64),
                          "dst": (keys & 0xFFFFFFFF).astype(np.int64)}),
            rounds)


def _support_ds(edges_ds, num_partitions: int):
    """Distributed per-edge support: oriented wedges carrying their apex
    probe the oriented edge set for closure (broadcast packed-key
    membership under triangles.EDGE_KEY_BROADCAST_CAP, coarse-bucket
    pandas merge above); closed triangles explode into three canonical
    edges whose support counts come from per-batch partials + one
    coarse-bucket merge — never a per-edge-key hash aggregate (25x
    slower on Ray 2.49, see triangles.TARGET_ROWS_PER_BUCKET)."""
    import ray

    from .triangles import (EDGE_KEY_BROADCAST_CAP, _pair_bucket,
                            _run_counts, n_buckets_for, wedge_buckets_for)

    oe = oriented_edges(edges_ds, num_partitions).materialize()

    def wedges_with_apex(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"apex": np.empty(0, np.int64),
                              "wa": np.empty(0, np.int64),
                              "wb": np.empty(0, np.int64)})
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
        return pd.DataFrame({"apex": a[i_idx], "wa": b[i_idx],
                             "wb": b[j_idx]})

    n_oe = oe.count()
    salted = oe.map_batches(
        lambda t: t.append_column("bkt", pa.array(
            (t["a"].to_numpy(zero_copy_only=False)
             % wedge_buckets_for(n_oe)).astype(np.int64))),
        batch_format="pyarrow")
    wedges = salted.groupby("bkt").map_groups(wedges_with_apex,
                                              batch_format="pandas")

    def _explode(ap, x, y) -> pa.Table:
        # wedge endpoints are (deg, id)-ordered — id-canonicalize ALL
        # three triangle edges for the support count
        u = np.concatenate([np.minimum(ap, x), np.minimum(ap, y),
                            np.minimum(x, y)])
        v = np.concatenate([np.maximum(ap, x), np.maximum(ap, y),
                            np.maximum(x, y)])
        return pa.table({"src": pa.array(u, pa.int64()),
                         "dst": pa.array(v, pa.int64())})

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

        def closed_explode(b: pa.Table) -> pa.Table:
            k = ray.get(kref)
            x = b["wa"].to_numpy(zero_copy_only=False)
            y = b["wb"].to_numpy(zero_copy_only=False)
            ap = b["apex"].to_numpy(zero_copy_only=False)
            wk = (x.astype(np.uint64) << np.uint64(32)) \
                | y.astype(np.uint64)
            p = np.minimum(np.searchsorted(k, wk), len(k) - 1)
            keep = k[p] == wk
            return _explode(ap[keep], x[keep], y[keep])

        tri_edges = wedges.map_batches(closed_explode,
                                       batch_format="pyarrow")
    else:
        cbn = n_buckets_for(n_oe)

        def tag_e(t: pa.Table) -> pa.Table:
            a = t["a"].to_numpy(zero_copy_only=False)
            b = t["b"].to_numpy(zero_copy_only=False)
            return pa.table({"apex": pa.array(np.zeros(len(a), np.int64)),
                             "wa": pa.array(a, pa.int64()),
                             "wb": pa.array(b, pa.int64()),
                             "t": pa.array(np.zeros(len(a), np.int8)),
                             "ub": pa.array(_pair_bucket(a, b, cbn))})

        def tag_w(t: pa.Table) -> pa.Table:
            x = t["wa"].to_numpy(zero_copy_only=False)
            y = t["wb"].to_numpy(zero_copy_only=False)
            return pa.table({"apex": t["apex"],
                             "wa": pa.array(x, pa.int64()),
                             "wb": pa.array(y, pa.int64()),
                             "t": pa.array(np.ones(len(x), np.int8)),
                             "ub": pa.array(_pair_bucket(x, y, cbn))})

        def bucket_closed(g: pd.DataFrame) -> pd.DataFrame:
            is_e = g["t"].to_numpy() == 0
            e = g.loc[is_e, ["wa", "wb"]]
            w = g.loc[~is_e, ["apex", "wa", "wb"]]
            if len(e) == 0 or len(w) == 0:
                return pd.DataFrame({"src": np.empty(0, np.int64),
                                     "dst": np.empty(0, np.int64)})
            m = w.merge(e, on=["wa", "wb"], how="inner")
            t = _explode(m["apex"].to_numpy(np.int64),
                         m["wa"].to_numpy(np.int64),
                         m["wb"].to_numpy(np.int64))
            return t.to_pandas()

        tri_edges = (wedges.map_batches(tag_w, batch_format="pyarrow")
                     .union(oe.map_batches(tag_e, batch_format="pyarrow"))
                     .groupby("ub").map_groups(bucket_closed,
                                               batch_format="pandas"))

    sbn = n_buckets_for(n_oe)

    def support_partial(b: pa.Table) -> pa.Table:
        us, ud, c = _run_counts(
            b["src"].to_numpy(zero_copy_only=False).astype(np.int64),
            b["dst"].to_numpy(zero_copy_only=False).astype(np.int64))
        return pa.table({"src": pa.array(us), "dst": pa.array(ud),
                         "cnt": pa.array(c),
                         "ub": pa.array(_pair_bucket(us, ud, sbn))})

    def support_merge(g: pd.DataFrame) -> pd.DataFrame:
        us, ud, c = _run_counts(g["src"].to_numpy(np.int64),
                                g["dst"].to_numpy(np.int64),
                                g["cnt"].to_numpy(np.int64))
        return pd.DataFrame({"src": us, "dst": ud, "support": c})

    return (tri_edges.map_batches(support_partial, batch_format="pyarrow")
            .groupby("ub").map_groups(support_merge,
                                      batch_format="pandas"))


def ktruss_edges(edges_ds, k: int = 3, num_partitions: int = 16,
                 max_rounds: int = 50,
                 force_distributed: bool = False):
    """Edges of the k-truss as a sorted DataFrame (src < dst) plus the
    peel-round count (for oracle unroll guards)."""
    from ..runtime import tune_context
    tune_context()

    if k < 3:
        raise ValueError("k-truss is defined for k >= 3")

    edges_ds = edges_ds.materialize()
    if edges_ds.count() <= DRIVER_TRI_CAP and not force_distributed:
        pdf = edges_ds.to_pandas()
        if len(pdf) == 0:
            return pd.DataFrame({"src": [], "dst": []}), 0
        if max(pdf["src"].max(), pdf["dst"].max()) < 2 ** 31:
            out, rounds = _ktruss_local(pdf, k)
            return out.sort_values(["src", "dst"]).reset_index(drop=True), \
                rounds

    # distributed peel: canonicalize once, then support-filter rounds
    from .triangles import canon_dedup_ds

    cur = canon_dedup_ds(edges_ds, edges_ds.count()).materialize()
    rounds = 0
    for _ in range(max_rounds):
        n_edges = cur.count()
        if n_edges == 0:
            break
        supp = _support_ds(cur, num_partitions)
        qual = supp.map_batches(
            lambda t: t.filter(
                pa.compute.greater_equal(t["support"], k - 2))
            .select(["src", "dst"]),
            batch_format="pyarrow").materialize()
        n_next = qual.count()
        if n_next == n_edges:
            break
        cur = qual
        rounds += 1
        if n_next == 0:
            break
    out = cur.to_pandas()
    if len(out) == 0:
        return pd.DataFrame({"src": [], "dst": []}), rounds
    return out.sort_values(["src", "dst"]).reset_index(drop=True), rounds
