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
    join the oriented edge set; closed triangles explode into three
    canonical edges; groupby counts."""
    from ..dedup import _join_parts
    from .triangles import WEDGE_BUCKETS

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

    salted = oe.map_batches(
        lambda t: t.append_column("bkt", pa.array(
            (t["a"].to_numpy(zero_copy_only=False) % WEDGE_BUCKETS)
            .astype(np.int64))),
        batch_format="pyarrow")
    wedges = salted.groupby("bkt").map_groups(wedges_with_apex,
                                              batch_format="pandas")
    oe_keyed = oe.map_batches(
        lambda t: pa.table({"wa": t["a"], "wb": t["b"]}),
        batch_format="pyarrow")
    n_w = wedges.count()
    closed = wedges.join(oe_keyed, join_type="inner",
                         num_partitions=_join_parts(max(1, n_w)),
                         on=("wa", "wb"))

    def explode(t: pa.Table) -> pa.Table:
        ap = t["apex"].to_numpy(zero_copy_only=False)
        x = t["wa"].to_numpy(zero_copy_only=False)
        y = t["wb"].to_numpy(zero_copy_only=False)
        # wedge endpoints are (deg, id)-ordered — id-canonicalize ALL
        # three triangle edges for the support groupby
        u = np.concatenate([np.minimum(ap, x), np.minimum(ap, y),
                            np.minimum(x, y)])
        v = np.concatenate([np.maximum(ap, x), np.maximum(ap, y),
                            np.maximum(x, y)])
        return pa.table({"src": pa.array(u, pa.int64()),
                         "dst": pa.array(v, pa.int64())})

    return closed.map_batches(explode, batch_format="pyarrow") \
                 .groupby(["src", "dst"]).count()


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
    from .triangles import _canonical

    cur = (edges_ds.map_batches(_canonical, batch_format="pyarrow")
           .groupby(["src", "dst"]).count()
           .select_columns(["src", "dst"]).materialize())
    rounds = 0
    for _ in range(max_rounds):
        n_edges = cur.count()
        if n_edges == 0:
            break
        supp = _support_ds(cur, num_partitions)
        qual = supp.map_batches(
            lambda t: t.filter(
                pa.compute.greater_equal(t["count()"], k - 2))
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
