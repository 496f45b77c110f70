"""SimRank structural similarity (Jeh & Widom, "SimRank: A Measure of
Structural-Context Similarity", KDD 2002): s(a,a) = 1 and

    s(a,b) = C / (|I(a)| |I(b)|) * sum_{i in I(a), j in I(b)} s(i,j)

iterated ITERS rounds from the identity, over the canonical directed
doc edges (I(v) = in-neighbors).  Coverage-widening; no reference
implementation.

Scale notes (SimRank is honestly quadratic — stated, not hidden):
- The pair state grows toward O(sum_v |I(v)|^2) nonzeros; production
  SimRank prunes entries below an epsilon between rounds (Lizorkin et
  al., VLDB 2008 give the accuracy bound).  `prune_eps` exposes that
  knob; the oracle-checked query runs exact (prune_eps=None).
- Each round is ONE coarse (a, b)-pair-bucket shuffle; the expansion
  uses a broadcast out-adjacency CSR and in-degree vector, size-gated
  by SIMRANK_EDGE_CAP / BROADCAST_DEG_CAP with a loud error above (at
  the scale those caps bind, the pair state is already the binding
  cost and demands prune_eps + bucketed degree joins instead).
- The identity diagonal is never materialized per-vertex: its round
  contribution is exactly the source-wedge set of the edge list,
  emitted once by a bucketed wedge kernel (the triangles pattern) and
  reused every round.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .triangles import BROADCAST_DEG_CAP, n_buckets_for

SIMRANK_C = 0.8
SIMRANK_ITERS = 3
SIMRANK_TOP_K = 20
SIMRANK_EDGE_CAP = 50_000_000  # broadcast CSR gate (see module notes)
_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _simrank_state(edges, n_vertices: int, iters: int, c: float,
                   prune_eps: float | None):
    """The shared iteration core: returns the final non-diagonal state
    Dataset (i, j, s — both orientations) or None for an empty graph.
    `edges` is a (src, dst) Dataset of DISTINCT directed edges."""
    import ray

    epd = edges.to_pandas()  # gated broadcast (SIMRANK_EDGE_CAP)
    n_edges = len(epd)
    if n_edges > SIMRANK_EDGE_CAP or n_vertices > BROADCAST_DEG_CAP:
        raise ValueError(
            f"simrank_topk: {n_edges} edges / {n_vertices} vertices "
            f"exceed the broadcast gates — at this scale exact SimRank's "
            f"pair state is the binding cost; run with prune_eps and a "
            f"bucketed degree join (see module docstring)")
    if n_edges == 0:
        return None
    src = epd["src"].to_numpy(np.int64)
    dst = epd["dst"].to_numpy(np.int64)
    order = np.lexsort((dst, src))
    src, dst = src[order], dst[order]
    # out-adjacency CSR + in-degree vector, ray.put ONCE
    cnt = np.bincount(src, minlength=n_vertices).astype(np.int64)
    offs = np.concatenate([[0], np.cumsum(cnt)])
    din = np.bincount(dst, minlength=n_vertices).astype(np.int64)
    csr_ref = ray.put((cnt, offs, dst, din))
    nb = n_buckets_for(4 * n_edges)

    def pair_bucket(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        with np.errstate(over="ignore"):
            return ((a.astype(np.uint64) * _GOLD + b.astype(np.uint64))
                    % np.uint64(nb)).astype(np.int64)

    # ---- diagonal contribution: ordered source wedges, computed ONCE.
    # Each identity entry s(i, i) = 1 contributes 1 to every ordered
    # pair (a, b), a != b, of i's out-neighbors.
    def wedge_part(t: pa.Table) -> pa.Table:
        s = t["src"].to_numpy(zero_copy_only=False)
        d = t["dst"].to_numpy(zero_copy_only=False)
        o = np.lexsort((d, s))
        s, d = s[o], d[o]
        starts = np.flatnonzero(np.concatenate([[True], s[1:] != s[:-1]]))
        lens = np.diff(np.concatenate([starts, [len(s)]]))
        rep = np.repeat(lens, lens)              # per-slot pair count
        tot = int(rep.sum())
        rr = np.repeat(np.arange(len(s)), rep)   # slot index (i, a)
        base = np.repeat(starts, lens)           # segment start per slot
        pos = np.arange(tot) - np.repeat(np.cumsum(rep) - rep, rep)
        a = d[rr]
        b = d[base[rr] + pos]
        keep = a != b
        a, b = a[keep], b[keep]
        return pa.table({"a": pa.array(a), "b": pa.array(b),
                         "s": pa.array(np.ones(len(a), np.float64)),
                         "pb": pa.array(pair_bucket(a, b))})

    # NOTE: in-batch wedge emission is exact only because the edge list
    # is grouped by src first — route edges through a src-bucket groupby
    # so every source's out-list is contiguous in one kernel call.
    def src_tag(t: pa.Table) -> pa.Table:
        sv = t["src"].to_numpy(zero_copy_only=False)
        return t.append_column("sb", pa.array(sv % nb))

    def wedge_kern(g: pd.DataFrame) -> pd.DataFrame:
        t = wedge_part(pa.table({"src": pa.array(g["src"].to_numpy(
            np.int64)), "dst": pa.array(g["dst"].to_numpy(np.int64))}))
        return t.to_pandas()

    diag_contrib = edges.map_batches(src_tag, batch_format="pyarrow") \
        .groupby("sb").map_groups(wedge_kern, batch_format="pandas") \
        .map_batches(lambda t: t, batch_format="pyarrow") \
        .materialize()  # arrow blocks (union with expand) + reuse/round

    # ---- per-round expansion of the non-diagonal state
    def expand(t: pa.Table) -> pa.Table:
        cnt_, offs_, dst_, _ = ray.get(csr_ref)
        i = t["i"].to_numpy(zero_copy_only=False)
        j = t["j"].to_numpy(zero_copy_only=False)
        sv = t["s"].to_numpy(zero_copy_only=False)
        rep = cnt_[i] * cnt_[j]
        keep = rep > 0
        i, j, sv, rep = i[keep], j[keep], sv[keep], rep[keep]
        tot = int(rep.sum())
        if tot == 0:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "s": pa.array([], pa.float64()),
                             "pb": pa.array([], pa.int64())})
        rr = np.repeat(np.arange(len(i)), rep)
        pos = np.arange(tot) - np.repeat(np.cumsum(rep) - rep, rep)
        dj = cnt_[j][rr]
        a = dst_[offs_[i[rr]] + pos // dj]
        b = dst_[offs_[j[rr]] + pos % dj]
        so = sv[rr]
        keep2 = a != b
        a, b, so = a[keep2], b[keep2], so[keep2]
        return pa.table({"a": pa.array(a), "b": pa.array(b),
                         "s": pa.array(so),
                         "pb": pa.array(pair_bucket(a, b))})

    def sum_kern(g: pd.DataFrame) -> pd.DataFrame:
        _, _, _, din_ = ray.get(csr_ref)
        f = g.groupby(["a", "b"], sort=False)["s"].sum().reset_index()
        a = f["a"].to_numpy(np.int64)
        b = f["b"].to_numpy(np.int64)
        s = c * f["s"].to_numpy(np.float64) / (din_[a] * din_[b])
        out = pd.DataFrame({"i": a, "j": b, "s": s})
        if prune_eps is not None:
            out = out[out["s"] >= prune_eps]
        return out

    state = None  # non-diagonal entries (i, j, s), both orientations
    for _ in range(iters):
        contribs = diag_contrib if state is None else \
            state.map_batches(expand, batch_format="pyarrow") \
                 .union(diag_contrib)
        state = contribs.groupby("pb") \
            .map_groups(sum_kern, batch_format="pandas").materialize()
    return state


def simrank_topk(edges, n_vertices: int, iters: int = SIMRANK_ITERS,
                 c: float = SIMRANK_C, k_top: int = SIMRANK_TOP_K,
                 prune_eps: float | None = None) -> pd.DataFrame:
    """Top-k SimRank pairs (a < b) after `iters` rounds: (a, b, s)
    ordered by (round(s, 6) DESC, a, b) — per-block partial top-k,
    driver merge over O(blocks * k) rows."""
    state = _simrank_state(edges, n_vertices, iters, c, prune_eps)
    if state is None:
        return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                             "b": pd.Series([], dtype="int64"),
                             "s": pd.Series([], dtype="float64")})

    def topk_part(t: pa.Table) -> pa.Table:
        f = t.to_pandas()
        f = f[f["i"] < f["j"]].copy()
        f["s"] = f["s"].round(6)
        f = f.sort_values(["s", "i", "j"],
                          ascending=[False, True, True],
                          kind="mergesort").head(k_top)
        return pa.table({"i": pa.array(f["i"].to_numpy(np.int64)),
                         "j": pa.array(f["j"].to_numpy(np.int64)),
                         "s": pa.array(f["s"].to_numpy(np.float64))})

    parts = state.map_batches(topk_part, batch_format="pyarrow") \
                 .to_pandas()
    if len(parts) == 0:
        return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                             "b": pd.Series([], dtype="int64"),
                             "s": pd.Series([], dtype="float64")})
    out = parts.sort_values(["s", "i", "j"],
                            ascending=[False, True, True],
                            kind="mergesort").head(k_top) \
        .rename(columns={"i": "a", "j": "b"}).reset_index(drop=True)
    return out.astype({"a": np.int64, "b": np.int64, "s": np.float64})


def simrank_score_hist(edges, n_vertices: int, iters: int = SIMRANK_ITERS,
                       c: float = SIMRANK_C,
                       prune_eps: float | None = None) -> pd.DataFrame:
    """Rounded-score histogram over all a < b SimRank pairs — (s,
    n_pairs) ordered s DESC.  Verifies EVERY nonzero pair (a stronger
    correctness surface than a top-k, with no tie-boundary float risk);
    the score domain is bounded (products of C and small reciprocals),
    so map-side value-count partials fold on the driver in O(bins)."""
    state = _simrank_state(edges, n_vertices, iters, c, prune_eps)
    if state is None:
        return pd.DataFrame({"s": pd.Series([], dtype="float64"),
                             "n_pairs": pd.Series([], dtype="int64")})

    def hist_part(t: pa.Table) -> pa.Table:
        f = t.to_pandas()
        f = f[f["i"] < f["j"]]
        u, cnts = np.unique(f["s"].round(6).to_numpy(np.float64),
                            return_counts=True)
        return pa.table({"s": pa.array(u),
                         "n": pa.array(cnts.astype(np.int64))})

    parts = state.map_batches(hist_part, batch_format="pyarrow") \
                 .to_pandas()
    if len(parts) == 0:
        return pd.DataFrame({"s": pd.Series([], dtype="float64"),
                             "n_pairs": pd.Series([], dtype="int64")})
    agg = parts.groupby("s", sort=True)["n"].sum().reset_index() \
               .sort_values("s", ascending=False, kind="mergesort")
    return pd.DataFrame({"s": agg["s"].to_numpy(np.float64),
                         "n_pairs": agg["n"].to_numpy(np.int64)})
