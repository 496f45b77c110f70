"""One synchronous Louvain local-move round (community detection).

The classic Louvain first-phase move rule evaluated once, simultaneously
for every vertex, from singleton communities: vertex v joins the
neighbor community (= the neighbor u itself, since all communities are
singletons) with the largest modularity gain

    dQ(v -> {u}) = w(v,u)/m - k_v * k_u / (2 m^2)

and stays put when no gain is positive.  On the deduped simple graph
w(v,u) = 1, so comparing gains reduces to comparing the ALL-INTEGER
score  s(u) = 2*m - k_v * k_u  (dQ > 0  <=>  s > 0, and the argmax over
u is the same) — no float association anywhere, which is what makes the
DuckDB oracle exact (pipelines ORACLE_SQL['doc_louvain']).

Ties break to the smallest neighbor id, so the synchronous round is
deterministic and partition-count invariant.  This is the per-edge
(dataset) formulation — one coarse-bucket shuffle keyed on the moving
vertex, a vectorized argmax kernel per bucket — the same shape as
clustering_coefficients; the reference has no community toolkit, so the
nearest-ancestor convention is labelprop's (cc.cpp:45-79 skeleton with
an argmax instead of a min combine).

Scale: |sym edges| rows shuffled once on v % nb; per-bucket work is
O(rows log rows) lexsort.  No whole-graph state anywhere.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .triangles import _vertex_degrees, n_buckets_for

__all__ = ["louvain_local_move"]


def louvain_local_move(edges_ds, n_edges: int | None = None):
    """One synchronous local-move round from singletons.

    edges_ds: canonical simple edges (src < dst, deduped).
    Returns a Dataset (v, comm, gain_num) for every non-isolated vertex:
    `comm` = chosen community representative (a neighbor id, or v itself
    when no move has positive gain), `gain_num` = the integer gain
    numerator 2*m - k_v*k_max_neighbor of the best candidate.
    """
    from ..joins import attach_by_key
    from ..runtime import tune_context

    tune_context()
    edges_ds = edges_ds.materialize()
    m = int(n_edges if n_edges is not None else edges_ds.count())
    if m == 0:
        import ray.data as rd
        return rd.from_pandas(pd.DataFrame({
            "v": pd.Series([], dtype="int64"),
            "comm": pd.Series([], dtype="int64"),
            "gain_num": pd.Series([], dtype="int64")}))

    deg = _vertex_degrees(edges_ds, m)

    def sym(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"src": pa.array(np.concatenate([s, d])),
                         "dst": pa.array(np.concatenate([d, s]))})

    cand = attach_by_key(edges_ds.map_batches(sym, batch_format="pyarrow"),
                         deg, ["src", "dst"], key="v", value="degree")
    nb = n_buckets_for(2 * m)

    def score(b: pa.Table) -> pa.Table:
        v = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        u = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        kv = b["degree_src"].to_numpy(zero_copy_only=False).astype(np.int64)
        ku = b["degree_dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"v": pa.array(v), "u": pa.array(u),
                         "s": pa.array(2 * m - kv * ku),
                         "vb": pa.array((v % nb).astype(np.int64))})

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        v = g["v"].to_numpy(np.int64)
        u = g["u"].to_numpy(np.int64)
        s = g["s"].to_numpy(np.int64)
        # within v: score desc, then u asc (deterministic tie-break)
        o = np.lexsort((u, -s, v))
        v, u, s = v[o], u[o], s[o]
        first = np.ones(len(v), dtype=bool)
        first[1:] = v[1:] != v[:-1]
        vv, uu, ss = v[first], u[first], s[first]
        return pd.DataFrame({"v": vv,
                             "comm": np.where(ss > 0, uu, vv),
                             "gain_num": ss})

    return (cand.map_batches(score, batch_format="pyarrow")
            .groupby("vb").map_groups(pick, batch_format="pandas"))
