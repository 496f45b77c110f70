"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — the query matrix is ray.put ONCE
(broadcast), every batch computes a numpy matmul against it and emits its
per-batch top-k partials; a final small groupby(query) reduces partials
to the global top-k.  No stage materializes the corpus.

Scale path: IVF — k-means-style coarse centroids (sampled, deterministic
seed), vectors bucketed by nearest centroid, queries probe `n_probe`
buckets.  Approximate recall, documented.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _topk_frame(qids, vids, sims, k) -> pd.DataFrame:
    df = pd.DataFrame({"query_id": qids, "neighbor_id": vids, "cosine": sims})
    # deterministic: similarity desc, then neighbor id asc
    df = df.sort_values(["query_id", "cosine", "neighbor_id"],
                        ascending=[True, False, True], kind="mergesort")
    return df.groupby("query_id", sort=True).head(k).reset_index(drop=True)


def brute_force_topk(ds, queries: np.ndarray, query_ids: np.ndarray,
                     k: int = 5, id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     exclude_self: bool = True) -> pd.DataFrame:
    """Global cosine top-k per query row. Returns
    (query_id, neighbor_id, rnk, cosine), rnk 1-based, ties broken by
    neighbor id asc (deterministic)."""
    import ray

    qm = _normalize(np.asarray(queries, dtype=np.float64))
    qref = ray.put((qm, np.asarray(query_ids, dtype=np.int64)))

    def partial(batch: pa.Table) -> pa.Table:
        q, qids = ray.get(qref)
        vids = batch[id_col].to_numpy(zero_copy_only=False)
        m = _normalize(np.array(batch[vec_col].to_pylist(), dtype=np.float64))
        sims = q @ m.T  # (nq, nb)
        nq, nb = sims.shape
        kk = min(k + (1 if exclude_self else 0), nb)
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        rows = np.repeat(np.arange(nq), kk)
        cols = part.reshape(-1)
        return pa.table({
            "query_id": pa.array(qids[rows], pa.int64()),
            "neighbor_id": pa.array(vids[cols].astype(np.int64)),
            "cosine": pa.array(sims[rows, cols], pa.float64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if exclude_self:
        parts = parts[parts["query_id"] != parts["neighbor_id"]]
    top = _topk_frame(parts["query_id"].to_numpy(),
                      parts["neighbor_id"].to_numpy(),
                      parts["cosine"].to_numpy(), k)
    top["rnk"] = top.groupby("query_id").cumcount() + 1
    return top[["query_id", "neighbor_id", "rnk", "cosine"]]


def queries_from_ids(ds, ids: list[int], id_col: str = "vec_id",
                     vec_col: str = "embedding"):
    """Fetch query vectors for given ids (small driver-side result)."""
    import pyarrow.compute as pc

    wanted = set(ids)
    rows = ds.map_batches(
        lambda b: b.filter(pc.is_in(b[id_col],
                                    value_set=pa.array(list(wanted)))),
        batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: r[id_col])
    q = np.array([r[vec_col] for r in rows], dtype=np.float64)
    qi = np.array([r[id_col] for r in rows], dtype=np.int64)
    return q, qi


def ivf_topk(ds, queries: np.ndarray, query_ids: np.ndarray, k: int = 5,
             n_centroids: int = 16, n_probe: int = 4, sample_n: int = 2048,
             seed: int = 42, id_col: str = "vec_id",
             vec_col: str = "embedding", exclude_self: bool = True
             ) -> pd.DataFrame:
    """IVF-style ANN: centroids from a deterministic sample, vectors
    assigned to nearest centroid (one groupby key), queries scan only the
    n_probe nearest centroid buckets.  Approximate (recall < 1)."""
    import ray

    sample = ds.limit(sample_n).take_all()
    sm = _normalize(np.array([r[vec_col] for r in sample], dtype=np.float64))
    rng = np.random.default_rng(seed)
    cent = sm[rng.choice(len(sm), min(n_centroids, len(sm)), replace=False)]
    for _ in range(5):  # few Lloyd rounds on the sample
        assign = (sm @ cent.T).argmax(axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                cent[c] = _normalize(sm[m].mean(axis=0, keepdims=True))[0]
    cref = ray.put(cent)

    qm = _normalize(np.asarray(queries, dtype=np.float64))
    probe = np.argsort(-(qm @ cent.T), axis=1)[:, :n_probe]
    probe_sets = [set(row) for row in probe]
    qref = ray.put((qm, np.asarray(query_ids, dtype=np.int64), probe_sets))

    def partial(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        q, qids, probes = ray.get(qref)
        vids = batch[id_col].to_numpy(zero_copy_only=False)
        m = _normalize(np.array(batch[vec_col].to_pylist(), dtype=np.float64))
        assign = (m @ c.T).argmax(axis=1)
        out_q, out_v, out_s = [], [], []
        for qi in range(len(q)):
            mask = np.isin(assign, list(probes[qi]))
            if not mask.any():
                continue
            sims = q[qi] @ m[mask].T
            sel = np.argsort(-sims)[:k + 1]
            out_q.append(np.full(len(sel), qids[qi], np.int64))
            out_v.append(vids[mask][sel].astype(np.int64))
            out_s.append(sims[sel])
        if not out_q:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        return pa.table({"query_id": pa.array(np.concatenate(out_q)),
                         "neighbor_id": pa.array(np.concatenate(out_v)),
                         "cosine": pa.array(np.concatenate(out_s))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if exclude_self:
        parts = parts[parts["query_id"] != parts["neighbor_id"]]
    top = _topk_frame(parts["query_id"].to_numpy(),
                      parts["neighbor_id"].to_numpy(),
                      parts["cosine"].to_numpy(), k)
    top["rnk"] = top.groupby("query_id").cumcount() + 1
    return top[["query_id", "neighbor_id", "rnk", "cosine"]]
