"""Deterministic multi-hop neighbor sampling (GraphSAGE-style
mini-batch subgraph extraction; training-data op, no reference analog —
design per the task brief).

Per hop h, every frontier vertex keeps its fanouts[h] incident edges
with the SMALLEST murmur-avalanched 64-bit priority of the packed
(src << 32 | dst) pair — the avalanche is a bijection on uint64, so
priorities are collision-free and no tie-break is needed.  The SQL twin
reproduces the identical finalizer in HUGEINT (same constants as the
SimHash oracle, pipelines._mulmod64_sql).

Scale shape: frontiers are mini-batch-sized by definition (|seeds| *
prod(fanouts) edges at most), so each hop broadcasts the sorted
frontier once (ray.put) and selects with MAP-SIDE PARTIAL top-k —
per-batch k-smallest per source, then one small driver merge.  Zero
shuffles; the edge set streams once per hop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _pair_priority(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Murmur3 finalizer over (src << 32) | dst — bijective on uint64."""
    with np.errstate(over="ignore"):
        z = (src.astype(np.uint64) << np.uint64(32)) \
            | dst.astype(np.uint64)
        z ^= z >> np.uint64(33)
        z *= np.uint64(0xFF51AFD7ED558CCD)
        z ^= z >> np.uint64(29)
        z *= np.uint64(0xC4CEB9FE1A85EC53)
        z ^= z >> np.uint64(32)
    return z


def _topk_per_src(src: np.ndarray, dst: np.ndarray, pri: np.ndarray,
                  k: int):
    """k smallest-priority rows per source (segment arithmetic)."""
    order = np.lexsort((pri, src))
    s, d, p = src[order], dst[order], pri[order]
    starts = np.flatnonzero(np.concatenate([[True], s[1:] != s[:-1]]))
    lens = np.diff(np.concatenate([starts, [len(s)]]))
    seg = np.repeat(np.arange(len(starts)), lens)
    pos = np.arange(len(s)) - starts[seg]
    keep = pos < k
    return s[keep], d[keep], p[keep]


def sample_neighbors(edges_ds, seeds, fanouts=(3, 2)):
    """(hop, src, dst) of the sampled subgraph: hop 1 edges leave the
    seed set, hop h edges leave the distinct destinations of hop h-1.
    `edges_ds` rows are DIRECTED (symmetrize first for undirected
    semantics).  Deterministic for a given edge set and seed list."""
    import ray

    seeds = np.unique(np.asarray(list(seeds), dtype=np.int64))
    edges_ds = edges_ds.materialize()
    out = []
    frontier = seeds
    for hop, k in enumerate(fanouts, start=1):
        if len(frontier) == 0:
            break
        fref = ray.put(np.sort(frontier))

        def partial(b: pa.Table, k=k) -> pa.Table:
            f = ray.get(fref)
            s = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            d = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
            pos = np.minimum(np.searchsorted(f, s), len(f) - 1)
            m = f[pos] == s
            s, d = s[m], d[m]
            p = _pair_priority(s, d)
            s, d, p = _topk_per_src(s, d, p, k)
            return pa.table({"src": pa.array(s, pa.int64()),
                             "dst": pa.array(d, pa.int64()),
                             "p": pa.array(p, pa.uint64())})

        parts = edges_ds.map_batches(partial,
                                     batch_format="pyarrow").to_pandas()
        if len(parts) == 0:
            break
        s, d, p = _topk_per_src(parts["src"].to_numpy(np.int64),
                                parts["dst"].to_numpy(np.int64),
                                parts["p"].to_numpy(np.uint64), k)
        out.append(pd.DataFrame({"hop": np.full(len(s), hop, np.int64),
                                 "src": s, "dst": d}))
        frontier = np.unique(d)
    if not out:
        return pd.DataFrame({"hop": pd.Series([], dtype=np.int64),
                             "src": pd.Series([], dtype=np.int64),
                             "dst": pd.Series([], dtype=np.int64)})
    return pd.concat(out, ignore_index=True)


# neighbor-feature gathering: feature tables whose (rows * dim) fits
# this many float64s broadcast once; larger tables take the bucketed
# join twin — the same gate rule as dedup.EMBED_BROADCAST_ELEMS
FEATURE_BROADCAST_ELEMS = 50_000_000


def mean_neighbor_features(edges_ds, feats_ds, id_col: str = "vec_id",
                           feat_col: str = "embedding"):
    """GraphSAGE mean aggregator: for every vertex v with >= 1 neighbor
    in the DIRECTED edge list, the component-wise mean of its
    neighbors' feature vectors — long form (v, i, mean_x), i 1-based.

    Below FEATURE_BROADCAST_ELEMS the feature matrix is ray.put once
    (dense by id) and every edge batch emits per-source partial sums;
    above it, edges join features bucket-wise on dst first.  Both paths
    finish with ONE coarse per-vertex (sum, count) merge; float sums
    associate per plan (round-6 on output, like the other float ops).
    """
    import ray

    from .algos.triangles import n_buckets_for

    edges_ds = edges_ds.materialize()
    n_edges = edges_ds.count()
    if n_edges == 0:
        return pd.DataFrame({"v": pd.Series([], dtype=np.int64),
                             "i": pd.Series([], dtype=np.int64),
                             "mean_x": pd.Series([], dtype=np.float64)})
    feats_ds = feats_ds.materialize()
    n_feat = feats_ds.count()
    if n_feat == 0:
        return pd.DataFrame({"v": pd.Series([], dtype=np.int64),
                             "i": pd.Series([], dtype=np.int64),
                             "mean_x": pd.Series([], dtype=np.float64)})
    first = feats_ds.take(1)[0]
    dim = len(first[feat_col])
    nb = n_buckets_for(n_edges)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        v = g["v"].to_numpy(np.int64)
        cnt = g["cnt"].to_numpy(np.int64)
        mat = np.stack(g["s"].to_numpy())  # (rows, dim) float64
        u, inv = np.unique(v, return_inverse=True)
        sums = np.zeros((len(u), dim), np.float64)
        np.add.at(sums, inv, mat)
        c = np.bincount(inv, weights=cnt.astype(np.float64),
                        minlength=len(u))
        mean = sums / c[:, None]
        return pd.DataFrame({
            "v": np.repeat(u, dim),
            "i": np.tile(np.arange(1, dim + 1, dtype=np.int64), len(u)),
            "mean_x": np.round(mean.ravel(), 6)})

    if n_feat * dim <= FEATURE_BROADCAST_ELEMS:
        ids, mats = [], []
        for t in feats_ds.iter_batches(batch_format="pyarrow",
                                       batch_size=None):
            ids.append(t[id_col].to_numpy(zero_copy_only=False)
                       .astype(np.int64))
            mats.append(np.stack(
                t[feat_col].to_pandas().to_numpy()).astype(np.float64))
        ids = np.concatenate(ids)
        mat = np.concatenate(mats, axis=0)
        dense = np.zeros((int(ids.max()) + 1, dim), np.float64)
        dense[ids] = mat
        has = np.zeros(int(ids.max()) + 1, bool)
        has[ids] = True
        fref = ray.put((dense, has))

        def partial(b: pa.Table) -> pa.Table:
            dn, hs = ray.get(fref)
            s = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            d = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
            m = (d < len(hs)) & hs[np.minimum(d, len(hs) - 1)]
            s, d = s[m], d[m]
            u, inv = np.unique(s, return_inverse=True)
            sums = np.zeros((len(u), dn.shape[1]), np.float64)
            np.add.at(sums, inv, dn[d])
            return pa.table({
                "v": pa.array(u, pa.int64()),
                "cnt": pa.array(np.bincount(inv, minlength=len(u))
                                .astype(np.int64)),
                "s": pa.array(list(sums)),
                "vb": pa.array((u % nb).astype(np.int64))})

        partials = edges_ds.map_batches(partial, batch_format="pyarrow")
        return partials.groupby("vb").map_groups(merge,
                                                 batch_format="pandas")

    # bucketed twin: edges + features union on a dst-keyed coarse bucket,
    # per-bucket gather -> per-source partial sums -> same final merge
    def tag_edge(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"src": pa.array(s), "dst": pa.array(d),
                         "f": pa.array([[]] * len(s),
                                       pa.list_(pa.float64())),
                         "jb": pa.array((d % nb).astype(np.int64))})

    def tag_feat(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        f = b[feat_col].to_pandas().map(
            lambda x: np.asarray(x, np.float64))
        return pa.table({"src": pa.array(np.full(len(ids), -1, np.int64)),
                         "dst": pa.array(ids),
                         "f": pa.array(list(f), pa.list_(pa.float64())),
                         "jb": pa.array((ids % nb).astype(np.int64))})

    def bucket_gather(g: pd.DataFrame) -> pd.DataFrame:
        is_f = g["src"].to_numpy() < 0
        fid = g.loc[is_f, "dst"].to_numpy(np.int64)
        if len(fid) == 0 or is_f.all():
            return pd.DataFrame({"v": np.empty(0, np.int64),
                                 "cnt": np.empty(0, np.int64),
                                 "s": pd.Series([], dtype=object),
                                 "vb": np.empty(0, np.int64)})
        fmat = np.stack(g.loc[is_f, "f"].to_numpy())
        order = np.argsort(fid)
        fid, fmat = fid[order], fmat[order]
        s = g.loc[~is_f, "src"].to_numpy(np.int64)
        d = g.loc[~is_f, "dst"].to_numpy(np.int64)
        p = np.minimum(np.searchsorted(fid, d), len(fid) - 1)
        m = fid[p] == d
        s, p = s[m], p[m]
        u, inv = np.unique(s, return_inverse=True)
        sums = np.zeros((len(u), fmat.shape[1]), np.float64)
        np.add.at(sums, inv, fmat[p])
        return pd.DataFrame({
            "v": u, "cnt": np.bincount(inv, minlength=len(u))
            .astype(np.int64),
            "s": list(sums), "vb": (u % nb).astype(np.int64)})

    both = edges_ds.map_batches(tag_edge, batch_format="pyarrow").union(
        feats_ds.map_batches(tag_feat, batch_format="pyarrow"))
    partials = both.groupby("jb").map_groups(
        bucket_gather, batch_format="pandas") \
        .map_batches(lambda b: b, batch_format="pyarrow")
    return partials.groupby("vb").map_groups(merge, batch_format="pandas")
