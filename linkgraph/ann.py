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
import pyarrow.compute as pc


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def vec_matrix(col, dtype=np.float64) -> np.ndarray:
    """``list<float>`` Arrow column -> (n, d) ndarray WITHOUT a Python-object
    pass: flatten the list values buffer (zero-copy for non-null,
    non-sliced arrays) and reshape by the uniform vector width.  Falls
    back to the object path only for ragged/null inputs (never the case
    for the embeddings table, but keeps the helper total)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    if col.null_count == 0:
        if pa.types.is_fixed_size_list(col.type):
            w = col.type.list_size
            flat = col.flatten().to_numpy(zero_copy_only=False)
            return np.ascontiguousarray(
                flat.reshape(n, int(w))).astype(dtype, copy=False)
        offs = col.offsets.to_numpy(zero_copy_only=False)
        widths = np.diff(offs)
        if widths.size and (widths == widths[0]).all():
            flat = col.flatten().to_numpy(zero_copy_only=False)
            return np.ascontiguousarray(
                flat.reshape(n, int(widths[0]))).astype(dtype, copy=False)
    return np.array(col.to_pylist(), dtype=dtype)


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
        m = _normalize(vec_matrix(batch[vec_col]))
        sims = q @ m.T  # (nq, nb)
        nq, nb = sims.shape
        kk = min(k + (1 if exclude_self else 0), nb)
        # tie-aware partial: a plain argpartition on cosine could keep a
        # boundary-tied candidate with a larger neighbor_id than one it
        # drops, breaking the global (cosine desc, id asc) rule — rank
        # each query's batch by the full (sim desc, id asc) lexsort
        # before cutting (nq is small; O(nq*nb log nb) per batch)
        ids_row = np.broadcast_to(vids.astype(np.int64), (nq, nb))
        part = np.lexsort((ids_row, -sims), axis=1)[:, :kk]
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


def label_centroids(ds, label_col: str = "label",
                    vec_col: str = "embedding"):
    """Per-label centroid of L2-NORMALIZED embeddings (cosine-space class
    prototype — classifier priors, cluster summaries, semantic-dedup
    seeds).  Fully distributed map-side partials: each batch emits one
    (label, dim, partial_sum, count) row per label-dim it saw, a small
    groupby(label, i) Sum reduces them, mean = sum/count.  Long output
    (label, i, c, n), i 1-based, c rounded to 6 — nothing corpus-sized
    reaches the driver."""
    from ray.data.aggregate import Sum

    from .runtime import tune_context

    tune_context()

    def partial(b: pa.Table) -> pa.Table:
        labels = b[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _normalize(vec_matrix(b[vec_col]))
        uniq, inv = np.unique(labels, return_inverse=True)
        dim = m.shape[1]
        sums = np.zeros((len(uniq), dim), np.float64)
        np.add.at(sums, inv, m)
        counts = np.bincount(inv, minlength=len(uniq))
        lab = np.repeat(uniq, dim)
        idx = np.tile(np.arange(1, dim + 1, dtype=np.int64), len(uniq))
        return pa.table({
            "label": pa.array(lab, pa.int64()),
            "i": pa.array(idx, pa.int64()),
            "psum": pa.array(sums.reshape(-1), pa.float64()),
            "n": pa.array(np.repeat(counts, dim).astype(np.int64)),
        })

    agg = ds.map_batches(partial, batch_format="pyarrow") \
            .groupby(["label", "i"]) \
            .aggregate(Sum("psum", alias_name="psum"),
                       Sum("n", alias_name="n"))

    def post(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        c = pc.round(pc.divide(b["psum"],
                               pc.cast(b["n"], pa.float64())), 6)
        return pa.table({"label": b["label"], "i": b["i"],
                         "c": c, "n": pc.cast(b["n"], pa.int64())})

    return agg.map_batches(post, batch_format="pyarrow")


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


def train_centroids(ds, n_centroids: int = 16, sample_n: int = 2048,
                    seed: int = 42, vec_col: str = "embedding") -> np.ndarray:
    """Coarse IVF centroids: deterministic sample + a few Lloyd rounds.
    The sample is the only data that ever reaches the driver."""
    sample = ds.limit(sample_n).take_all()
    sm = _normalize(np.array([r[vec_col] for r in sample], dtype=np.float64))
    rng = np.random.default_rng(seed)
    cent = sm[rng.choice(len(sm), min(n_centroids, len(sm)), replace=False)]
    for _ in range(5):
        assign = (sm @ cent.T).argmax(axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                cent[c] = _normalize(sm[m].mean(axis=0, keepdims=True))[0]
    return cent


def build_ivf_index(ds, cent: np.ndarray, index_dir: str | None = None,
                    id_col: str = "vec_id", vec_col: str = "embedding"
                    ) -> str:
    """One-time IVF physical layout: ONE assignment pass over the corpus,
    partitioned parquet write (`centroid=<c>/` dirs).  At query time only
    the probed partitions are READ — a real pruned scan, not a full scan
    with a filter (VERDICT r1 #7)."""
    import tempfile

    import ray

    if index_dir is None:
        index_dir = tempfile.mkdtemp(prefix="linkgraph_ivf_", dir="/tmp")
    cref = ray.put(cent)

    def assign_batch(b: pa.Table) -> pa.Table:
        c = ray.get(cref)
        m = _normalize(vec_matrix(b[vec_col]))
        a = (m @ c.T).argmax(axis=1).astype(np.int64)
        return b.select([id_col, vec_col]).append_column(
            "centroid", pa.array(a))

    ds.map_batches(assign_batch, batch_format="pyarrow").write_parquet(
        index_dir, partition_cols=["centroid"], mode="overwrite")
    return index_dir


def make_hyperplanes(dim: int, n_planes: int = 6,
                     seed: int = 42) -> np.ndarray:
    """Deterministic random hyperplanes for sign-LSH bucketing."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def build_lsh_index(ds, planes: np.ndarray, index_dir: str | None = None,
                    id_col: str = "vec_id", vec_col: str = "embedding"
                    ) -> str:
    """Physical sign-LSH layout: ONE pass assigns every vector its
    hyperplane sign code (bucket), partitioned parquet write
    (`bucket=<c>/` dirs).  Query time READS only the probed buckets —
    the same pruned-scan shape as build_ivf_index, but the quantizer is
    non-iterative (fixed seeded hyperplanes), which keeps the whole
    operator SQL-oracle-checkable end to end (pipelines 'ann_lsh')."""
    import tempfile

    import ray

    if index_dir is None:
        index_dir = tempfile.mkdtemp(prefix="linkgraph_lsh_", dir="/tmp")
    pref = ray.put(planes)

    def assign(b: pa.Table) -> pa.Table:
        pl = ray.get(pref)
        m = vec_matrix(b[vec_col])
        bits = (m @ pl.T) > 0
        code = (bits * (1 << np.arange(pl.shape[0]))).sum(axis=1)
        return b.select([id_col, vec_col]).append_column(
            "bucket", pa.array(code.astype(np.int64)))

    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        index_dir, partition_cols=["bucket"], mode="overwrite")
    return index_dir


def lsh_topk(ds, queries: np.ndarray, query_ids: np.ndarray, k: int = 5,
             n_planes: int = 6, seed: int = 42, id_col: str = "vec_id",
             vec_col: str = "embedding", exclude_self: bool = True,
             stats: dict | None = None) -> pd.DataFrame:
    """Sign-LSH ANN: vectors physically bucketed by hyperplane sign code,
    queries probe their own bucket plus all hamming-1 neighbors (a
    DETERMINISTIC probe set — no float ranking decides which buckets are
    read), pruned scan + one masked matmul per batch.  Approximate
    (recall < 1), but every step is deterministic integer/float64 math,
    so the full operator has an exact DuckDB oracle."""
    import glob
    import os

    import ray
    import ray.data as rd

    planes = make_hyperplanes(np.asarray(queries).shape[1], n_planes, seed)
    index_dir = build_lsh_index(ds, planes, id_col=id_col, vec_col=vec_col)

    qraw = np.asarray(queries, dtype=np.float64)
    qm = _normalize(qraw)
    qids_arr = np.asarray(query_ids, dtype=np.int64)
    qcodes = (((qraw @ planes.T) > 0)
              * (1 << np.arange(n_planes))).sum(axis=1)
    # probe set: own bucket + every hamming-1 bucket (bit flips)
    n_buckets = 1 << n_planes
    probe_mat = np.zeros((len(qm), n_buckets), dtype=bool)
    for qi, c in enumerate(qcodes):
        probe_mat[qi, c] = True
        for b in range(n_planes):
            probe_mat[qi, c ^ (1 << b)] = True

    paths = []
    for c in np.flatnonzero(probe_mat.any(axis=0)):
        paths.extend(sorted(glob.glob(
            os.path.join(index_dir, f"bucket={c}", "*.parquet"))))
    if not paths:
        # external queries whose own + hamming-1 buckets are all empty:
        # an empty top-k, not a read_parquet([]) crash (ADVICE r2)
        return pd.DataFrame({"query_id": np.empty(0, np.int64),
                             "neighbor_id": np.empty(0, np.int64),
                             "rnk": np.empty(0, np.int64),
                             "cosine": np.empty(0, np.float64)})
    scanned = rd.read_parquet(paths, columns=[id_col, vec_col])
    if stats is not None:
        stats["rows_scanned"] = scanned.count()
        stats["rows_total"] = ds.count()
        stats["index_dir"] = index_dir

    pref = ray.put(planes)
    qref = ray.put((qm, qids_arr, probe_mat))
    kk = k + (1 if exclude_self else 0)

    def partial(batch: pa.Table) -> pa.Table:
        pl = ray.get(pref)
        q, qids, pm = ray.get(qref)
        vids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        raw = vec_matrix(batch[vec_col])
        code = (((raw @ pl.T) > 0)
                * (1 << np.arange(pl.shape[0]))).sum(axis=1)
        sims = q @ _normalize(raw).T          # (nq, nb)
        allowed = pm[:, code]                 # (nq, nb)
        sims = np.where(allowed, sims, -2.0)
        nq, nb = sims.shape
        kb = min(kk, nb)
        ids_row = np.broadcast_to(vids, (nq, nb))
        part = np.lexsort((ids_row, -sims), axis=1)[:, :kb]
        rows = np.repeat(np.arange(nq), kb)
        cols = part.reshape(-1)
        keep = allowed[rows, cols]
        return pa.table({
            "query_id": pa.array(qids[rows][keep], pa.int64()),
            "neighbor_id": pa.array(vids[cols][keep]),
            "cosine": pa.array(sims[rows, cols][keep], pa.float64()),
        })

    parts = scanned.map_batches(partial, batch_format="pyarrow").to_pandas()
    if exclude_self:
        parts = parts[parts["query_id"] != parts["neighbor_id"]]
    top = _topk_frame(parts["query_id"].to_numpy(),
                      parts["neighbor_id"].to_numpy(),
                      parts["cosine"].to_numpy(), k)
    top["rnk"] = top.groupby("query_id").cumcount() + 1
    return top[["query_id", "neighbor_id", "rnk", "cosine"]]


def ivf_topk(ds, queries: np.ndarray, query_ids: np.ndarray, k: int = 5,
             n_centroids: int = 16, n_probe: int = 4, sample_n: int = 2048,
             seed: int = 42, id_col: str = "vec_id",
             vec_col: str = "embedding", exclude_self: bool = True,
             stats: dict | None = None) -> pd.DataFrame:
    """IVF ANN: vectors physically bucketed by nearest coarse centroid
    (partitioned parquet index), queries READ only their n_probe nearest
    buckets; within the pruned scan the per-batch kernel is one masked
    matmul over all queries (no per-query loop).  Approximate (recall <
    1, documented).  Pass `stats` to receive rows_scanned / rows_total.
    """
    import os

    import ray
    import ray.data as rd

    cent = train_centroids(ds, n_centroids, sample_n, seed, vec_col)
    index_dir = build_ivf_index(ds, cent, id_col=id_col, vec_col=vec_col)

    qm = _normalize(np.asarray(queries, dtype=np.float64))
    qids_arr = np.asarray(query_ids, dtype=np.int64)
    probe = np.argsort(-(qm @ cent.T), axis=1)[:, :n_probe]
    probe_mat = np.zeros((len(qm), len(cent)), dtype=bool)
    probe_mat[np.repeat(np.arange(len(qm)), probe.shape[1]),
              probe.reshape(-1)] = True
    import glob

    paths = []
    for c in sorted(set(probe.reshape(-1).tolist())):
        paths.extend(sorted(glob.glob(
            os.path.join(index_dir, f"centroid={c}", "*.parquet"))))
    if not paths:
        # every probed centroid owned zero vectors (possible when
        # k-means leaves empty cells): an empty top-k, not a
        # read_parquet([]) crash — same guard as lsh_topk (ADVICE r2)
        return pd.DataFrame({"query_id": np.empty(0, np.int64),
                             "neighbor_id": np.empty(0, np.int64),
                             "rnk": np.empty(0, np.int64),
                             "cosine": np.empty(0, np.float64)})
    scanned = rd.read_parquet(paths, columns=[id_col, vec_col])
    if stats is not None:
        stats["rows_scanned"] = scanned.count()
        stats["rows_total"] = ds.count()
        stats["index_dir"] = index_dir

    cref = ray.put(cent)
    qref = ray.put((qm, qids_arr, probe_mat))
    kk = k + (1 if exclude_self else 0)

    def partial(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        q, qids, pm = ray.get(qref)
        vids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = _normalize(vec_matrix(batch[vec_col]))
        assign = (m @ c.T).argmax(axis=1)  # deterministic re-derivation
        sims = q @ m.T                      # (nq, nb)
        allowed = pm[:, assign]             # (nq, nb) probe mask
        sims = np.where(allowed, sims, -2.0)
        nq, nb = sims.shape
        kb = min(kk, nb)
        ids_row = np.broadcast_to(vids, (nq, nb))
        part = np.lexsort((ids_row, -sims), axis=1)[:, :kb]
        rows = np.repeat(np.arange(nq), kb)
        cols = part.reshape(-1)
        keep = allowed[rows, cols]
        return pa.table({
            "query_id": pa.array(qids[rows][keep], pa.int64()),
            "neighbor_id": pa.array(vids[cols][keep]),
            "cosine": pa.array(sims[rows, cols][keep], pa.float64()),
        })

    parts = scanned.map_batches(partial, batch_format="pyarrow").to_pandas()
    if exclude_self:
        parts = parts[parts["query_id"] != parts["neighbor_id"]]
    top = _topk_frame(parts["query_id"].to_numpy(),
                      parts["neighbor_id"].to_numpy(),
                      parts["cosine"].to_numpy(), k)
    top["rnk"] = top.groupby("query_id").cumcount() + 1
    return top[["query_id", "neighbor_id", "rnk", "cosine"]]


def _gram_dense(ds, vec_col: str = "embedding") -> np.ndarray | None:
    """Distributed G = X^T X: each batch contributes its own d x d BLAS
    product; partials are d*d doubles regardless of row count, so the
    driver merge is O(blocks * d^2) — nothing row-scaled is collected.
    None when the dataset is empty."""
    def partial(b: pa.Table) -> pa.Table:
        if len(b) == 0:  # an empty block would emit a malformed 1x1 g
            return pa.table({"g": pa.array([], pa.list_(pa.float64()))})
        m = vec_matrix(b[vec_col])
        g = m.T @ m
        return pa.table({"g": pa.array([g.reshape(-1)],
                                       pa.list_(pa.float64()))})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).take_all()
    if not parts:
        return None
    flat = np.zeros(len(parts[0]["g"]), np.float64)
    for r in parts:
        flat += np.asarray(r["g"], dtype=np.float64)
    d = int(round(len(flat) ** 0.5))
    return flat.reshape(d, d)


def gram_matrix(ds, vec_col: str = "embedding",
                round_to: int = 6) -> pd.DataFrame:
    """Distributed Gram matrix G = X^T X over the embedding column —
    the one-pass building block for PCA / whitening / linear probes
    (covariance follows from G and the column sums).  See _gram_dense
    for the partial-sum shape.  Returns the upper triangle as
    (i, j, val) rows, 0-based, val rounded."""
    g = _gram_dense(ds, vec_col)
    if g is None:
        return pd.DataFrame({"i": pd.Series([], dtype=np.int64),
                             "j": pd.Series([], dtype=np.int64),
                             "val": pd.Series([], dtype=np.float64)})
    d = g.shape[0]
    iu, ju = np.triu_indices(d)
    return pd.DataFrame({"i": iu.astype(np.int64),
                         "j": ju.astype(np.int64),
                         "val": np.round(g[iu, ju], round_to)})


def pca_power_top(ds, vec_col: str = "embedding", iters: int = 8,
                  round_to: int = 6) -> pd.DataFrame:
    """Top principal direction of the (uncentered) Gram matrix via
    `iters` deterministic power-iteration steps from the fixed init
    v0 = 1/sqrt(d): ONE distributed pass builds G (_gram_dense), the
    iteration itself is O(iters * d^2) driver math.  Returns one row
    per dimension (i, loading, eigval) with the Rayleigh-quotient
    eigenvalue repeated per row; exactly `iters` steps are taken (no
    convergence test), so the SQL oracle can unroll the identical
    matvec/normalize chain."""
    g = _gram_dense(ds, vec_col)
    if g is None:
        return pd.DataFrame({"i": pd.Series([], dtype=np.int64),
                             "loading": pd.Series([], dtype=np.float64),
                             "eigval": pd.Series([], dtype=np.float64)})
    d = g.shape[0]
    v = np.full(d, 1.0 / np.sqrt(d))
    for _ in range(iters):
        w = g @ v
        v = w / np.sqrt((w * w).sum())
    lam = float(v @ (g @ v))
    return pd.DataFrame({"i": np.arange(d, dtype=np.int64),
                         "loading": np.round(v, round_to),
                         "eigval": np.round(lam, round_to)})


def kmeans_full(ds, n_centroids: int = 8, iters: int = 4,
                sample_n: int = 500, seed: int = 42,
                id_col: str = "vec_id", vec_col: str = "embedding",
                round_to: int = 6) -> pd.DataFrame:
    """FULL-CORPUS distributed Lloyd k-means over L2-normalized vectors
    (cosine k-means, the train_centroids conventions) — unlike
    train_centroids, which iterates on a driver-side sample, every
    round here is one distributed pass: centroids are ray.put ONCE per
    round, each batch emits a single (k x d sums + k counts) partial
    row, and the driver merge is O(blocks * k * d).  Deterministic:
    seeded init rows (rng.choice over the first sample_n vec_ids, the
    _ann_ivf_sql convention), argmax-dot assignment with ties to the
    smallest centroid id, empty clusters keep their previous centroid,
    new centroids are L2-normalized with the zero guard.

    Returns long-form (c, i, y, n): centroid id, 1-based dim, rounded
    coordinate, final-assignment cluster size."""
    import ray

    cent = kmeans_centroids(ds, n_centroids, iters, sample_n, seed,
                            id_col, vec_col)
    n_centroids, d = cent.shape
    cref = ray.put(cent)
    parts = ds.map_batches(_kmeans_part(cref, vec_col, False),
                           batch_format="pyarrow").take_all()
    counts = np.zeros(n_centroids, np.int64)
    for r in parts:
        counts += np.asarray(r["counts"], dtype=np.int64)
    cc = np.repeat(np.arange(n_centroids, dtype=np.int64), d)
    ii = np.tile(np.arange(1, d + 1, dtype=np.int64), n_centroids)
    return pd.DataFrame({"c": cc, "i": ii,
                         "y": np.round(cent.reshape(-1), round_to),
                         "n": np.repeat(counts, d)})


def _kmeans_part(cref, vec_col: str, with_sums: bool):
    """Per-batch Lloyd partial vs the broadcast centroids `cref`: one
    (k x d sums + k counts) row (with_sums) or counts only."""
    import ray

    def part(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pa.table(
                {"sums": pa.array([], pa.list_(pa.float64())),
                 "counts": pa.array([], pa.list_(pa.int64()))})
        c = ray.get(cref)
        m = _normalize(vec_matrix(b[vec_col]))
        a = np.argmax(m @ c.T, axis=1)  # ties -> smallest c
        counts = np.bincount(a, minlength=len(c)).astype(np.int64)
        sums = np.zeros((len(c), m.shape[1] if with_sums else 0),
                        np.float64)
        if with_sums:
            np.add.at(sums, a, m)
        return pa.table({
            "sums": pa.array([sums.reshape(-1)], pa.list_(pa.float64())),
            "counts": pa.array([counts], pa.list_(pa.int64()))})
    return part


def kmeans_centroids(ds, n_centroids: int = 8, iters: int = 4,
                     sample_n: int = 500, seed: int = 42,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> np.ndarray:
    """The Lloyd rounds of kmeans_full without the final counting pass:
    returns the (k x d) L2-normalized centroid matrix after `iters`
    full-corpus rounds from the seeded init (see kmeans_full)."""
    import ray

    rng = np.random.default_rng(seed)
    idx = rng.choice(sample_n, n_centroids, replace=False)
    q, qi = queries_from_ids(ds, [int(i) for i in idx],
                             id_col=id_col, vec_col=vec_col)
    pos = {int(v): p for p, v in enumerate(qi)}
    cent = _normalize(q)[[pos[int(i)] for i in idx]]  # cent[c] = row idx[c]
    d = cent.shape[1]

    for _ in range(iters):
        cref = ray.put(cent)
        parts = ds.map_batches(_kmeans_part(cref, vec_col, True),
                               batch_format="pyarrow").take_all()
        sums = np.zeros((n_centroids, d), np.float64)
        counts = np.zeros(n_centroids, np.int64)
        for r in parts:
            s = np.asarray(r["sums"], dtype=np.float64)
            if s.size:
                sums += s.reshape(n_centroids, d)
            counts += np.asarray(r["counts"], dtype=np.int64)
        new = cent.copy()  # empty clusters keep their previous centroid
        nz = counts > 0
        mean = sums[nz] / counts[nz, None]
        nrm = np.sqrt((mean * mean).sum(axis=1))
        nrm[nrm == 0] = 1.0
        new[nz] = mean / nrm[:, None]
        cent = new
    return cent


def cluster_silhouette(ds, n_centroids: int = 8, iters: int = 4,
                       sample_n: int = 500, seed: int = 42,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       round_to: int = 6) -> pd.DataFrame:
    """Simplified (centroid-based) silhouette per k-means cluster: for
    each vector, a = cosine distance to its OWN centroid (the argmax-dot
    assignment), b = distance to the nearest OTHER centroid, and
    s = (b - a) / max(a, b) (0 when both are 0); the report is one row
    per non-empty cluster — (c, n, sil = round(mean s, 6)).

    Scale shape: the Lloyd rounds are kmeans_centroids' distributed
    passes; the silhouette itself is ONE extra pass — centroids ray.put
    once, each batch emits (k counts + k partial s-sums), driver merge
    O(blocks * k).  No shuffle, no per-vector result materialized."""
    import ray

    cent = kmeans_centroids(ds, n_centroids, iters, sample_n, seed,
                            id_col, vec_col)
    cref = ray.put(cent)

    def part(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pa.table(
                {"ssum": pa.array([], pa.list_(pa.float64())),
                 "counts": pa.array([], pa.list_(pa.int64()))})
        c = ray.get(cref)
        m = _normalize(vec_matrix(b[vec_col]))
        dots = m @ c.T
        a = np.argmax(dots, axis=1)               # ties -> smallest c
        best = dots[np.arange(len(m)), a]
        dots[np.arange(len(m)), a] = -np.inf
        # k == 1: no "other" centroid -> b = a -> s = 0 everywhere
        second = dots.max(axis=1) if c.shape[0] > 1 else best
        ad, bd = 1.0 - best, 1.0 - second         # bd >= ad always
        denom = np.maximum(ad, bd)
        s = np.where(denom == 0, 0.0, (bd - ad) / np.where(denom == 0,
                                                           1.0, denom))
        return pa.table({
            "ssum": pa.array([np.bincount(a, weights=s,
                                          minlength=len(c))],
                             pa.list_(pa.float64())),
            "counts": pa.array([np.bincount(a, minlength=len(c))
                                .astype(np.int64)],
                               pa.list_(pa.int64()))})

    parts = ds.map_batches(part, batch_format="pyarrow").take_all()
    ssum = np.zeros(len(cent), np.float64)
    counts = np.zeros(len(cent), np.int64)
    for r in parts:
        ssum += np.asarray(r["ssum"], dtype=np.float64)
        counts += np.asarray(r["counts"], dtype=np.int64)
    nz = np.flatnonzero(counts)
    return pd.DataFrame({"c": nz.astype(np.int64),
                         "n": counts[nz],
                         "sil": np.round(ssum[nz] / counts[nz],
                                         round_to)})


def pca_project(ds, vec_col: str = "embedding",
                id_col: str = "vec_id", iters: int = 8,
                round_to: int = 6):
    """Project every vector onto the PCA top direction (pca_power_top's
    deterministic power iteration): one distributed Gram pass, the
    d-vector broadcast once, then a stateless per-batch dot product —
    the embedding-compression / 1-D ordering primitive.  Dataset out
    (id, proj)."""
    import ray

    g = _gram_dense(ds, vec_col)
    if g is None:
        import ray.data as rd
        return rd.from_arrow(pa.table({
            id_col: pa.array([], pa.int64()),
            "proj": pa.array([], pa.float64())}))
    d = g.shape[0]
    v = np.full(d, 1.0 / np.sqrt(d))
    for _ in range(iters):
        w = g @ v
        v = w / np.sqrt((w * w).sum())
    vref = ray.put(v)

    def project(b: pa.Table) -> pa.Table:
        vec = ray.get(vref)
        m = vec_matrix(b[vec_col])
        proj = m @ vec if len(m) else np.empty(0, np.float64)
        return pa.table({id_col: pc.cast(b[id_col], pa.int64()),
                         "proj": pa.array(np.round(proj, round_to))})

    return ds.map_batches(project, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Product quantization (PQ) ANN: train -> encode -> ADC search
# ---------------------------------------------------------------------------
# The memory-compressed ANN lane: vectors quantize to m uint8 codes
# (64 float32 dims -> 4 bytes here), so a 100-TB embedding corpus's
# index fits in RAM/object store at ~1/64 the footprint, and search is
# an O(m) LUT gather per candidate instead of a d-dim dot product.
# Subspace k-means is RAW L2 Lloyd (not the cosine k-means of
# kmeans_full) because ADC approximates ||q - v||^2 = sum_s of
# ||q_s - c_{s,code_s(v)}||^2.  Deterministic: per-subspace seeded init
# rows, argmin ties -> smallest code, empty clusters keep the previous
# codeword — all reproduced by pipelines._pq_sql.

PQ_M = 4          # subspaces
PQ_K = 8          # codewords per subspace
PQ_ITERS = 2      # Lloyd rounds (unrolled in the SQL oracle)


def pq_train(ds, m: int = PQ_M, k: int = PQ_K, iters: int = PQ_ITERS,
             sample_n: int = 500, seed: int = 42,
             id_col: str = "vec_id",
             vec_col: str = "embedding") -> np.ndarray:
    """Train per-subspace codebooks with full-corpus Lloyd rounds.
    Returns cents (m, k, d/m) float64.  Each round is ONE distributed
    pass: codebooks are ray.put once, every batch emits a single
    (m*k*sub sums + m*k counts) partial row, driver merge is
    O(blocks * m * k * sub)."""
    import ray

    idxs = [np.random.default_rng(seed + s).choice(sample_n, k,
                                                   replace=False)
            for s in range(m)]
    need = sorted({int(i) for ix in idxs for i in ix})
    q, qi = queries_from_ids(ds, need, id_col=id_col, vec_col=vec_col)
    pos = {int(v): p for p, v in enumerate(qi)}
    d = q.shape[1]
    sub = d // m
    cents = np.stack([
        q[[pos[int(i)] for i in idxs[s]], s * sub:(s + 1) * sub]
        for s in range(m)])  # (m, k, sub)

    def make_part(cref, with_sums: bool):
        def part(b: pa.Table) -> pa.Table:
            cols = {"sums": pa.array([], pa.list_(pa.float64())),
                    "counts": pa.array([], pa.list_(pa.int64()))}
            if len(b) == 0:
                return pa.table(cols)
            c = ray.get(cref)
            x = vec_matrix(b[vec_col])
            sums = np.zeros((m, k, sub), np.float64)
            counts = np.zeros((m, k), np.int64)
            for s in range(m):
                xs = x[:, s * sub:(s + 1) * sub]
                dist = ((xs[:, None, :] - c[s][None]) ** 2).sum(-1)
                a = np.argmin(dist, axis=1)  # ties -> smallest code
                counts[s] = np.bincount(a, minlength=k)
                if with_sums:
                    np.add.at(sums[s], a, xs)
            if not with_sums:
                sums = np.zeros((0,), np.float64)
            return pa.table({
                "sums": pa.array([sums.reshape(-1)],
                                 pa.list_(pa.float64())),
                "counts": pa.array([counts.reshape(-1)],
                                   pa.list_(pa.int64()))})
        return part

    for _ in range(iters):
        cref = ray.put(cents)
        parts = ds.map_batches(make_part(cref, True),
                               batch_format="pyarrow").take_all()
        sums = np.zeros((m, k, sub), np.float64)
        counts = np.zeros((m, k), np.int64)
        for r in parts:
            s_ = np.asarray(r["sums"], dtype=np.float64)
            if s_.size:
                sums += s_.reshape(m, k, sub)
            counts += np.asarray(r["counts"],
                                 dtype=np.int64).reshape(m, k)
        new = cents.copy()  # empty clusters keep the previous codeword
        nz = counts > 0
        new[nz] = sums[nz] / counts[nz][:, None]
        cents = new
    return cents


def pq_topk(ds, query_ids: list[int], k_nn: int = 5, m: int = PQ_M,
            k: int = PQ_K, iters: int = PQ_ITERS, sample_n: int = 500,
            seed: int = 42, id_col: str = "vec_id",
            vec_col: str = "embedding") -> pd.DataFrame:
    """ADC top-k: train codebooks, build each query's (m, k) distance
    LUT once on the driver, then ONE stateless pass encodes every batch
    (argmin per subspace) and gathers approx distances from the
    broadcast LUT — per-block tie-aware partial top-k, tiny driver
    merge (the brute_force_topk shape with distance ASC).  Returns
    (query_id, neighbor_id, rnk, adist), adist rounded to 6."""
    import ray

    cents = pq_train(ds, m=m, k=k, iters=iters, sample_n=sample_n,
                     seed=seed, id_col=id_col, vec_col=vec_col)
    q, qi = queries_from_ids(ds, [int(i) for i in query_ids],
                             id_col=id_col, vec_col=vec_col)
    d = q.shape[1]
    sub = d // m
    nq = len(qi)
    lut = np.zeros((nq, m, k), np.float64)
    for s in range(m):
        qs = q[:, s * sub:(s + 1) * sub]
        lut[:, s, :] = ((qs[:, None, :] - cents[s][None]) ** 2).sum(-1)
    bref = ray.put((cents, lut, qi))

    def partial(b: pa.Table) -> pa.Table:
        c, lt, qids = ray.get(bref)
        vids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        x = vec_matrix(b[vec_col])
        nb = len(vids)
        adist = np.zeros((len(qids), nb), np.float64)
        for s in range(m):
            xs = x[:, s * sub:(s + 1) * sub]
            dist = ((xs[:, None, :] - c[s][None]) ** 2).sum(-1)
            codes = np.argmin(dist, axis=1)
            adist += lt[:, s, :][:, codes]
        kk = min(k_nn + 1, nb)  # +1: self may rank first
        ids_row = np.broadcast_to(vids, (len(qids), nb))
        part = np.lexsort((ids_row, adist), axis=1)[:, :kk]
        rows = np.repeat(np.arange(len(qids)), kk)
        cols = part.reshape(-1)
        return pa.table({
            "query_id": pa.array(qids[rows], pa.int64()),
            "neighbor_id": pa.array(vids[cols]),
            "adist": pa.array(adist[rows, cols], pa.float64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    parts = parts[parts["query_id"] != parts["neighbor_id"]]
    parts = parts.sort_values(["query_id", "adist", "neighbor_id"],
                              kind="mergesort")
    top = parts.groupby("query_id", sort=True).head(k_nn) \
               .reset_index(drop=True)
    top["rnk"] = top.groupby("query_id").cumcount() + 1
    top["adist"] = top["adist"].round(6)
    return top[["query_id", "neighbor_id", "rnk", "adist"]]


# ---------------------------------------------------------------------------
# Approximate kNN graph construction (LSH-bucketed, never all-pairs)
# ---------------------------------------------------------------------------

KNN_GRAPH_K = 3
KNN_GRAPH_PLANES = 6


def knn_graph_edges(ds, k: int = KNN_GRAPH_K,
                    n_planes: int = KNN_GRAPH_PLANES, seed: int = 42,
                    id_col: str = "vec_id", vec_col: str = "embedding"):
    """Directed kNN selections (a -> its top-k cosine neighbors among
    candidates at sign-LSH hamming distance <= 1) as a Dataset
    (src, dst) — the similarity-graph construction step for semantic
    clustering, mutual-kNN dedup, or graph-based label propagation over
    an embedding corpus.

    Exactly-hamming<=1 candidate rule with NO all-pairs pass: every
    vector is replicated into its own code bucket (is_self=1) and its
    n_planes one-bit-flip buckets (is_self=0), so a vector's own bucket
    contains ALL of its hamming<=1 candidates (equal codes arrive as
    self rows, hamming-1 codes as flipped copies) and each neighbor
    appears exactly once there.  One groupby(bucket) shuffle; the
    in-bucket kernel is a vectorized (self x all) cosine matmul +
    tie-aware top-k (cos DESC, id ASC).  Scale note: n_planes must grow
    ~log2(N) to keep the 2^n_planes bucket domain balanced (6 planes =
    64 buckets is sized for the test corpus; the parameter is the
    recall/size dial, same trade as lsh_topk)."""
    dim = len(ds.take(1)[0][vec_col])
    planes = make_hyperplanes(dim, n_planes, seed)

    def bucketize_factory(pl):
        def bucketize(b: pa.Table) -> pa.Table:
            ids = b[id_col].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            m = _normalize(vec_matrix(b[vec_col]))
            bits = (m @ pl.T) > 0
            code = (bits * (1 << np.arange(n_planes))).sum(axis=1) \
                .astype(np.int64)
            n = len(ids)
            buckets = [code]
            flags = [np.ones(n, np.int64)]
            for i in range(n_planes):
                buckets.append(code ^ (1 << i))
                flags.append(np.zeros(n, np.int64))
            reps = n_planes + 1
            return pa.table({
                "bucket": pa.array(np.concatenate(buckets)),
                "is_self": pa.array(np.concatenate(flags)),
                id_col: pa.array(np.tile(ids, reps)),
                "vec": pa.array(list(np.tile(m, (reps, 1))),
                                pa.list_(pa.float64()))})
        return bucketize

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy(np.int64)
        m = np.stack([np.asarray(v, np.float64) for v in g["vec"]])
        selfmask = g["is_self"].to_numpy(np.int64) == 1
        if not selfmask.any():
            return pd.DataFrame({"src": pd.Series([], dtype=np.int64),
                                 "dst": pd.Series([], dtype=np.int64)})
        a_ids = ids[selfmask]
        cos = m[selfmask] @ m.T           # (n_self, n_all)
        same = a_ids[:, None] == ids[None, :]
        cos[same] = -np.inf               # exclude the vector itself
        kk = min(k, cos.shape[1])
        ids_row = np.broadcast_to(ids, cos.shape)
        part = np.lexsort((ids_row, -cos), axis=1)[:, :kk]
        rows = np.repeat(np.arange(len(a_ids)), kk)
        cols = part.reshape(-1)
        keep = np.isfinite(cos[rows, cols])
        return pd.DataFrame({"src": a_ids[rows[keep]],
                             "dst": ids[cols[keep]]})

    buckets = ds.map_batches(bucketize_factory(planes),
                             batch_format="pyarrow")
    from .runtime import tune_context
    tune_context()
    return buckets.groupby("bucket").map_groups(kern,
                                                batch_format="pandas")


# ---------------------------------------------------------------------------
# Embedding outlier detection (distance to class prototype)
# ---------------------------------------------------------------------------

OUTLIER_K = 25


def embedding_outliers(ds, k: int = OUTLIER_K, label_col: str = "label",
                       id_col: str = "vec_id",
                       vec_col: str = "embedding") -> pd.DataFrame:
    """Top-k vectors farthest (L2 in normalized space) from their own
    label's centroid — the mislabeled/noise screen an embedding-corpus
    QA pass runs.  Centroids come from label_centroids (map-side
    partials, label-bounded), are ROUNDED to 6 before the distance pass
    (so engine and oracle rank against bit-identical prototypes), and
    broadcast once; the scan is one stateless pass with per-block
    tie-aware partial top-k.  Returns (id, label, dist) with dist
    rounded to 6, ordered (dist DESC, id ASC)."""
    import ray

    cent = label_centroids(ds, label_col=label_col,
                           vec_col=vec_col).to_pandas()
    labels = np.sort(cent["label"].unique())
    d = int(cent["i"].max())
    cmat = np.zeros((len(labels), d), np.float64)
    lpos = {int(l): p for p, l in enumerate(labels)}
    cmat[[lpos[int(l)] for l in cent["label"]],
         cent["i"].to_numpy(np.int64) - 1] = cent["c"].to_numpy()
    cref = ray.put((cmat, lpos))

    def partial(b: pa.Table) -> pa.Table:
        cm, lp = ray.get(cref)
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        lab = b[label_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        m = _normalize(vec_matrix(b[vec_col]))
        rows = np.array([lp[int(x)] for x in lab], np.int64)
        dist = np.sqrt(((m - cm[rows]) ** 2).sum(axis=1))
        kk = min(k, len(ids))
        ordr = np.lexsort((ids, -dist))[:kk]
        return pa.table({id_col: pa.array(ids[ordr]),
                         label_col: pa.array(lab[ordr]),
                         "dist": pa.array(dist[ordr], pa.float64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    parts = parts.sort_values(["dist", id_col],
                              ascending=[False, True],
                              kind="mergesort").head(k)
    parts["dist"] = parts["dist"].round(6)
    return parts.reset_index(drop=True)


# ---------------------------------------------------------------------------
# Scalar int8 quantization (embedding compression QA)
# ---------------------------------------------------------------------------

def quantize_int8(ds, id_col: str = "vec_id",
                  vec_col: str = "embedding"):
    """Per-dimension min/max scalar quantization to uint8 codes and the
    per-vector reconstruction RMSE — the compression-loss report an
    embedding-storage pipeline emits before switching to 1-byte codes
    (4x over float32, 8x over float64).

    Two passes: per-dim min/max as map-side partial rows (d-sized,
    driver-merged, broadcast once), then one stateless pass computing
    code = floor((x-mn)/(mx-mn)*255 + 0.5), dequantized RMSE.  The
    float expression shape is identical in the SQL twin, so codes are
    bit-equal.  Dataset out (id, code_sum, rmse r6)."""
    import ray

    def mm_part(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pa.table({"mn": pa.array([], pa.list_(pa.float64())),
                             "mx": pa.array([], pa.list_(pa.float64()))})
        x = vec_matrix(b[vec_col])
        return pa.table({"mn": pa.array([x.min(axis=0)],
                                        pa.list_(pa.float64())),
                         "mx": pa.array([x.max(axis=0)],
                                        pa.list_(pa.float64()))})

    parts = ds.map_batches(mm_part, batch_format="pyarrow").take_all()
    mn = np.min(np.stack([np.asarray(r["mn"]) for r in parts]), axis=0)
    mx = np.max(np.stack([np.asarray(r["mx"]) for r in parts]), axis=0)
    rng_ = mx - mn
    rng_[rng_ == 0] = 1.0  # constant dims quantize to code 0 exactly
    ref = ray.put((mn, rng_))

    def enc(b: pa.Table) -> pa.Table:
        m, r = ray.get(ref)
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        x = vec_matrix(b[vec_col])
        code = np.floor((x - m) / r * 255 + 0.5)
        deq = m + code * r / 255
        rmse = np.sqrt(((x - deq) ** 2).mean(axis=1))
        return pa.table({
            id_col: pa.array(ids),
            "code_sum": pa.array(code.sum(axis=1).astype(np.int64)),
            "rmse": pa.array(np.round(rmse, 6), pa.float64())})

    return ds.map_batches(enc, batch_format="pyarrow")


KCENTER_K = 8


def kcenter_greedy(ds, k: int = KCENTER_K, id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   round_to: int = 6) -> pd.DataFrame:
    """Greedy k-center coreset selection (Gonzalez 1985 farthest-point
    traversal — the standard diversity-sampling / coreset primitive of
    training-data curation) over L2-normalized vectors with cosine
    distance: center 1 is the smallest vec_id; each further round picks
    the vector FARTHEST from its nearest chosen center (ties -> the
    smallest id).  Returns (rnk, vec_id, dist) with dist = the winner's
    min distance at selection (0 for the seed), rounded to 6.

    Scale shape: per round the chosen-center matrix broadcasts ONCE
    (ray.put) and every block emits a single (id, mind, vector) winner
    row — the argmax is a partial-top-1, never a materialized distance
    column.  k passes over the data total.  Same float-tie caveat as
    kmeans_full: distances differ ~1e-16 across engines, selections
    only flip on exact ties, which random embeddings never produce."""
    import ray
    from ray.data.aggregate import Min

    first = ds.aggregate(Min(id_col))
    seed_id = int(first[f"min({id_col})"])
    q, qi = queries_from_ids(ds, [seed_id], id_col=id_col,
                             vec_col=vec_col)
    centers = _normalize(q)
    chosen = [seed_id]
    rows = [(1, seed_id, 0.0)]

    for rnd in range(2, k + 1):
        cref = ray.put((centers, np.array(chosen, np.int64)))

        def winner(b: pa.Table) -> pa.Table:
            empty = pa.table({
                "id": pa.array([], pa.int64()),
                "mind": pa.array([], pa.float64()),
                "emb": pa.array([], pa.list_(pa.float64()))})
            if len(b) == 0:
                return empty
            c, ch = ray.get(cref)
            ids = b[id_col].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            m = _normalize(vec_matrix(b[vec_col]))
            mind = 1.0 - (m @ c.T).max(axis=1)
            ok = ~np.isin(ids, ch)
            if not ok.any():
                return empty
            # block winner: mind DESC, id ASC
            oi = np.flatnonzero(ok)
            best = oi[np.lexsort((ids[oi], -mind[oi]))[0]]
            return pa.table({
                "id": pa.array(ids[best:best + 1]),
                "mind": pa.array(mind[best:best + 1]),
                "emb": pa.array([m[best].tolist()],
                                pa.list_(pa.float64()))})

        parts = ds.map_batches(winner, batch_format="pyarrow") \
                  .to_pandas()
        parts = parts.sort_values(["mind", "id"],
                                  ascending=[False, True],
                                  kind="mergesort")
        sel_id = int(parts["id"].iloc[0])
        sel_d = float(parts["mind"].iloc[0])
        centers = np.vstack([centers,
                             np.array(parts["emb"].iloc[0],
                                      np.float64)])
        chosen.append(sel_id)
        rows.append((rnd, sel_id, round(sel_d, round_to)))
    return pd.DataFrame({"rnk": np.array([r for r, _, _ in rows],
                                         np.int64),
                         "vec_id": np.array([v for _, v, _ in rows],
                                            np.int64),
                         "dist": np.array([d for _, _, d in rows],
                                          np.float64)})


MMR_K = 10
MMR_LAMBDA = 0.7


def mmr_rerank(ds, query_id: int = 0, k: int = MMR_K,
               lam: float = MMR_LAMBDA, id_col: str = "vec_id",
               vec_col: str = "embedding",
               round_to: int = 6) -> pd.DataFrame:
    """Maximal Marginal Relevance selection (Carbonell & Goldstein,
    SIGIR 1998 — the diversity-aware re-ranking of retrieval): given
    the query vector (the row with id `query_id`), greedily pick k
    results maximizing

        lam * cos(q, x) - (1 - lam) * max over chosen c of cos(x, c)

    (round 1 is pure relevance; the query row itself is excluded).
    Ties -> smallest id.  Returns (rnk, vec_id, score rounded).

    Scale shape: identical to kcenter_greedy — the (query, chosen)
    matrix broadcasts once per round, each block emits ONE winner row,
    k passes total.  Same float-tie caveat as kmeans_full."""
    import ray

    q, _ = queries_from_ids(ds, [int(query_id)], id_col=id_col,
                            vec_col=vec_col)
    qv = _normalize(q)[0]
    centers = np.zeros((0, len(qv)))
    chosen = [int(query_id)]  # excluded, not a result
    rows = []

    for rnd in range(1, k + 1):
        cref = ray.put((qv, centers, np.array(chosen, np.int64)))

        def winner(b: pa.Table) -> pa.Table:
            empty = pa.table({
                "id": pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
                "emb": pa.array([], pa.list_(pa.float64()))})
            if len(b) == 0:
                return empty
            qv_, c, ch = ray.get(cref)
            ids = b[id_col].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            m = _normalize(vec_matrix(b[vec_col]))
            rel = m @ qv_
            if len(c):
                score = lam * rel - (1.0 - lam) * (m @ c.T).max(axis=1)
            else:
                score = lam * rel
            ok = ~np.isin(ids, ch)
            if not ok.any():
                return empty
            oi = np.flatnonzero(ok)
            best = oi[np.lexsort((ids[oi], -score[oi]))[0]]
            return pa.table({
                "id": pa.array(ids[best:best + 1]),
                "score": pa.array(score[best:best + 1]),
                "emb": pa.array([m[best].tolist()],
                                pa.list_(pa.float64()))})

        parts = ds.map_batches(winner, batch_format="pyarrow") \
                  .to_pandas() \
                  .sort_values(["score", "id"], ascending=[False, True],
                               kind="mergesort")
        sel_id = int(parts["id"].iloc[0])
        centers = np.vstack([centers,
                             np.array(parts["emb"].iloc[0],
                                      np.float64)])
        chosen.append(sel_id)
        rows.append((rnd, sel_id,
                     round(float(parts["score"].iloc[0]), round_to)))
    return pd.DataFrame({"rnk": np.array([r for r, _, _ in rows],
                                         np.int64),
                         "vec_id": np.array([v for _, v, _ in rows],
                                            np.int64),
                         "score": np.array([s for _, _, s in rows],
                                           np.float64)})


def hard_negatives(ds, queries: np.ndarray, query_ids: np.ndarray,
                   query_labels: np.ndarray, k: int = 5,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   label_col: str = "label") -> pd.DataFrame:
    """Contrastive-training hard-negative mining: per query, the global
    cosine top-k among vectors with a DIFFERENT label (most-similar
    wrong-class examples).  Same broadcast + tie-aware partial-top-k
    shape as brute_force_topk; the label mask is applied inside each
    batch before the cut, so partials stay k-sized."""
    import ray

    qm = _normalize(np.asarray(queries, dtype=np.float64))
    qref = ray.put((qm, np.asarray(query_ids, dtype=np.int64),
                    np.asarray(query_labels, dtype=np.int64)))

    def partial(batch: pa.Table) -> pa.Table:
        q, qids, qlabs = ray.get(qref)
        vids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        labs = batch[label_col].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        m = _normalize(vec_matrix(batch[vec_col]))
        sims = q @ m.T
        out_q, out_v, out_s = [], [], []
        for i in range(len(qids)):
            cand = np.flatnonzero(labs != qlabs[i])
            if len(cand) == 0:
                continue
            s = sims[i, cand]
            order = np.lexsort((vids[cand], -s))[:min(k, len(cand))]
            sel = cand[order]
            out_q.append(np.full(len(sel), qids[i], dtype=np.int64))
            out_v.append(vids[sel])
            out_s.append(sims[i, sel])
        if not out_q:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "cosine": pa.array([], pa.float64())})
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            "neighbor_id": pa.array(np.concatenate(out_v)),
            "cosine": pa.array(np.concatenate(out_s), pa.float64())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    top = _topk_frame(parts["query_id"].to_numpy(),
                      parts["neighbor_id"].to_numpy(),
                      parts["cosine"].to_numpy(), k)
    top["rnk"] = top.groupby("query_id").cumcount() + 1
    return top[["query_id", "neighbor_id", "rnk", "cosine"]]
