"""Link prediction: Adamic-Adar scores over the undirected simple graph
(north-rule training-data addition — similarity/graph-feature operator;
GeminiGraph has no link-prediction toolkit).

AA(u, w) = sum over common neighbors v of 1 / ln(deg(v)); computed for
every distance-2 pair, exactly, as a Ray Data pipeline:

  1. canonical simple edges (u<v, dedup) and symmetric adjacency rows;
  2. per-center wedge expansion: groupby(center % WEDGE_BUCKETS)
     .map_groups — the same coarse-bucket segment arithmetic as
     algos/triangles._wedges_bucket (one vectorized kernel per bucket,
     not one task per vertex); each wedge (u, w) centered at v carries
     weight 1 / ln(deg(v)) where deg(v) = its segment length;
  3. groupby(u, w) sum -> exact scores (combiner-friendly);
  4. round(6) THEN distributed sort + limit for top-k — rounding before
     ordering keeps the cut identical to the SQL oracle under float
     summation-order ulps.

Cost is O(sum deg(v)^2) wedge rows — the inherent size of the exact
result (same bound as triangle counting's un-oriented wedge set); they
stream through the shuffle, never driver-materialized.  For corpora with
extreme hubs a degree cap on centers is the standard approximation seam
(not applied here: the driver oracle demands exactness).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

WEDGE_BUCKETS = 64


def _sym_rows(b: pa.Table) -> pa.Table:
    s = pc.cast(b["src"], pa.int64()).combine_chunks()
    d = pc.cast(b["dst"], pa.int64()).combine_chunks()
    return pa.table({"c": pa.concat_arrays([s, d]),
                     "n": pa.concat_arrays([d, s])})


def _aa_wedges_bucket(g: pd.DataFrame) -> pd.DataFrame:
    """All unordered neighbor pairs for every center in one coarse hash
    bucket, each weighted 1/ln(deg(center)); deg = segment length (the
    adjacency rows of a center ARE its neighbor set)."""
    empty = pd.DataFrame({"u": np.empty(0, np.int64),
                          "w": np.empty(0, np.int64),
                          "aa": np.empty(0, np.float64)})
    c = g["c"].to_numpy(np.int64)
    n = g["n"].to_numpy(np.int64)
    order = np.lexsort((n, c))
    c, n = c[order], n[order]
    starts = np.flatnonzero(np.concatenate([[True], c[1:] != c[:-1]]))
    lens = np.diff(np.concatenate([starts, [len(c)]]))
    seg = np.repeat(np.arange(len(starts)), lens)
    pos = np.arange(len(c)) - starts[seg]
    reps = lens[seg] - pos - 1
    total = int(reps.sum())
    if total == 0:
        return empty
    i_idx = np.repeat(np.arange(len(c)), reps)
    csum = np.cumsum(reps) - reps
    j_idx = i_idx + 1 + (np.arange(total) - csum[i_idx])
    # deg >= 2 wherever pairs exist (reps = 0 for singleton segments);
    # guard the log anyway so length-1 segments don't emit a divide warning
    lf = lens.astype(np.float64)
    weight = np.where(lens >= 2, 1.0 / np.log(np.maximum(lf, 2.0)), 0.0)
    return pd.DataFrame({"u": n[i_idx], "w": n[j_idx],
                         "aa": weight[seg[i_idx]]})


# edge sets up to this size score on one driver numpy kernel (exact,
# same pair/weight rule); larger graphs run the distributed pipeline —
# the standard size-gate (triangles.DRIVER_TRI_CAP rule)
DRIVER_AA_CAP = 500_000


def _adamic_adar_local(pdf: pd.DataFrame, k: int) -> pd.DataFrame:
    """In-process exact kernel: canonical edges -> symmetric segments ->
    weighted neighbor pairs -> composite-key reduceat sum -> top-k."""
    s = pdf["src"].to_numpy(np.int64)
    d = pdf["dst"].to_numpy(np.int64)
    keep = s != d
    lo = np.minimum(s[keep], d[keep])
    hi = np.maximum(s[keep], d[keep])
    empty = pd.DataFrame({"u": np.empty(0, np.int64),
                          "w": np.empty(0, np.int64),
                          "aa": np.empty(0, np.float64)})
    if len(lo) == 0:
        return empty
    edges = np.unique((lo << 32) | hi)
    lo, hi = edges >> 32, edges & 0xFFFFFFFF
    c = np.concatenate([lo, hi])
    n = np.concatenate([hi, lo])
    order = np.lexsort((n, c))
    c, n = c[order], n[order]
    starts = np.flatnonzero(np.concatenate([[True], c[1:] != c[:-1]]))
    lens = np.diff(np.concatenate([starts, [len(c)]]))
    seg = np.repeat(np.arange(len(starts)), lens)
    pos = np.arange(len(c)) - starts[seg]
    reps = lens[seg] - pos - 1
    total = int(reps.sum())
    if total == 0:
        return empty
    i_idx = np.repeat(np.arange(len(c)), reps)
    csum = np.cumsum(reps) - reps
    j_idx = i_idx + 1 + (np.arange(total) - csum[i_idx])
    lf = lens.astype(np.float64)
    wt = np.where(lens >= 2, 1.0 / np.log(np.maximum(lf, 2.0)), 0.0)
    key = (n[i_idx].astype(np.int64) << 32) | n[j_idx]
    ks = np.argsort(key, kind="stable")
    key_s = key[ks]
    w_s = wt[seg[i_idx]][ks]
    st = np.flatnonzero(np.concatenate([[True], key_s[1:] != key_s[:-1]]))
    aa = np.round(np.add.reduceat(w_s, st), 6)
    uu = key_s[st] >> 32
    ww = key_s[st] & 0xFFFFFFFF
    sel = np.lexsort((ww, uu, -aa))[:k]
    return pd.DataFrame({"u": uu[sel].astype(np.int64),
                         "w": ww[sel].astype(np.int64),
                         "aa": aa[sel]})


def adamic_adar_topk(edges_ds, k: int = 20, num_partitions: int = 8):
    """Top-k distance-2 pairs by Adamic-Adar score.  Returns a Ray
    Dataset (u, w, aa) with u < w, aa rounded to 6, ordered by
    (aa desc, u asc, w asc), k rows."""
    from ..io import from_pandas_clean

    edges_ds = edges_ds.materialize()
    if edges_ds.count() <= DRIVER_AA_CAP:
        pdf = edges_ds.to_pandas()
        if len(pdf) == 0 or max(pdf["src"].max(), pdf["dst"].max()) < 2 ** 31:
            out = _adamic_adar_local(pdf, k) if len(pdf) else pd.DataFrame(
                {"u": np.empty(0, np.int64), "w": np.empty(0, np.int64),
                 "aa": np.empty(0, np.float64)})
            return from_pandas_clean(out)
    return _adamic_adar_distributed(edges_ds, k, num_partitions)


def _adamic_adar_distributed(edges_ds, k: int, num_partitions: int):
    from ray.data.aggregate import Sum

    from ..runtime import tune_context

    tune_context()
    canon = (edges_ds.map_batches(
        lambda b: pa.table({
            "src": pc.min_element_wise(pc.cast(b["src"], pa.int64()),
                                       pc.cast(b["dst"], pa.int64())),
            "dst": pc.max_element_wise(pc.cast(b["src"], pa.int64()),
                                       pc.cast(b["dst"], pa.int64()))}),
        batch_format="pyarrow")
        .filter(expr="src != dst")
        .groupby(["src", "dst"]).count()
        .select_columns(["src", "dst"]))
    sym = canon.map_batches(_sym_rows, batch_format="pyarrow")
    bucketed = sym.map_batches(
        lambda b: b.append_column("wb", pa.array(
            (b["c"].to_numpy(zero_copy_only=False) % WEDGE_BUCKETS)
            .astype(np.int64))),
        batch_format="pyarrow")
    wedges = bucketed.groupby("wb").map_groups(_aa_wedges_bucket,
                                               batch_format="pandas")
    scores = wedges.groupby(["u", "w"]).aggregate(
        Sum("aa", alias_name="aa"))
    rounded = scores.map_batches(
        lambda b: pa.table({"u": b["u"], "w": b["w"],
                            "aa": pc.round(b["aa"], 6)}),
        batch_format="pyarrow").materialize()
    if rounded.count() == 0:  # schema-less empty Dataset breaks sort
        from ..io import from_pandas_clean

        return from_pandas_clean(pd.DataFrame({
            "u": np.empty(0, np.int64), "w": np.empty(0, np.int64),
            "aa": np.empty(0, np.float64)}))
    return rounded.sort(["aa", "u", "w"],
                        descending=[True, False, False]).limit(k)


# --------------------------------------------------- multi-score widening
#
# The classic neighborhood link predictors share the SAME wedge set as
# Adamic-Adar (Liben-Nowell & Kleinberg 2003): for each distance-2 pair
# (u, w),
#   cn  = |N(u) & N(w)|                       (common neighbors, exact int)
#   aa  = sum 1/ln(deg(c)) over common c      (Adamic-Adar)
#   jac = cn / (deg(u) + deg(w) - cn)         (Jaccard of neighborhoods;
#         the denominator counts u/w themselves when adjacent — the
#         standard set-of-neighbors definition, no self-exclusion)
#   pref = deg(u) * deg(w)                    (preferential attachment)
# so one pipeline computes all four: the wedge kernel emits per-pair
# (cn, aa) partials pre-reduced inside each coarse center bucket, a
# second coarse PAIR-bucket shuffle merges them (never a per-pair-key
# hash aggregate), and degrees attach via the gated lookup join
# (joins.attach_by_key: broadcast under ATTACH_BROADCAST_CAP, bucketed
# co-group above).  Ranking: cn DESC, aa DESC (round-6 BEFORE ordering),
# u ASC, w ASC — the integer primary key keeps the cut float-safe.

def _lp_wedges_bucket(g: pd.DataFrame) -> pd.DataFrame:
    """Per-pair (cn, aa) PARTIALS for one coarse center bucket, reduced
    by composite pair key before leaving the task (combiner)."""
    empty = pd.DataFrame({"u": np.empty(0, np.int64),
                          "w": np.empty(0, np.int64),
                          "cn": np.empty(0, np.int64),
                          "aa": np.empty(0, np.float64),
                          "ra": np.empty(0, np.float64)})
    c = g["c"].to_numpy(np.int64)
    n = g["n"].to_numpy(np.int64)
    order = np.lexsort((n, c))
    c, n = c[order], n[order]
    starts = np.flatnonzero(np.concatenate([[True], c[1:] != c[:-1]]))
    lens = np.diff(np.concatenate([starts, [len(c)]]))
    seg = np.repeat(np.arange(len(starts)), lens)
    pos = np.arange(len(c)) - starts[seg]
    reps = lens[seg] - pos - 1
    total = int(reps.sum())
    if total == 0:
        return empty
    i_idx = np.repeat(np.arange(len(c)), reps)
    csum = np.cumsum(reps) - reps
    j_idx = i_idx + 1 + (np.arange(total) - csum[i_idx])
    lf = lens.astype(np.float64)
    wt = np.where(lens >= 2, 1.0 / np.log(np.maximum(lf, 2.0)), 0.0)
    rw = 1.0 / lf  # resource allocation: 1/deg(center)
    # lexsort on the raw (u, w) columns — no packed key, so full-range
    # int64 ids are safe on the distributed path
    u_, w_ = n[i_idx], n[j_idx]
    ks = np.lexsort((w_, u_))
    u_s, w_s = u_[ks], w_[ks]
    a_s = wt[seg[i_idx]][ks]
    r_s = rw[seg[i_idx]][ks]
    st = np.flatnonzero(np.concatenate(
        [[True], (u_s[1:] != u_s[:-1]) | (w_s[1:] != w_s[:-1])]))
    cn = np.diff(np.concatenate([st, [len(u_s)]])).astype(np.int64)
    aa = np.add.reduceat(a_s, st)
    ra = np.add.reduceat(r_s, st)
    return pd.DataFrame({"u": u_s[st], "w": w_s[st], "cn": cn, "aa": aa,
                         "ra": ra})


def _lp_pair_merge(g: pd.DataFrame) -> pd.DataFrame:
    """Merge per-center-bucket pair partials inside one coarse pair
    bucket (vectorized composite-key reduce; lexsort, no packed key)."""
    u = g["u"].to_numpy(np.int64)
    w = g["w"].to_numpy(np.int64)
    o = np.lexsort((w, u))
    u_s, w_s = u[o], w[o]
    new = (u_s[1:] != u_s[:-1]) | (w_s[1:] != w_s[:-1])
    st = np.flatnonzero(np.concatenate([[True], new]))
    seg_id = np.cumsum(np.concatenate([[0], new.astype(np.int64)]))
    cn = np.bincount(seg_id, weights=g["cn"].to_numpy(np.float64)[o]) \
        .astype(np.int64)
    aa = np.bincount(seg_id, weights=g["aa"].to_numpy(np.float64)[o])
    ra = np.bincount(seg_id, weights=g["ra"].to_numpy(np.float64)[o])
    return pd.DataFrame({"u": u_s[st], "w": w_s[st], "cn": cn, "aa": aa,
                         "ra": ra})


def _lp_finish(b: pa.Table) -> pa.Table:
    du = b["degree_u"].to_numpy(zero_copy_only=False).astype(np.int64)
    dw = b["degree_w"].to_numpy(zero_copy_only=False).astype(np.int64)
    cn = b["cn"].to_numpy(zero_copy_only=False).astype(np.int64)
    aa = b["aa"].to_numpy(zero_copy_only=False)
    ra = b["ra"].to_numpy(zero_copy_only=False)
    return pa.table({
        "u": b["u"], "w": b["w"], "cn": pa.array(cn),
        "aa": pa.array(np.round(aa, 6)),
        "ra": pa.array(np.round(ra, 6)),
        "jac": pa.array(np.round(cn / (du + dw - cn), 6)),
        "pref": pa.array(du * dw)})


_LP_EMPTY = {"u": np.empty(0, np.int64), "w": np.empty(0, np.int64),
             "cn": np.empty(0, np.int64), "aa": np.empty(0, np.float64),
             "ra": np.empty(0, np.float64),
             "jac": np.empty(0, np.float64), "pref": np.empty(0, np.int64)}


def _lp_local(pdf: pd.DataFrame, k: int) -> pd.DataFrame:
    """Driver twin of the distributed plan: same pair set, same scores,
    same rounding/ordering (tested equal)."""
    s = pdf["src"].to_numpy(np.int64)
    d = pdf["dst"].to_numpy(np.int64)
    keep = s != d
    lo = np.minimum(s[keep], d[keep])
    hi = np.maximum(s[keep], d[keep])
    if len(lo) == 0:
        return pd.DataFrame(_LP_EMPTY)
    edges = np.unique((lo << 32) | hi)
    lo, hi = edges >> 32, edges & 0xFFFFFFFF
    c = np.concatenate([lo, hi]).astype(np.int64)
    n = np.concatenate([hi, lo]).astype(np.int64)
    part = _lp_wedges_bucket(pd.DataFrame({"c": c, "n": n}))
    if len(part) == 0:
        return pd.DataFrame(_LP_EMPTY)
    # degrees: every endpoint appears as a center in the symmetric rows
    vs, deg = np.unique(c, return_counts=True)
    uu = part["u"].to_numpy(np.int64)
    ww = part["w"].to_numpy(np.int64)
    cn = part["cn"].to_numpy(np.int64)
    aa = np.round(part["aa"].to_numpy(np.float64), 6)
    ra = np.round(part["ra"].to_numpy(np.float64), 6)
    du = deg[np.searchsorted(vs, uu)]
    dw = deg[np.searchsorted(vs, ww)]
    jac = np.round(cn / (du + dw - cn), 6)
    pa_ = (du * dw).astype(np.int64)
    sel = np.lexsort((ww, uu, -aa, -cn))[:k]
    return pd.DataFrame({"u": uu[sel], "w": ww[sel], "cn": cn[sel],
                         "aa": aa[sel], "ra": ra[sel], "jac": jac[sel],
                         "pref": pa_[sel]})


def link_prediction_topk(edges_ds, k: int = 20):
    """Top-k distance-2 pairs by (cn desc, aa desc, u, w) with all four
    neighborhood scores.  Size-gated: driver kernel under DRIVER_AA_CAP
    edges, distributed twin above (coarse center buckets -> coarse pair
    buckets -> gated degree attach -> sort/limit)."""
    from ..io import from_pandas_clean

    edges_ds = edges_ds.materialize()
    n_edges = edges_ds.count()
    if n_edges <= DRIVER_AA_CAP:
        pdf = edges_ds.to_pandas()
        if len(pdf) == 0 or max(pdf["src"].max(), pdf["dst"].max()) < 2 ** 31:
            return from_pandas_clean(_lp_local(pdf, k))
    return _lp_distributed(edges_ds, n_edges, k)


def _lp_distributed(edges_ds, n_edges: int, k: int):
    from ..io import from_pandas_clean
    from ..joins import attach_by_key
    from ..runtime import tune_context
    from .triangles import _vertex_degrees, canon_dedup_ds, n_buckets_for

    tune_context()
    # 2 consumers (wedges + degrees): materialize the shared node
    canon = canon_dedup_ds(edges_ds, n_edges).materialize()
    nb = n_buckets_for(2 * n_edges)

    def sym_tag(b: pa.Table) -> pa.Table:
        t = _sym_rows(b)
        return t.append_column("wb", pa.array(
            (t["c"].to_numpy(zero_copy_only=False) % nb).astype(np.int64)))

    parts = (canon.map_batches(sym_tag, batch_format="pyarrow")
             .groupby("wb").map_groups(_lp_wedges_bucket,
                                       batch_format="pandas")
             .materialize())
    n_parts = parts.count()
    if n_parts == 0:
        return from_pandas_clean(pd.DataFrame(_LP_EMPTY))
    nb2 = n_buckets_for(n_parts)

    def pb_tag(b: pa.Table) -> pa.Table:
        from .triangles import _pair_bucket

        return b.append_column("pb", pa.array(_pair_bucket(
            b["u"].to_numpy(zero_copy_only=False).astype(np.int64),
            b["w"].to_numpy(zero_copy_only=False).astype(np.int64), nb2)))

    scored = (parts.map_batches(pb_tag, batch_format="pyarrow")
              .groupby("pb").map_groups(_lp_pair_merge,
                                        batch_format="pandas"))
    deg = _vertex_degrees(canon, n_edges)
    attached = attach_by_key(scored, deg, ["u", "w"],
                             key="v", value="degree")
    finished = attached.map_batches(_lp_finish, batch_format="pyarrow")
    return finished.sort(["cn", "aa", "u", "w"],
                         descending=[True, True, False, False]).limit(k)


NEG_K = 5           # negatives per source
NEG_PROBES = 36     # deterministic probe budget per source
NEG_EDGE_BROADCAST_CAP = 20_000_000  # same scale as triangles' cap


def _neg_finalize(z: np.ndarray) -> np.ndarray:
    """Murmur3 finalizer (the repo's shared avalanche; uint64 wrap)."""
    with np.errstate(over="ignore"):
        z = z.astype(np.uint64).copy()
        z ^= z >> np.uint64(33)
        z *= np.uint64(0xFF51AFD7ED558CCD)
        z ^= z >> np.uint64(29)
        z *= np.uint64(0xC4CEB9FE1A85EC53)
        z ^= z >> np.uint64(32)
    return z


def negative_samples(edges_ds, k: int = NEG_K, probes: int = NEG_PROBES,
                     num_partitions: int = 8):
    """Deterministic negative sampling for link-prediction / GNN
    training data: for every vertex of the canonical edge set, the
    first `k` probe candidates that are NOT neighbors (and not self),
    where probe j's candidate is murmur_finalize(src * 2^32 + j) mod
    n_vertices — a fixed hash sequence, so both the sample AND its SQL
    twin are reproducible with no RNG state.  Duplicate candidates keep
    their first probe; sources that exhaust the probe budget emit fewer
    than k rows (deterministic, mirrored by the oracle).  Returns
    (src, rnk, neg), rnk 1-based in probe order.

    Shape: candidate expansion is per-batch vectorized (a source's
    whole probe sequence stays in its batch); membership against the
    edge set is size-gated — the sorted packed key array broadcast once
    under NEG_EDGE_BROADCAST_CAP (ids < 2^31), making the whole
    operator shuffle-free, else ONE coarse pair-bucket merge for the
    membership bits plus ONE src-bucket pass for the rank cut."""
    import ray

    from ..io import from_pandas_clean
    from .triangles import _pair_bucket, canon_dedup_ds, n_buckets_for

    edges_ds = edges_ds.materialize()
    n_e = edges_ds.count()
    if n_e == 0:
        return from_pandas_clean(pd.DataFrame(
            {"src": pd.Series([], dtype=np.int64),
             "rnk": pd.Series([], dtype=np.int64),
             "neg": pd.Series([], dtype=np.int64)}))
    canon = canon_dedup_ds(edges_ds, n_e).materialize()
    nv = int(max(canon.max("src"), canon.max("dst"))) + 1

    def verts(b: pa.Table) -> pa.Table:
        u = np.unique(np.concatenate(
            [b["src"].to_numpy(zero_copy_only=False),
             b["dst"].to_numpy(zero_copy_only=False)])).astype(np.int64)
        return pa.table({"v": pa.array(u)})

    # distinct vertices via one coarse bucket (unbounded domain rule)
    nb = n_buckets_for(2 * canon.count())
    vs = canon.map_batches(verts, batch_format="pyarrow") \
        .map_batches(lambda b: b.append_column(
            "vb", pa.array((b["v"].to_numpy(zero_copy_only=False)
                            % nb).astype(np.int64))),
            batch_format="pyarrow") \
        .groupby("vb").map_groups(
            lambda g: pd.DataFrame(
                {"v": np.unique(g["v"].to_numpy(np.int64))}),
            batch_format="pandas").materialize()

    def expand(b: pa.Table) -> pa.Table:
        v = b["v"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.repeat(v, probes)
        j = np.tile(np.arange(probes, dtype=np.int64), len(v))
        with np.errstate(over="ignore"):
            z = (src.astype(np.uint64) * np.uint64(1 << 32)
                 + j.astype(np.uint64))
        cand = (_neg_finalize(z) % np.uint64(nv)).astype(np.int64)
        return pa.table({"src": pa.array(src), "j": pa.array(j),
                         "cand": pa.array(cand)})

    cands = vs.map_batches(expand, batch_format="pyarrow")

    def cut(df: pd.DataFrame) -> pd.DataFrame:
        """Dedupe-by-first-probe + first-k rank cut, vectorized; rows
        must contain each source's full surviving probe list."""
        s = df["src"].to_numpy(np.int64)
        j = df["j"].to_numpy(np.int64)
        c = df["cand"].to_numpy(np.int64)
        o = np.lexsort((j, c, s))
        s, j, c = s[o], j[o], c[o]
        first = np.concatenate(
            [[True], (s[1:] != s[:-1]) | (c[1:] != c[:-1])])
        s, j, c = s[first], j[first], c[first]
        o = np.lexsort((j, s))
        s, j, c = s[o], j[o], c[o]
        starts = np.flatnonzero(np.concatenate([[True],
                                                s[1:] != s[:-1]]))
        lens = np.diff(np.concatenate([starts, [len(s)]]))
        pos = np.arange(len(s)) - np.repeat(starts, lens)
        keep = pos < k
        return pd.DataFrame({"src": s[keep],
                             "rnk": (pos[keep] + 1).astype(np.int64),
                             "neg": c[keep]})

    mx = nv - 1
    if canon.count() <= NEG_EDGE_BROADCAST_CAP and mx < 2 ** 31:
        keys = np.sort(np.concatenate(
            [(t["src"].to_numpy(zero_copy_only=False).astype(np.uint64)
              << np.uint64(32))
             | t["dst"].to_numpy(zero_copy_only=False).astype(np.uint64)
             for t in canon.iter_batches(batch_format="pyarrow",
                                         batch_size=None)] or
            [np.empty(0, np.uint64)]))
        kref = ray.put(keys)

        def filter_rank(b: pa.Table) -> pa.Table:
            ks = ray.get(kref)
            s = b["src"].to_numpy(zero_copy_only=False)
            j = b["j"].to_numpy(zero_copy_only=False)
            c = b["cand"].to_numpy(zero_copy_only=False)
            lo = np.minimum(s, c).astype(np.uint64)
            hi = np.maximum(s, c).astype(np.uint64)
            wk = (lo << np.uint64(32)) | hi
            ok = s != c
            if len(ks):
                p = np.minimum(np.searchsorted(ks, wk), len(ks) - 1)
                ok &= ks[p] != wk
            out = cut(pd.DataFrame({"src": s[ok], "j": j[ok],
                                    "cand": c[ok]}))
            return pa.Table.from_pandas(out, preserve_index=False)

        return cands.map_batches(filter_rank, batch_format="pyarrow")

    # coarse-bucket membership + src-bucket rank cut (64-bit ids /
    # giant edge sets)
    cb = n_buckets_for(canon.count())

    def tag_probe(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        c = b["cand"].to_numpy(zero_copy_only=False)
        lo = np.minimum(s, c)
        hi = np.maximum(s, c)
        return pa.table({"src": pa.array(s, pa.int64()),
                         "j": b["j"], "cand": pa.array(c, pa.int64()),
                         "lo": pa.array(lo, pa.int64()),
                         "hi": pa.array(hi, pa.int64()),
                         "ub": pa.array(_pair_bucket(lo, hi, cb))})

    def tag_edge(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        z = np.full(len(s), -1, np.int64)
        return pa.table({"src": pa.array(z), "j": pa.array(z),
                         "cand": pa.array(z),
                         "lo": pa.array(s, pa.int64()),
                         "hi": pa.array(d, pa.int64()),
                         "ub": pa.array(_pair_bucket(s, d, cb))})

    def member_filter(g: pd.DataFrame) -> pd.DataFrame:
        is_e = g["src"].to_numpy() < 0
        e = g.loc[is_e, ["lo", "hi"]]
        p = g.loc[~is_e, ["src", "j", "cand", "lo", "hi"]]
        p = p[p["src"] != p["cand"]]
        if len(p) == 0:
            return pd.DataFrame({"src": np.empty(0, np.int64),
                                 "j": np.empty(0, np.int64),
                                 "cand": np.empty(0, np.int64)})
        m = p.merge(e.assign(hit=1), on=["lo", "hi"], how="left")
        m = m[m["hit"].isna()]
        return m[["src", "j", "cand"]].astype(np.int64)

    surv = cands.map_batches(tag_probe, batch_format="pyarrow") \
        .union(canon.map_batches(tag_edge, batch_format="pyarrow")) \
        .groupby("ub").map_groups(member_filter, batch_format="pandas")

    nb3 = n_buckets_for(canon.count())
    return surv.map_batches(
        lambda b: b.append_column("sb", pa.array(
            (b["src"].to_numpy(zero_copy_only=False) % nb3)
            .astype(np.int64))), batch_format="pyarrow") \
        .groupby("sb").map_groups(
            lambda g: cut(g[["src", "j", "cand"]]),
            batch_format="pandas")
