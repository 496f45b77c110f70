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
