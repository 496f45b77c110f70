"""Deterministic sampling operators for training-data pipelines:
per-group quota sampling (keep at most n per group) and stratified
fraction sampling (keep rate(stratum) of each stratum).  Both use hash
priorities instead of a seeded RNG, so runs are reproducible and
SQL-checkable.

Selection rule: within each group keep the n smallest
(sha256(str(id)), id) — a uniform-at-scale but fully deterministic
sample (the hex digest is the priority; id breaks the impossible tie).

Scale shape (100 TB): one stateless map_batches pass prunes each BLOCK
to its local per-group top-n (vectorized pandas sort + groupby head — no
per-group Python), so at most n * n_groups rows per block survive; the
exact global cut then runs on candidates only.  Below QUOTA_DRIVER_CAP
candidate rows the cut is a driver pandas groupby-head (the measured-
cheaper path at sf scale: every small shuffle costs ~2s fixed); above it
a distributed `groupby(key).map_groups` performs the same cut with each
group's candidate set already pruned to <= n * n_blocks rows (cost model:
per-group task overhead — fine for domain/lang-cardinality groups, see
CLAUDE.md shuffle notes).  Both paths are tested equal
(tests/test_sampling.py).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

QUOTA_DRIVER_CAP = 2_000_000  # candidate rows; ~100MB of (id, key, pri)

# stratified_sample: 32-bit hash space; per-stratum keep threshold =
# floor(rate * 2^32), compared against the first 8 hex chars of
# sha256(tag:id) — integer-exact on both the engine and SQL sides
_HASH_SPACE = 1 << 32


def stratified_sample(ds, id_col: str, strata_col: str,
                      rates: dict[str, float], default_rate: float,
                      tag: str = "strat"):
    """Deterministic per-stratum fraction sampling (training-data mixture
    reweighting): keep a row iff
        int(sha256(f"{tag}:{id}")[:8 hex], 16) < floor(rate(stratum) * 2^32).

    Embarrassingly parallel — ONE stateless map_batches, no shuffle, no
    RNG state; the sha prefix is uniform so the kept fraction converges
    to `rate` per stratum, and membership is stable across runs,
    partitionings and cluster sizes.  Returns a Dataset of the surviving
    rows (same columns as input)."""
    thresholds = {k: int(v * _HASH_SPACE) for k, v in rates.items()}
    default_thr = int(default_rate * _HASH_SPACE)

    def keep(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_pylist()
        strata = b[strata_col].to_pylist()
        hv = np.fromiter(
            (int(hashlib.sha256(f"{tag}:{v}".encode()).hexdigest()[:8], 16)
             for v in ids), np.int64, len(ids))
        thr = np.fromiter((thresholds.get(s, default_thr) for s in strata),
                          np.int64, len(strata))
        return b.filter(pa.array(hv < thr))

    return ds.map_batches(keep, batch_format="pyarrow")


def _with_priority(id_col: str):
    def fn(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_pylist()
        pri = [hashlib.sha256(str(v).encode()).hexdigest() for v in ids]
        return b.append_column("_pri", pa.array(pri, pa.string()))
    return fn


def _cut(pdf: pd.DataFrame, key: str, id_col: str, n: int) -> pd.DataFrame:
    pdf = pdf.sort_values(["_pri", id_col], kind="mergesort")
    return pdf.groupby(key, sort=False).head(n)


def quota_sample(ds, key: str, id_col: str, n: int,
                 driver_cap: int | None = None):
    """At most `n` rows per `key` group by (sha256(id), id) priority.
    Returns a pandas DataFrame[id_col, key] sorted by (key, id)."""
    from .io import from_pandas_clean
    from .runtime import tune_context

    cap = QUOTA_DRIVER_CAP if driver_cap is None else driver_cap
    keyed = ds.map_batches(_with_priority(id_col), batch_format="pyarrow")

    def local_prune(b: pa.Table) -> pa.Table:
        pdf = b.select([id_col, key, "_pri"]).to_pandas()
        return pa.Table.from_pandas(_cut(pdf, key, id_col, n),
                                    preserve_index=False)

    cand = keyed.map_batches(local_prune, batch_format="pyarrow") \
                .materialize()  # consumed once below, sized for a count
    if cand.count() <= cap:
        out = _cut(cand.to_pandas(), key, id_col, n)
    else:  # distributed exact cut over the pruned candidates
        tune_context()

        def group_cut(g: pd.DataFrame) -> pd.DataFrame:
            return _cut(g, key, id_col, n)

        out = cand.groupby(key).map_groups(
            group_cut, batch_format="pandas").to_pandas()
    return out[[id_col, key]].sort_values([key, id_col]) \
        .reset_index(drop=True)

# ---------------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis-Spirakis A-Res)
# ---------------------------------------------------------------------------
# priority = u ** (1 / w) with u = (hash52(id) + 1) / 2^52; keeping the k
# LARGEST priorities draws a weighted sample without replacement — the
# exact scheme a training-data mixer uses to sample documents
# length-proportionally without a shared RNG.  Deterministic (sha-derived
# u) and SQL-checkable (DuckDB pow matches libm to 1 ulp; selection only
# flips on priorities closer than ~1e-16, which the continuous u never
# produces at a rank boundary).
#
# Scale shape: ONE stateless map_batches pass emits each block's local
# top-k (vectorized lexsort) — at most k rows leave a block — and the
# <= k * n_blocks survivors merge in a tiny driver reduction.  No
# shuffle, no RNG state, partition-count invariant.

_U_SPACE = float(1 << 52)  # 13 hex chars: doubles are exact here


def _ws_priorities(ids, w, tag: str):
    u = np.fromiter(
        (int(hashlib.sha256(f"{tag}:{v}".encode()).hexdigest()[:13], 16)
         for v in ids), np.float64, len(ids))
    u = (u + 1.0) / _U_SPACE
    return u ** (1.0 / np.maximum(w, 1.0))


def weighted_sample(ds, id_col: str, weight_col: str, k: int,
                    tag: str = "ws") -> pd.DataFrame:
    """Top-k rows by Efraimidis-Spirakis priority u^(1/w) (ties -> id
    ascending).  Returns (id_col, w, pri) with pri rounded to 6; w is
    clamped to >= 1 so zero-weight rows sort last instead of dividing
    by zero."""

    def local_top(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_pylist()
        w = np.maximum(
            b[weight_col].to_numpy(zero_copy_only=False).astype(
                np.float64), 1.0)
        pri = _ws_priorities(ids, w, tag)
        idv = np.asarray(ids, np.int64)
        ordr = np.lexsort((idv, -pri))[:k]
        return pa.table({id_col: pa.array(idv[ordr], pa.int64()),
                         "w": pa.array(w[ordr].astype(np.int64)),
                         "pri": pa.array(pri[ordr], pa.float64())})

    cand = ds.map_batches(local_top, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(["pri", id_col], ascending=[False, True],
                            kind="mergesort").head(k)
    cand["pri"] = cand["pri"].round(6)
    return cand.reset_index(drop=True)


# ---------------------------------------------------------------------------
# Temperature-scaled domain mixture weights
# ---------------------------------------------------------------------------

MIX_ALPHA = 0.7  # the usual multilingual-LM temperature exponent


def mixture_weights(ds, group_col: str, text_col: str = "text",
                    alpha: float = MIX_ALPHA) -> pd.DataFrame:
    """Per-domain sampling weights for a training mixture:
    weight(d) = tokens(d)^alpha / sum_d' tokens(d')^alpha — the
    temperature-scaled (alpha < 1 upweights small domains) allocation
    used to mix sources into a training corpus.

    Scale shape: each block emits ONE partial row per domain it saw
    (vectorized bincount over flattened tokens), the driver merge is
    O(blocks * n_domains) — domains are a catalog-bounded set (crawls /
    datasets), never a per-row key, so no shuffle is needed for a pure
    aggregate (CLAUDE.md map-side-partials rule).  Returns
    (group_col, n_docs, n_tokens, weight) sorted by group, weight
    rounded to 6."""

    def partial(b: pa.Table) -> pa.Table:
        col = b[text_col]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        lists = pc.split_pattern_regex(col, r"\s+")
        flat = pc.list_flatten(lists)
        par = pc.list_parent_indices(lists).to_numpy(zero_copy_only=False)
        ok = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        per_doc = np.bincount(par[ok], minlength=b.num_rows)
        pdf = pd.DataFrame({
            "g": b[group_col].to_pandas(),
            "n_tokens": per_doc.astype(np.int64)})
        agg = pdf.groupby("g", sort=False).agg(
            n_docs=("n_tokens", "size"), n_tokens=("n_tokens", "sum"))
        agg = agg.reset_index()
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    tot = parts.groupby("g", sort=True).agg(
        n_docs=("n_docs", "sum"), n_tokens=("n_tokens", "sum")) \
        .reset_index().rename(columns={"g": group_col})
    scaled = np.power(tot["n_tokens"].to_numpy(np.float64), alpha)
    tot["weight"] = np.round(scaled / scaled.sum(), 6)
    tot["n_docs"] = tot["n_docs"].astype(np.int64)
    tot["n_tokens"] = tot["n_tokens"].astype(np.int64)
    return tot.reset_index(drop=True)


RESAMPLE_FRAC = 0.25


def mixture_resample(ds, group_col: str, id_col: str = "doc_id",
                     text_col: str = "text", alpha: float = MIX_ALPHA,
                     frac: float = RESAMPLE_FRAC,
                     tag: str = "mix") -> "object":
    """APPLY the temperature mixture: deterministically resample the
    corpus so each domain's expected token share follows
    mixture_weights (target tokens per domain = weight * frac * total),
    keep rate = min(1, target / tokens(domain)).  Rates derive from the
    ROUNDED (6dp) weights and exact integer token counts, so engine and
    oracle compute bit-identical doubles and integer thresholds; the
    keep decision is the stratified_sample sha-threshold rule — one
    stateless pass, no shuffle, stable membership.  Returns the kept
    (id_col, group_col) Dataset."""
    w = mixture_weights(ds, group_col=group_col, text_col=text_col,
                        alpha=alpha)
    total = float(w["n_tokens"].sum())
    rates = {}
    for g, wt, nt in zip(w[group_col], w["weight"], w["n_tokens"]):
        rates[g] = min(1.0, wt * frac * total / float(nt))
    sub = ds.map_batches(
        lambda b, cols=(id_col, group_col): b.select(list(cols)),
        batch_format="pyarrow")
    return stratified_sample(sub, id_col=id_col, strata_col=group_col,
                             rates=rates, default_rate=0.0, tag=tag)
