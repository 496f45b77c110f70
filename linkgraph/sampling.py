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
