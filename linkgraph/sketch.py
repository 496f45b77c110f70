"""Distributed cardinality sketch: KMV (k-minimum-values) distinct-count
estimation — the sketch family a 100-TB corpus uses for "how many
distinct tokens / shas / urls" without a full distinct shuffle.

KMV instead of HyperLogLog because it is exactly SQL-checkable: the
sketch state is the k lexicographically-smallest sha256 digests of the
distinct values, a pure order statistic any engine reproduces
bit-for-bit (DuckDB: ORDER BY sha256(v) LIMIT k).  Estimate:

    distinct ~= (k - 1) / U(kth)    where U maps the k-th smallest
    digest's first 16 hex chars into [0, 1)

with the exact count returned when fewer than k distinct hashes exist.

Scale shape: ONE stateless map_batches pass emits each block's k
smallest distinct digests (vectorized np.unique — a block never ships
more than k rows), the <= k * n_blocks survivors merge in one tiny
driver reduction.  No groupby, no shuffle, no driver pass over values.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

KMV_K = 256
_HEX_SPACE = float(2 ** 64)


def _estimate(kth_hex: str, n_kept: int, k: int) -> float:
    if n_kept < k:           # saw everything: exact
        return float(n_kept)
    u = int(kth_hex[:16], 16) / _HEX_SPACE
    return (k - 1) / u


def kmv_distinct_tokens(ds, text_col: str = "text",
                        k: int = KMV_K) -> pd.DataFrame:
    """Estimate the number of distinct whitespace tokens in a corpus.
    Returns one row: (k, kth, est_distinct) — kth is the k-th smallest
    sha256(token) hex digest (the sketch's verifiable state), rounded
    estimate to 3."""

    def partial(b: pa.Table) -> pa.Table:
        toks = pc.list_flatten(
            pc.split_pattern_regex(b[text_col].combine_chunks()
                                   if isinstance(b[text_col],
                                                 pa.ChunkedArray)
                                   else b[text_col], r"\s+"))
        toks = toks.filter(pc.not_equal(toks, ""))
        uniq = pc.unique(toks).to_pylist()
        digests = np.sort(np.array(
            [hashlib.sha256(t.encode()).hexdigest() for t in uniq]))[:k]
        return pa.table({"hx": pa.array(digests, pa.string())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    merged = np.sort(parts["hx"].unique())[:k]
    if len(merged) == 0:
        return pd.DataFrame({"k": [k], "kth": [""],
                             "est_distinct": [0.0]})
    kth = merged[-1]
    return pd.DataFrame({
        "k": np.array([k], np.int64), "kth": [kth],
        "est_distinct": [round(_estimate(kth, len(merged), k), 3)]})


def kmv_sql(k: int = KMV_K) -> str:
    """DuckDB twin: same digests, same order statistic, same estimate
    formula (UBIGINT -> DOUBLE cast is the same IEEE rounding as
    Python's int -> float)."""
    return f"""
        WITH t AS (
          SELECT DISTINCT unnest(list_filter(
              regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS token
          FROM documents
        ), h AS (
          SELECT sha256(token) AS hx FROM t
        ), kth AS (
          SELECT hx FROM h ORDER BY hx LIMIT {k}
        )
        SELECT {k}::BIGINT AS k, max(hx) AS kth,
               round(CASE WHEN count(*) < {k} THEN count(*)::DOUBLE
                     ELSE ({k} - 1) /
                          (('0x' || substr(max(hx), 1, 16))::UBIGINT
                           / 18446744073709551616.0) END, 3)
                   AS est_distinct
        FROM kth
    """
