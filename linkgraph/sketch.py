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


def kmv_distinct_by_group(ds, group_col: str = "lang",
                          text_col: str = "text",
                          k: int = KMV_K) -> pd.DataFrame:
    """Per-group KMV: distinct-token estimate per value of `group_col`
    (the per-language cardinality profile a corpus report needs).
    Same scale shape as kmv_distinct_tokens — each block emits at most
    k digests PER GROUP it saw, the driver merge is
    O(groups * k * blocks) — plus the same exactness property below k.
    Returns (group, k, kth, est_distinct), one row per group."""

    def partial(b: pa.Table) -> pa.Table:
        col = b[text_col]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray)             else col
        toks = pc.split_pattern_regex(col, r"\s+")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        keep = pc.not_equal(flat, "")
        groups = np.repeat(b[group_col].to_numpy(zero_copy_only=False),
                           lens)[keep.to_numpy(zero_copy_only=False)]
        words = flat.filter(keep).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"g": groups, "w": words}).drop_duplicates()
        outs_g, outs_h = [], []
        for g, grp in df.groupby("g", sort=True):
            digests = np.sort(np.array(
                [hashlib.sha256(t.encode()).hexdigest()
                 for t in grp["w"]]))[:k]
            outs_g.append(np.full(len(digests), g, dtype=object))
            outs_h.append(digests)
        gg = np.concatenate(outs_g) if outs_g else np.empty(0, object)
        hh = np.concatenate(outs_h) if outs_h else np.empty(0, object)
        return pa.table({"g": pa.array(gg, pa.string()),
                         "hx": pa.array(hh, pa.string())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    rows = []
    for g, grp in parts.groupby("g", sort=True):
        merged = np.sort(grp["hx"].unique())[:k]
        kth = merged[-1]
        rows.append((g, k, kth,
                     round(_estimate(kth, len(merged), k), 3)))
    out = pd.DataFrame(rows, columns=[group_col, "k", "kth",
                                      "est_distinct"])
    if len(out):
        out["k"] = out["k"].astype(np.int64)
    else:
        out = pd.DataFrame({group_col: pd.Series([], dtype=str),
                            "k": pd.Series([], dtype=np.int64),
                            "kth": pd.Series([], dtype=str),
                            "est_distinct": pd.Series([], dtype=float)})
    return out


def kmv_by_group_sql(group_col: str = "lang", k: int = KMV_K) -> str:
    """DuckDB twin of kmv_distinct_by_group (per-group order
    statistics via row_number)."""
    return f"""
        WITH t AS (
          SELECT DISTINCT {group_col}, unnest(list_filter(
              regexp_split_to_array(text, '\\s+'), x -> x <> ''))
              AS token
          FROM documents
        ), h AS (
          SELECT {group_col}, sha256(token) AS hx FROM t
        ), r AS (
          SELECT {group_col}, hx, row_number() OVER
                 (PARTITION BY {group_col} ORDER BY hx) AS rn
          FROM h
        ), kth AS (
          SELECT {group_col}, hx FROM r WHERE rn <= {k}
        )
        SELECT {group_col}, {k}::BIGINT AS k, max(hx) AS kth,
               round(CASE WHEN count(*) < {k} THEN count(*)::DOUBLE
                     ELSE ({k} - 1) /
                          (('0x' || substr(max(hx), 1, 16))::UBIGINT
                           / 18446744073709551616.0) END, 3)
                   AS est_distinct
        FROM kth GROUP BY {group_col}
    """


# ----------------------------------------------------------- count-min

CMS_DEPTH = 4
CMS_WIDTH = 1024
# fixed row seeds (xor'd into the word hash before the finalizer)
CMS_SEEDS = (0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
             0x165667B19E3779F9, 0x27D4EB2F165667C5)
CMS_PROBES = ("batch", "data", "join", "merge", "spark", "the",
              "zzz-not-in-corpus")


def _finalize(z: np.ndarray) -> np.ndarray:
    """Murmur3 finalizer (the shared avalanche, uint64 wraparound)."""
    with np.errstate(over="ignore"):
        z = z.astype(np.uint64).copy()
        z ^= z >> np.uint64(33)
        z *= np.uint64(0xFF51AFD7ED558CCD)
        z ^= z >> np.uint64(29)
        z *= np.uint64(0xC4CEB9FE1A85EC53)
        z ^= z >> np.uint64(32)
    return z


def _cms_cell(h: np.ndarray, j: int, width: int) -> np.ndarray:
    return (_finalize(h ^ np.uint64(CMS_SEEDS[j]))
            % np.uint64(width)).astype(np.int64)


def cms_token_counts(ds, probes=CMS_PROBES, text_col: str = "text",
                     width: int = CMS_WIDTH) -> pd.DataFrame:
    """Count-Min sketch over the corpus token stream (lowercased
    whitespace words, the shared 64-bit word hash) + point estimates
    for a fixed probe list: (token, est, true_n), est >= true_n always
    (the classic overestimate bound).

    The sketch is depth x width int64 cells (32 KB) — per-batch
    bincount partials sum on the DRIVER, no shuffle at any corpus
    size.  True counts ride the same pass (tiny probe set broadcast).
    The SQL twin reproduces every cell count exactly (probe hashes and
    cells injected as literals, same convention as the LSH planes).
    """
    from .text import _avalanche_poly, _batch_word_hashes

    d, w = CMS_DEPTH, width
    codes = np.frombuffer("".join(probes).encode("utf-32-le"),
                          dtype=np.uint32)
    lens = np.array([len(p) for p in probes], dtype=np.int64)
    starts = np.cumsum(lens) - lens
    ph = _avalanche_poly(codes, starts, lens)
    ph_sorted = np.sort(ph)

    def partial(b: pa.Table) -> pa.Table:
        _, h, _ = _batch_word_hashes(b[text_col].to_pylist())
        idx = np.concatenate(
            [j * w + _cms_cell(h, j, w) for j in range(d)]) \
            if len(h) else np.empty(0, np.int64)
        cells = np.bincount(idx, minlength=d * w).astype(np.int64)
        p = np.minimum(np.searchsorted(ph_sorted, h),
                       max(len(ph_sorted) - 1, 0))
        hits = h[(len(ph_sorted) > 0) & (ph_sorted[p] == h)] \
            if len(h) else np.empty(0, np.uint64)
        tc = np.array([(hits == x).sum() for x in ph], dtype=np.int64)
        return pa.table({"cells": pa.array([cells.tolist()],
                                           pa.list_(pa.int64())),
                         "tc": pa.array([tc.tolist()],
                                        pa.list_(pa.int64()))})

    cells = np.zeros(d * w, np.int64)
    true_n = np.zeros(len(probes), np.int64)
    for t in ds.map_batches(partial, batch_format="pyarrow") \
               .iter_batches(batch_format="pyarrow", batch_size=None):
        for row in t["cells"].to_pylist():
            cells += np.asarray(row, dtype=np.int64)
        for row in t["tc"].to_pylist():
            true_n += np.asarray(row, dtype=np.int64)

    est = np.array([min(cells[j * w + int(_cms_cell(
        np.array([ph[i]], np.uint64), j, w)[0])] for j in range(d))
        for i in range(len(probes))], dtype=np.int64)
    out = pd.DataFrame({"token": list(probes), "est": est,
                        "true_n": true_n})
    return out.sort_values("token").reset_index(drop=True)


def cms_sql(probes=CMS_PROBES, width: int = CMS_WIDTH) -> str:
    """SQL twin: word-occurrence hashes via the shared prefix fold
    (words here are < 16 chars, where the 16-round fold == the
    full-length fold), 4 finalizer chains (one per seed), exact cell
    counts, probe hashes/cells as Python-computed literals."""
    from .text import _avalanche_poly

    codes = np.frombuffer("".join(probes).encode("utf-32-le"),
                          dtype=np.uint32)
    lens = np.array([len(p) for p in probes], dtype=np.int64)
    starts = np.cumsum(lens) - lens
    ph = _avalanche_poly(codes, starts, lens)
    d, w = CMS_DEPTH, width

    fnv = 1099511628211
    w64 = "18446744073709551616::HUGEINT"

    def mulmod(x, c):
        lo = c & 0xFFFFFFFF
        hi = c >> 32
        return (f"(({x} % 4294967296) * {lo} + "
                f"((({x} // 4294967296) * {lo} + ({x} % 4294967296) * {hi})"
                f" % 4294967296) * 4294967296::HUGEINT) % {w64}")

    fold = "0::HUGEINT"
    for jj in range(16):
        fold = (f"(CASE WHEN length(w) > {jj} THEN (({fold}) * {fnv} + "
                f"unicode(substr(w,{jj + 1},1))) % {w64} "
                f"ELSE ({fold}) END)")

    cell_rows = []
    for j in range(d):
        seed = CMS_SEEDS[j]
        z = f"xor(h, {seed}::UBIGINT)"
        z = f"xor({z}, ({z}) >> 33)"
        z = f"({mulmod(f'({z})::HUGEINT', 0xFF51AFD7ED558CCD)})::UBIGINT"
        z = f"xor({z}, ({z}) >> 29)"
        z = f"({mulmod(f'({z})::HUGEINT', 0xC4CEB9FE1A85EC53)})::UBIGINT"
        z = f"xor({z}, ({z}) >> 32)"
        cell_rows.append(
            f"SELECT {j} AS j, (({z}) % {w})::BIGINT AS cell FROM wh")
    cells_union = " UNION ALL ".join(cell_rows)

    probe_vals = ",\n               ".join(
        f"('{p}'," + ", ".join(
            str(int(_cms_cell(np.array([ph[i]], np.uint64), j, w)[0]))
            for j in range(d)) + ")"
        for i, p in enumerate(probes))

    est_exprs = " , ".join(
        f"coalesce((SELECT c FROM counts WHERE j = {j} AND "
        f"cell = pr.c{j}), 0)" for j in range(d))

    return f"""
        WITH words AS MATERIALIZED (
          SELECT w FROM (
            SELECT unnest(string_split_regex(lower(text),
                   '[ \t\n]+')) AS w
            FROM documents) WHERE length(w) > 0),
        wh0 AS (SELECT w, ({fold})::UBIGINT AS h0 FROM words),
        wh1 AS (SELECT w, xor(h0, h0 >> 33) AS h1 FROM wh0),
        wh2 AS (SELECT w,
                ({mulmod('h1::HUGEINT', 0xFF51AFD7ED558CCD)})::UBIGINT
                AS h2 FROM wh1),
        wh3 AS (SELECT w, xor(h2, h2 >> 29) AS h3 FROM wh2),
        wh4 AS (SELECT w,
                ({mulmod('h3::HUGEINT', 0xC4CEB9FE1A85EC53)})::UBIGINT
                AS h4 FROM wh3),
        wh AS MATERIALIZED (SELECT w, xor(h4, h4 >> 32) AS h FROM wh4),
        cells AS MATERIALIZED ({cells_union}),
        counts AS MATERIALIZED (
          SELECT j, cell, count(*)::BIGINT AS c
          FROM cells GROUP BY j, cell),
        pr(token, {', '.join(f'c{j}' for j in range(d))}) AS (
          VALUES {probe_vals})
        SELECT pr.token,
               least({est_exprs}) AS est,
               (SELECT count(*) FROM words ww
                WHERE ww.w = pr.token)::BIGINT AS true_n
        FROM pr ORDER BY pr.token
    """
