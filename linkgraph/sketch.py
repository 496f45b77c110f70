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

# ---------------------------------------------------------------------------
# HyperLogLog distinct-token sketch
# ---------------------------------------------------------------------------
# Complements KMV with the register-based sketch real systems ship when
# the state must stay O(m) bytes under UNION-merge (registers max-merge
# across shards / days / sources, which KMV's k-smallest set also does
# but at k*32 bytes).  Exactly SQL-checkable because every piece is
# integer: h = first 64 bits of sha256(token), register j = h >> (64-p),
# rho = leading-zero count of the remaining 58 bits + 1 (DuckDB:
# length(printf('%b', rem)) gives the exact MSB position).  Only the
# final estimate is float, rounded on both sides.

HLL_P = 6                      # 2^6 = 64 registers
_HLL_M = 1 << HLL_P
_HLL_REM_BITS = 64 - HLL_P
_HLL_REM_MASK = (1 << _HLL_REM_BITS) - 1


def _hll_alpha(m: int) -> float:
    # same literal expression as the SQL twin: identical IEEE ops
    return 0.7213 / (1 + 1.079 / m)


def _rho_of_rem(rem: np.ndarray) -> np.ndarray:
    """rho = leading zeros of the (64-p)-bit remainder + 1, exact:
    float log2 seeds the MSB position, integer fixup loops correct the
    within-1-ulp-of-a-power-of-two cases."""
    nbits = np.zeros(len(rem), np.int64)
    nz = rem > 0
    nbits[nz] = np.floor(np.log2(rem[nz].astype(np.float64))) \
        .astype(np.int64) + 1
    too_hi = nbits > 0
    while True:
        bad = nz & (rem >> np.maximum(nbits - 1, 0) == 0) & too_hi
        if not bad.any():
            break
        nbits[bad] -= 1
    bad = nz & (rem >> nbits > 0)
    while bad.any():
        nbits[bad] += 1
        bad = nz & (rem >> nbits > 0)
    return _HLL_REM_BITS - nbits + 1


def hll_distinct_tokens(ds, text_col: str = "text") -> pd.DataFrame:
    """HyperLogLog distinct-count estimate over whitespace tokens.
    Returns one row (m, n_zero, sum_rho, estimate): register count,
    empty registers, sum of register maxima (the integer sketch state —
    the value-hash anchor), and the HLL estimate with the standard
    small-range linear-counting correction, rounded to 3.

    Scale shape: one stateless map_batches pass emits <= m (j, rho)
    partial rows per block; the driver merge is a max-reduction over
    <= m * n_blocks rows.  Registers max-merge, so the sketch is also
    the per-shard union state a 100-TB corpus report needs."""

    def partial(b: pa.Table) -> pa.Table:
        col = b[text_col]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) \
            else col
        toks = pc.list_flatten(pc.split_pattern_regex(col, r"\s+"))
        toks = toks.filter(pc.not_equal(toks, ""))
        uniq = pc.unique(toks).to_pylist()
        if not uniq:
            return pa.table({"j": pa.array([], pa.int64()),
                             "rho": pa.array([], pa.int64())})
        hs = np.fromiter(
            (int(hashlib.sha256(t.encode()).hexdigest()[:16], 16)
             for t in uniq), np.uint64, len(uniq))
        j = (hs >> np.uint64(_HLL_REM_BITS)).astype(np.int64)
        rho = _rho_of_rem((hs & np.uint64(_HLL_REM_MASK)).astype(np.int64))
        pdf = pd.DataFrame({"j": j, "rho": rho})
        agg = pdf.groupby("j", sort=False)["rho"].max().reset_index()
        return pa.Table.from_pandas(agg, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    regs = np.zeros(_HLL_M, np.int64)
    if len(parts):
        merged = parts.groupby("j")["rho"].max()
        regs[merged.index.to_numpy()] = merged.to_numpy()
    n_zero = int((regs == 0).sum())
    z = float(np.sum(np.power(2.0, -regs.astype(np.float64))))
    est = _hll_alpha(_HLL_M) * _HLL_M * _HLL_M / z
    if est <= 2.5 * _HLL_M and n_zero > 0:
        est = _HLL_M * float(np.log(_HLL_M / float(n_zero)))
    return pd.DataFrame({
        "m": np.array([_HLL_M], np.int64),
        "n_zero": np.array([n_zero], np.int64),
        "sum_rho": np.array([int(regs.sum())], np.int64),
        "estimate": [round(est, 3)]})


def hll_sql(p: int = HLL_P) -> str:
    """DuckDB twin of hll_distinct_tokens: identical integer register
    math (printf('%b') length = exact MSB position), identical alpha
    literal and linear-counting branch, rounded to 3."""
    m = 1 << p
    rb = 64 - p
    return f"""
        WITH t AS (
          SELECT DISTINCT unnest(list_filter(
              regexp_split_to_array(text, '\\s+'), x -> x <> '')) AS token
          FROM documents
        ), h AS (
          SELECT ('0x' || substr(sha256(token), 1, 16))::UBIGINT AS h
          FROM t
        ), rr AS (
          SELECT (h >> {rb})::BIGINT AS j,
                 (h & {(1 << rb) - 1})::BIGINT AS rem
          FROM h
        ), rho AS (
          SELECT j, CASE WHEN rem = 0 THEN {rb + 1}
                    ELSE {rb} - length(printf('%b', rem)) + 1 END AS rho
          FROM rr
        ), reg AS (SELECT j, max(rho) AS mx FROM rho GROUP BY j),
        agg AS (
          SELECT {m} - count(*) AS nz,
                 coalesce(sum(mx), 0)::BIGINT AS sum_rho,
                 coalesce(sum(pow(2.0, -mx)), 0) + ({m} - count(*)) AS z
          FROM reg)
        SELECT {m}::BIGINT AS m, nz::BIGINT AS n_zero, sum_rho,
               round(CASE WHEN (0.7213 / (1 + 1.079 / {m})) * {m} * {m}
                              / z <= 2.5 * {m} AND nz > 0
                     THEN {m} * ln({m} / (1.0 * nz))
                     ELSE (0.7213 / (1 + 1.079 / {m})) * {m} * {m} / z
                     END, 3) AS estimate
        FROM agg
    """


# ---------------------------------------------------------------------------
# Bloom filter membership (set-membership sketch)
# ---------------------------------------------------------------------------

BLOOM_M = 8192   # bits
BLOOM_K = 4      # probes per element (4 x 16 hex chars of sha256)


def _bloom_positions(hexd: str) -> list[int]:
    return [int(hexd[16 * i:16 * i + 16], 16) % BLOOM_M
            for i in range(BLOOM_K)]


def bloom_membership(ds, probes: list[str],
                     text_col: str = "text") -> pd.DataFrame:
    """Build a Bloom filter over sha256(text) of the corpus and test
    `probes` (raw strings) for membership — the O(m)-bit set sketch a
    dedup/URL-seen/decontamination service keeps when exact sets don't
    fit.  Positions = 4 disjoint 64-bit slices of the sha % m, so the
    SQL twin is integer-exact (present iff every position appears in
    the corpus position SET).  Build is one stateless pass emitting
    <= m positions per block (deduped), OR-merged on the driver.
    Returns (probe, present, n_bits_set) sorted by probe."""

    def part(b: pa.Table) -> pa.Table:
        col = b[text_col]
        texts = (col.combine_chunks() if isinstance(col, pa.ChunkedArray)
                 else col).to_pylist()
        pos = set()
        for t in texts:
            hx = hashlib.sha256((t or "").encode()).hexdigest()
            pos.update(_bloom_positions(hx))
        arr = np.fromiter(pos, np.int64, len(pos))
        return pa.table({"pos": pa.array(np.sort(arr))})

    parts = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    bits = np.zeros(BLOOM_M, bool)
    if len(parts):
        bits[parts["pos"].unique()] = True
    n_set = int(bits.sum())
    rows = []
    for p in sorted(probes):
        hx = hashlib.sha256(p.encode()).hexdigest()
        present = all(bits[j] for j in _bloom_positions(hx))
        rows.append((p, int(present)))
    out = pd.DataFrame(rows, columns=["probe", "present"])
    out["present"] = out["present"].astype(np.int64)
    out["n_bits_set"] = np.int64(n_set)
    return out


def bloom_sql(absent_probes: list[str], m: int = BLOOM_M,
              k: int = BLOOM_K) -> str:
    """Integer-exact twin: corpus position set from the same sha
    slices; present probes self-derive in SQL (texts of doc_id < 10),
    absent probes are injected literals; a probe is present iff ALL of
    its positions appear in the corpus position set."""
    slices = " UNION ALL ".join(
        f"SELECT (('0x' || substr(h, {16 * i + 1}, 16))::UBIGINT "
        f"% {m})::BIGINT AS pos FROM h" for i in range(k))
    absent_rows = " UNION ALL ".join(
        f"SELECT '{p}' AS probe, sha256('{p}') AS h"
        for p in absent_probes)
    return f"""
        WITH h AS (SELECT sha256(text) AS h FROM documents),
        pos AS (SELECT DISTINCT pos FROM ({slices})),
        nb AS (SELECT count(*)::BIGINT AS n_bits_set FROM pos),
        pr AS (SELECT text AS probe, sha256(text) AS h FROM documents
               WHERE doc_id < 10
               UNION ALL {absent_rows}),
        ppx AS (SELECT pr.probe, (('0x' || substr(pr.h, 16 * i + 1, 16))
                       ::UBIGINT % {m})::BIGINT AS pos
                FROM pr, unnest([{', '.join(map(str, range(k)))}])
                     AS t(i)),
        hit AS (SELECT probe,
                       CASE WHEN count(*) = sum(CASE WHEN pos IN
                            (SELECT pos FROM pos) THEN 1 ELSE 0 END)
                       THEN 1 ELSE 0 END AS present
                FROM ppx GROUP BY probe)
        SELECT hit.probe, CAST(hit.present AS BIGINT) AS present,
               nb.n_bits_set
        FROM hit, nb ORDER BY probe
    """


# ---------------------------------------------------------------------------
# Count-Min sketch: mergeable heavy-hitter frequency estimation
# ---------------------------------------------------------------------------

CM_D = 4        # rows (independent hash functions)
CM_W = 1024     # columns per row
# row salts injected as literals on both sides (pi-digit nothing-up-my-
# sleeve constants, same convention as the seeded LSH planes)
CM_SALTS = (0x243F6A8885A308D3, 0x13198A2E03707344,
            0xA4093822299F31D0, 0x082EFA98EC4E6C89)
CM_GOLD = 0x9E3779B97F4A7C15


def cm_cols(h: np.ndarray, j: int, w: int = CM_W) -> np.ndarray:
    """Column of word-hash h in sketch row j: ((h XOR salt_j) * GOLD
    mod 2^64) mod W — exact twin in pipelines._cm_sql."""
    with np.errstate(over="ignore"):
        x = (np.asarray(h, np.uint64) ^ np.uint64(CM_SALTS[j])) \
            * np.uint64(CM_GOLD)
    return (x % np.uint64(w)).astype(np.int64)


def count_min_sketch(docs_ds, text_col: str = "text",
                     d: int = CM_D, w: int = CM_W) -> np.ndarray:
    """Build a d x w Count-Min sketch of the corpus token stream
    (lowercased whitespace words, text._batch_word_hashes).  Map-side
    partial sketches per batch (np.bincount per row), merged by a tiny
    driver reduce — the register table is BOUNDED (d*w ints) no matter
    the corpus size, the canonical mergeable-sketch shape (same as the
    KMV/HLL sketches above).  Returns the int64 register matrix."""
    from .text import _batch_word_hashes

    def partial(b: pa.Table) -> pa.Table:
        _, h, _ = _batch_word_hashes(b[text_col].to_pylist())
        regs = np.empty(d * w, np.int64)
        for j in range(d):
            regs[j * w:(j + 1) * w] = np.bincount(cm_cols(h, j, w),
                                                  minlength=w)
        return pa.table({"r": pa.array(np.arange(d * w, dtype=np.int64)),
                         "c": pa.array(regs)})

    parts = docs_ds.map_batches(partial, batch_format="pyarrow") \
        .to_pandas()
    regs = (parts.groupby("r")["c"].sum()
            .reindex(range(d * w), fill_value=0)
            .to_numpy().reshape(d, w))
    return regs


def cm_estimate(regs: np.ndarray, h: np.ndarray) -> np.ndarray:
    """Point-query the sketch for word hashes h: min over rows."""
    d, w = regs.shape
    est = np.full(len(h), np.iinfo(np.int64).max, np.int64)
    for j in range(d):
        est = np.minimum(est, regs[j, cm_cols(h, j, w)])
    return est


def _int_avalanche(x: np.ndarray) -> np.ndarray:
    """Murmur3 finalizer over a non-negative int64 key (the matching /
    neighbors priority chain; exact HUGEINT twin in pipelines)."""
    with np.errstate(over="ignore"):
        z = np.asarray(x).astype(np.uint64)
        z ^= z >> np.uint64(33)
        z *= np.uint64(0xFF51AFD7ED558CCD)
        z ^= z >> np.uint64(29)
        z *= np.uint64(0xC4CEB9FE1A85EC53)
        z ^= z >> np.uint64(32)
    return z


def cm_int_sketch(ds, col: str, d: int = CM_D, w: int = CM_W) -> np.ndarray:
    """Count-Min sketch of an integer key column: map-side partial
    register matrices (BOUNDED d*w ints regardless of table size),
    merged by a tiny driver reduce — same mergeable shape as
    count_min_sketch, with the murmur-finalizer int hash instead of
    the word fold."""

    def partial(b: pa.Table) -> pa.Table:
        h = _int_avalanche(b[col].to_numpy(zero_copy_only=False)
                           .astype(np.int64))
        regs = np.empty(d * w, np.int64)
        for j in range(d):
            regs[j * w:(j + 1) * w] = np.bincount(cm_cols(h, j, w),
                                                  minlength=w)
        return pa.table({"r": pa.array(np.arange(d * w, dtype=np.int64)),
                         "c": pa.array(regs)})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return (parts.groupby("r")["c"].sum()
            .reindex(range(d * w), fill_value=0)
            .to_numpy().reshape(d, w))


def cm_inner_product(a: np.ndarray, b: np.ndarray) -> int:
    """Join-size (inner-product) estimate from two CM sketches built
    with the same (d, w, salts): min over rows of the register dot
    product (Cormode & Muthukrishnan 2005, §4.2) — an upper bound on
    |A JOIN B| that never under-estimates."""
    assert a.shape == b.shape
    return int(min(int(np.dot(a[j].astype(object), b[j].astype(object)))
                   for j in range(a.shape[0])))


# ---------------------------------------------------------------------------
# Mergeable hash-sample quantile sketch: a deterministic bounded-memory
# alternative to the exact distributed quantiles (quantiles.py) — the
# sample is the k rows with the smallest sha256(id) priority, a pure
# order statistic that merges across blocks/nodes/days bit-for-bit
# (the KMV trick applied to quantile estimation).
# ---------------------------------------------------------------------------

QSKETCH_K = 1024
QSKETCH_QS = (0.5, 0.9, 0.99)


def hash_sample_quantiles(ds, id_col: str = "event_id",
                          value_col: str = "value", k: int = QSKETCH_K,
                          qs=QSKETCH_QS,
                          round_to: int = 6) -> pd.DataFrame:
    """Quantile estimates from the deterministic bottom-k-by-sha256(id)
    sample: est(q) = sorted_sample_values[floor(q * (n - 1))].  Output
    (q, est), one row per requested quantile.

    Scale shape: ONE stateless map_batches pass emits each block's k
    smallest (priority, id, value) rows — a block never ships more than
    k rows — and the <= k * n_blocks survivors merge in one tiny driver
    reduction.  No shuffle, no sort of the data; the same sample (and
    so the same estimate) falls out on any partitioning, cluster size,
    or streaming merge order."""
    import hashlib as _h

    def partial(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        vals = b[value_col].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        pri = np.array([_h.sha256(str(int(i)).encode()).hexdigest()
                        for i in ids], dtype=object)
        order = np.lexsort((ids, pri))[:k]
        return pa.table({"pri": pa.array(pri[order], pa.string()),
                         "id": pa.array(ids[order]),
                         "v": pa.array(vals[order])})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if len(parts) == 0:
        return pd.DataFrame({"q": pd.Series([], dtype="float64"),
                             "est": pd.Series([], dtype="float64")})
    samp = parts.sort_values(["pri", "id"], kind="mergesort").head(k)
    v = np.sort(samp["v"].to_numpy(np.float64))
    n = len(v)
    return pd.DataFrame({
        "q": np.array(qs, np.float64),
        "est": [round(float(v[int(np.floor(q * (n - 1)))]), round_to)
                for q in qs]})


def hash_sample_quantiles_sql(k: int = QSKETCH_K,
                              qs=QSKETCH_QS) -> str:
    """Oracle: the identical bottom-k sample (ORDER BY sha256 hex,
    id LIMIT k) and the identical floor(q * (n-1)) rank pick."""
    vals = ", ".join(f"({q})" for q in qs)
    return f"""
        WITH s AS (SELECT value, event_id,
                          sha256(CAST(event_id AS VARCHAR)) AS pri
                   FROM events ORDER BY pri, event_id LIMIT {k}),
        n AS (SELECT count(*) AS n FROM s),
        r AS (SELECT value,
                     row_number() OVER (ORDER BY value) AS rn FROM s),
        qs(q) AS (VALUES {vals})
        SELECT qs.q, round(r.value, 6) AS est
        FROM qs CROSS JOIN n
        JOIN r ON r.rn = floor(qs.q * (n.n - 1))::BIGINT + 1
        ORDER BY qs.q
    """


def kmv_intersection(ds, type_a: str, type_b: str,
                     key: str = "user_id",
                     type_col: str = "event_type",
                     k: int = KMV_K) -> pd.DataFrame:
    """Theta-sketch-style set-intersection estimate from two KMV
    sketches: distinct `key`s seen under type_a vs type_b.  theta = the
    smaller of the two k-th-minimum digests (hex-string order == U
    order); registers below theta are a rate-theta uniform sample of
    each set, so |A ∩ B| ~= |common registers below theta| / U(theta),
    exact when both sketches hold their full sets.  One stateless pass
    emits per-type bottom-k digest partials (a block ships <= 2k rows);
    the driver merge is a tiny order-statistic fold.  All state is
    sha256 order statistics — bit-exact in SQL."""

    def partial(b: pa.Table) -> pa.Table:
        tv = b[type_col].to_numpy(zero_copy_only=False)
        kv = b[key].to_numpy(zero_copy_only=False).astype(np.int64)
        out_t, out_h = [], []
        for t in (type_a, type_b):
            ids = np.unique(kv[tv == t])
            dig = np.sort(np.array(
                [hashlib.sha256(str(i).encode()).hexdigest()
                 for i in ids]))[:k]
            out_t.extend([t] * len(dig))
            out_h.extend(dig)
        return pa.table({"t": pa.array(out_t, pa.string()),
                         "hx": pa.array(out_h, pa.string())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    regs = {}
    for t in (type_a, type_b):
        regs[t] = np.sort(
            parts.loc[parts["t"] == t, "hx"].unique())[:k]
    full_a, full_b = len(regs[type_a]) < k, len(regs[type_b]) < k
    hi = "f" * 64
    kth_a = hi if full_a else regs[type_a][-1]
    kth_b = hi if full_b else regs[type_b][-1]
    theta_hex = min(kth_a, kth_b)
    common = np.intersect1d(regs[type_a], regs[type_b])
    below = common[common < theta_hex] if theta_hex != hi else common
    u = 1.0 if theta_hex == hi else int(theta_hex[:16], 16) / _HEX_SPACE
    est_a = _estimate(kth_a if not full_a else "",
                      len(regs[type_a]), k) if not full_a \
        else float(len(regs[type_a]))
    est_b = _estimate(kth_b if not full_b else "",
                      len(regs[type_b]), k) if not full_b \
        else float(len(regs[type_b]))
    return pd.DataFrame({
        "type_a": [type_a], "type_b": [type_b],
        "k": np.array([k], np.int64),
        "est_a": [round(est_a, 3)], "est_b": [round(est_b, 3)],
        "est_intersection": [round(len(below) / u, 3)]})


def kmv_intersection_sql(type_a: str, type_b: str,
                         k: int = KMV_K) -> str:
    """DuckDB twin of kmv_intersection: same registers, same hex-order
    theta, same estimate formulas."""
    hi = "f" * 64

    def reg(t, name):
        return (f"{name} AS (SELECT sha256(user_id::VARCHAR) AS hx "
                f"FROM (SELECT DISTINCT user_id FROM events "
                f"WHERE event_type = '{t}') ORDER BY hx LIMIT {k})")

    def kth(name):
        return (f"(SELECT CASE WHEN count(*) < {k} THEN '{hi}' "
                f"ELSE max(hx) END FROM {name})")

    def est(name):
        return (f"(SELECT CASE WHEN count(*) < {k} "
                f"THEN count(*)::DOUBLE ELSE ({k} - 1) / "
                f"(('0x' || substr(max(hx), 1, 16))::UBIGINT "
                f"/ 18446744073709551616.0) END FROM {name})")

    return f"""
        WITH {reg(type_a, 'ra')}, {reg(type_b, 'rb')},
        th AS (SELECT least({kth('ra')}, {kth('rb')}) AS theta),
        common AS (SELECT hx FROM ra INTERSECT SELECT hx FROM rb),
        below AS (SELECT count(*)::DOUBLE AS c FROM common, th
                  WHERE theta = '{hi}' OR hx < theta)
        SELECT '{type_a}' AS type_a, '{type_b}' AS type_b,
               {k}::BIGINT AS k,
               round({est('ra')}, 3) AS est_a,
               round({est('rb')}, 3) AS est_b,
               round(below.c / (SELECT CASE WHEN theta = '{hi}' THEN 1.0
                     ELSE ('0x' || substr(theta, 1, 16))::UBIGINT
                          / 18446744073709551616.0 END FROM th), 3)
                   AS est_intersection
        FROM below
    """


def hll_daily_users(ds, key: str = "user_id",
                    ts: str = "ts") -> pd.DataFrame:
    """Per-day HLL distinct-active-user estimates — the mergeable
    streaming-sketch form of DAU: one stateless pass emits <= m (day,
    j, rho) partial rows per block (registers max-merge), the driver
    folds a days x m register matrix and applies the standard estimator
    with linear-counting correction per day.  The register state is the
    per-shard/per-day union state a dashboard keeps at 100 TB."""
    day_us = 86_400_000_000

    def partial(b: pa.Table) -> pa.Table:
        us = pc.cast(b[ts], pa.int64()).to_numpy(zero_copy_only=False)
        ids = b[key].to_numpy(zero_copy_only=False).astype(np.int64)
        day = us // day_us
        pdf = pd.DataFrame({"day": day, "id": ids}).drop_duplicates()
        if not len(pdf):
            return pa.table({"day": pa.array([], pa.int64()),
                             "j": pa.array([], pa.int64()),
                             "rho": pa.array([], pa.int64())})
        hs = np.fromiter(
            (int(hashlib.sha256(str(i).encode()).hexdigest()[:16], 16)
             for i in pdf["id"]), np.uint64, len(pdf))
        j = (hs >> np.uint64(_HLL_REM_BITS)).astype(np.int64)
        rho = _rho_of_rem((hs & np.uint64(_HLL_REM_MASK))
                          .astype(np.int64))
        out = pd.DataFrame({"day": pdf["day"].to_numpy(np.int64),
                            "j": j, "rho": rho}) \
            .groupby(["day", "j"], sort=False)["rho"].max().reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    if not len(parts):
        return pd.DataFrame({
            "day": pd.Series([], dtype=np.int64),
            "n_zero": pd.Series([], dtype=np.int64),
            "sum_rho": pd.Series([], dtype=np.int64),
            "estimate": pd.Series([], dtype=np.float64)})
    merged = parts.groupby(["day", "j"])["rho"].max().reset_index()
    rows = []
    for day, g in merged.groupby("day"):
        regs = np.zeros(_HLL_M, np.int64)
        regs[g["j"].to_numpy()] = g["rho"].to_numpy()
        n_zero = int((regs == 0).sum())
        z = float(np.sum(np.power(2.0, -regs.astype(np.float64))))
        est = _hll_alpha(_HLL_M) * _HLL_M * _HLL_M / z
        if est <= 2.5 * _HLL_M and n_zero > 0:
            est = _HLL_M * float(np.log(_HLL_M / float(n_zero)))
        rows.append((int(day), n_zero, int(regs.sum()), round(est, 3)))
    out = pd.DataFrame(rows, columns=["day", "n_zero", "sum_rho",
                                      "estimate"])
    for c in ("day", "n_zero", "sum_rho"):
        out[c] = out[c].astype(np.int64)
    return out


def hll_daily_sql(p: int = HLL_P) -> str:
    """DuckDB twin of hll_daily_users (the hll_sql register math
    grouped by epoch day)."""
    m = 1 << p
    rb = 64 - p
    return f"""
        WITH u AS (
          SELECT DISTINCT epoch_us(ts) // 86400000000 AS day, user_id
          FROM events
        ), h AS (
          SELECT day, ('0x' || substr(sha256(user_id::VARCHAR), 1, 16))
                 ::UBIGINT AS h
          FROM u
        ), rr AS (
          SELECT day, (h >> {rb})::BIGINT AS j,
                 (h & {(1 << rb) - 1})::BIGINT AS rem
          FROM h
        ), rho AS (
          SELECT day, j, CASE WHEN rem = 0 THEN {rb + 1}
                 ELSE {rb} - length(printf('%b', rem)) + 1 END AS rho
          FROM rr
        ), reg AS (SELECT day, j, max(rho) AS mx
                   FROM rho GROUP BY day, j),
        agg AS (
          SELECT day, {m} - count(*) AS nz,
                 coalesce(sum(mx), 0)::BIGINT AS sum_rho,
                 coalesce(sum(pow(2.0, -mx)), 0) + ({m} - count(*)) AS z
          FROM reg GROUP BY day)
        SELECT day::BIGINT AS day, nz::BIGINT AS n_zero, sum_rho,
               round(CASE WHEN (0.7213 / (1 + 1.079 / {m})) * {m} * {m}
                              / z <= 2.5 * {m} AND nz > 0
                     THEN {m} * ln({m} / (1.0 * nz))
                     ELSE (0.7213 / (1 + 1.079 / {m})) * {m} * {m} / z
                     END, 3) AS estimate
        FROM agg
    """
