"""Hashing stages: content sha256, 64-bit key hashes.

sha256 is the per-row invariant the driver checks against the reference
(BASELINE.json.input_hint: "content sha256 equality"), and the join key
for shared-content edge derivation (SURVEY.md §2.4).

All stages are stateless `map_batches` functions over Arrow batches.
hashlib releases the GIL per call and runs its C core per row; the loop
is over a zero-copy Arrow string column. Empty/null content hashes to
the sha256 of the empty string, preserved (filtering is a separate,
explicit stage).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def add_sha256(batch: pa.Table, col: str = "content", out: str = "sha256") -> pa.Table:
    """Append hex sha256 of a utf8 column. Stateless map_batches stage."""
    vals = batch[col]
    shas = [
        hashlib.sha256((v or "").encode()).hexdigest()
        for v in vals.to_pylist()
    ]
    return batch.append_column(out, pa.array(shas, pa.string()))


def sha256_stage(col: str = "content", out: str = "sha256"):
    """Return a map_batches-ready function bound to column names."""
    def fn(batch: pa.Table) -> pa.Table:
        return add_sha256(batch, col, out)
    return fn


_FNV_OFFSET = np.uint64(14695981039346656037)
_FNV_PRIME = np.uint64(1099511628211)


def hash64_str(values: list[str]) -> np.ndarray:
    """Deterministic 64-bit hash of strings (sha256-truncate; stable across
    processes, unlike Python's salted hash()). Used for bucket routing."""
    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        out[i] = np.frombuffer(
            hashlib.sha256((v or "").encode()).digest()[:8], dtype=np.uint64
        )[0]
    return out


def add_bucket(batch: pa.Table, key_cols: list[str], n_buckets: int,
               out: str = "bucket") -> pa.Table:
    """Append a deterministic hash bucket of the concatenated key columns."""
    if len(key_cols) == 1:
        keys = batch[key_cols[0]].to_pylist()
    else:
        # vectorized multi-key concat (same kernel ids.py uses) — only the
        # sha256 itself needs the per-row C-core loop
        parts = [pc.fill_null(pc.cast(batch[c], pa.string()), "")
                 for c in key_cols]
        joined = pc.binary_join_element_wise(*parts, "\x00")
        keys = joined.to_pylist()
    h = hash64_str(keys) % np.uint64(n_buckets)
    return batch.append_column(out, pa.array(h.astype(np.int64), pa.int64()))


def drop_empty(batch: pa.Table, col: str = "content") -> pa.Table:
    """Filter rows with null/empty `col` (vectorized arrow kernel)."""
    keep = pc.and_kleene(
        pc.is_valid(batch[col]), pc.not_equal(batch[col], pa.scalar(""))
    )
    return batch.filter(pc.fill_null(keep, False))
