"""Distributed dense vertex-id assignment.

Gemini addresses vertices by dense ids 0..|V|-1 (uint32 in the reference,
core/type.hpp:24 — widened to int64/uint64 here per the north rule). Our
input keys are strings ((repo, path) for file vertices), so we need a
scalable string-key -> dense-id map:

  1. distinct keys            (groupby shuffle, combiner-style)
  2. hash-bucket each key     (deterministic sha-based bucket)
  3. per-bucket counts -> driver (B rows only) -> prefix sum -> base offsets
  4. within each bucket: sort keys, id = base[bucket] + rank  (map_groups)

Driver memory is O(B); everything else is distributed. The assignment is
deterministic and independent of block layout / parallelism: id order is
(bucket, key) lexicographic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from .hashing import add_bucket

# NB: not NUL — pandas 2.x string concat silently drops \x00, and keys
# round-trip through pandas in map_groups stages. \x1f never occurs in
# repo/path values.
KEY_SEP = "\x1f"


def _concat_key(batch: pa.Table, key_cols: list[str], out: str = "__key") -> pa.Table:
    import pyarrow.compute as pc
    if len(key_cols) == 1:
        keyed = pc.cast(batch[key_cols[0]], pa.string())
    else:
        arrs = [pc.cast(batch[c], pa.string()) for c in key_cols]
        keyed = pc.binary_join_element_wise(*arrs, KEY_SEP)
    return batch.append_column(out, keyed)


def assign_dense_ids(ds, key_cols: list[str], n_buckets: int = 256,
                     id_col: str = "vid"):
    """Return (mapping_ds, n_vertices).

    mapping_ds has columns (__key: string, vid: int64) with vid dense in
    [0, n_vertices). `__key` is the KEY_SEP-joined key columns.
    """
    keyed = ds.map_batches(
        lambda b: _concat_key(b, key_cols).select(["__key"]),
        batch_format="pyarrow",
    )
    distinct = keyed.groupby("__key").count()  # (__key, count()); shuffle w/ combiner
    # materialized: consumed by the bucket-count pass AND the numbering
    # map_groups — without it the distinct-keys shuffle runs twice
    distinct = distinct.map_batches(
        lambda b: add_bucket(b.select(["__key"]), ["__key"], n_buckets),
        batch_format="pyarrow",
    ).materialize()

    # per-bucket counts: map-side bincount partials + driver merge
    # (O(n_buckets) each) — no second hash shuffle
    def bucket_partial(b: pa.Table) -> pa.Table:
        c = np.bincount(b["bucket"].to_numpy(zero_copy_only=False),
                        minlength=n_buckets)
        return pa.table({"bucket": pa.array(np.arange(n_buckets,
                                                      dtype=np.int64)),
                         "n": pa.array(c.astype(np.int64))})

    counts = distinct.map_batches(bucket_partial,
                                  batch_format="pyarrow").to_pandas()
    if len(counts) == 0 or counts["n"].sum() == 0:
        import ray.data as rd
        empty = pa.table({"__key": pa.array([], pa.string()),
                          id_col: pa.array([], pa.int64())})
        return rd.from_arrow(empty), 0
    base = np.zeros(n_buckets, dtype=np.int64)
    np.add.at(base, counts["bucket"].to_numpy(), counts["n"].to_numpy())
    total = int(base.sum())
    base = np.concatenate([[0], np.cumsum(base)[:-1]])
    base_ref = ray.put(base)

    def number(group: pd.DataFrame) -> pd.DataFrame:
        b = ray.get(base_ref)
        group = group.sort_values("__key", kind="mergesort").reset_index(drop=True)
        start = b[int(group["bucket"].iloc[0])]
        return pd.DataFrame(
            {"__key": group["__key"],
             id_col: np.arange(start, start + len(group), dtype=np.int64)}
        )

    # materialized: breaks lineage sharing with the downstream attach_ids
    # join (diamond-deadlock guard) and pins the key->id map for reuse
    mapping = distinct.groupby("bucket").map_groups(
        number, batch_format="pandas").materialize()
    return mapping, total


def attach_ids(ds, mapping, key_cols: list[str], id_col: str = "vid",
               num_partitions: int = 16):
    """Join the dense-id mapping back onto `ds` (hash-partitioned join)."""
    from .runtime import tune_context
    tune_context()
    keyed = ds.map_batches(lambda b: _concat_key(b, key_cols),
                           batch_format="pyarrow")
    joined = keyed.join(mapping, join_type="inner",
                        num_partitions=num_partitions, on=("__key",))
    return joined.drop_columns(["__key"])
