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
                     id_col: str = "vid", approx_rows: int | None = None):
    """Return (mapping_ds, n_vertices).

    mapping_ds has columns (__key: string, vid: int64) with vid dense in
    [0, n_vertices). `__key` is the KEY_SEP-joined key columns.

    Below BROADCAST_MAP_CAP rows (pass the known count via approx_rows)
    the distinct + numbering runs as map-side per-batch uniques merged
    on the driver — no shuffle; the id order (sorted keys) is identical
    to the distributed path with one bucket, and deterministic in both.
    """
    keyed = ds.map_batches(
        lambda b: _concat_key(b, key_cols).select(["__key"]),
        batch_format="pyarrow",
    )
    if approx_rows is not None and approx_rows <= BROADCAST_MAP_CAP:
        from .hashing import hash64_str
        from .io import from_pandas_clean

        parts = keyed.map_batches(
            lambda b: pa.table(
                {"__key": pa.array(pd.unique(b["__key"].to_pandas()))}),
            batch_format="pyarrow").to_pandas()
        uniq = parts["__key"].unique()
        if len(uniq) == 0:
            import ray.data as rd
            empty = pa.table({"__key": pa.array([], pa.string()),
                              id_col: pa.array([], pa.int64())})
            return rd.from_arrow(empty), 0
        # SAME id order as the distributed path: (hash bucket, key)
        bucket = (hash64_str(list(uniq)) % np.uint64(n_buckets)).astype(
            np.int64)
        order = np.lexsort((uniq, bucket))
        pdf = pd.DataFrame({"__key": uniq[order],
                            id_col: np.arange(len(uniq), dtype=np.int64)})
        return from_pandas_clean(pdf).materialize(), len(uniq)
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


# key->id maps up to this many entries ride the broadcast-lookup path
# (ray.put once, pandas Index.get_indexer per batch); larger maps use
# the hash-partitioned join — the dimension-join scale rule
BROADCAST_MAP_CAP = 5_000_000


def attach_ids(ds, mapping, key_cols: list[str], id_col: str = "vid",
               num_partitions: int = 16, n_keys: int | None = None):
    """Join the dense-id mapping back onto `ds`.

    Small maps (n_keys <= BROADCAST_MAP_CAP, pass the known vertex count
    to enable) broadcast the whole mapping and resolve ids with one
    vectorized Index lookup per batch — no join shuffle; larger maps
    fall back to the hash-partitioned Dataset.join."""
    from .runtime import tune_context
    tune_context()
    if n_keys is not None and n_keys <= BROADCAST_MAP_CAP:
        pdf = mapping.to_pandas()
        idx = pd.Index(pdf["__key"])
        ref = ray.put((idx, pdf[id_col].to_numpy()))

        def lookup(b: pa.Table) -> pa.Table:
            index, vids = ray.get(ref)
            kb = _concat_key(b, key_cols)
            pos = index.get_indexer(kb["__key"].to_pylist())
            keep = pos >= 0
            out = b.filter(pa.array(keep))
            return out.append_column(
                id_col, pa.array(vids[pos[keep]], pa.int64()))

        return ds.map_batches(lookup, batch_format="pyarrow")
    keyed = ds.map_batches(lambda b: _concat_key(b, key_cols),
                           batch_format="pyarrow")
    joined = keyed.join(mapping, join_type="inner",
                        num_partitions=num_partitions, on=("__key",))
    return joined.drop_columns(["__key"])
