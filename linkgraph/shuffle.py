"""Deterministic global shuffle + training-shard assignment (the
dataloader-prep op: decorrelate document order, then cut fixed-size
shards — training-data brief, no reference analog).

Order = ascending murmur-finalizer hash of the id (a bijection on
uint64, so the order is total, reproducible, and seedable by XOR-ing a
seed into the id).  The global rank is computed WITHOUT a global sort:
the top 8 hash bits form 256 ORDERED range buckets, per-bucket counts
come back as map-side partials, the driver cumsums 256 offsets, and
each bucket then sorts only its own rows — rank = bucket offset +
in-bucket position.  One coarse shuffle; scales to any row count the
buckets can hold (add hash bits for more buckets).

Shard files: write_partitioned_resumable on the shard column — a
killed export resumes, skipping finished shards.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _id_hash(ids: np.ndarray, seed: int = 0) -> np.ndarray:
    """Murmur3 finalizer of (id XOR seed) — bijective, order-total."""
    with np.errstate(over="ignore"):
        z = ids.astype(np.uint64) ^ np.uint64(seed)
        z ^= z >> np.uint64(33)
        z *= np.uint64(0xFF51AFD7ED558CCD)
        z ^= z >> np.uint64(29)
        z *= np.uint64(0xC4CEB9FE1A85EC53)
        z ^= z >> np.uint64(32)
    return z


N_RANGE_BUCKETS = 256  # top-8-bit hash ranges (ordered)


def shuffle_shard_ranks(ds, id_col: str = "doc_id",
                        shard_size: int = 100, seed: int = 0):
    """(id_col, shard, pos) — pos is the row's global position in the
    hash-shuffled order, shard = pos // shard_size."""
    import ray

    ds = ds.materialize()

    def tag(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = _id_hash(ids, seed)
        return pa.table({id_col: pa.array(ids),
                         "h": pa.array(h, pa.uint64()),
                         "rb": pa.array((h >> np.uint64(56))
                                        .astype(np.int64))})

    tagged = ds.map_batches(tag, batch_format="pyarrow").materialize()

    # per-bucket counts: map-side partials, driver cumsum (256 keys)
    def counts(b: pa.Table) -> pa.Table:
        rb = b["rb"].to_numpy(zero_copy_only=False)
        c = np.bincount(rb, minlength=N_RANGE_BUCKETS)
        return pa.table({"rb": pa.array(np.arange(N_RANGE_BUCKETS,
                                                  dtype=np.int64)),
                         "c": pa.array(c.astype(np.int64))})

    total = np.zeros(N_RANGE_BUCKETS, np.int64)
    for t in tagged.map_batches(counts, batch_format="pyarrow") \
                   .iter_batches(batch_format="pyarrow", batch_size=None):
        total += np.bincount(t["rb"].to_numpy(zero_copy_only=False),
                             weights=t["c"].to_numpy(zero_copy_only=False)
                             .astype(np.float64),
                             minlength=N_RANGE_BUCKETS).astype(np.int64)
    offsets = np.cumsum(total) - total
    oref = ray.put(offsets)

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        off = ray.get(oref)
        ids = g[id_col].to_numpy(np.int64)
        h = g["h"].to_numpy(np.uint64)
        o = np.argsort(h)  # unique (bijective hash of distinct ids)
        pos = off[int(g["rb"].iloc[0])] + np.arange(len(h), dtype=np.int64)
        out = pd.DataFrame({id_col: ids[o], "pos": pos})
        out["shard"] = out["pos"] // shard_size
        return out[[id_col, "shard", "pos"]]

    return tagged.groupby("rb").map_groups(rank, batch_format="pandas")


def export_shards(docs_ds, ranks_ds, out_dir: str,
                  id_col: str = "doc_id") -> dict:
    """Join shard assignments back onto the documents (broadcast of the
    (id, shard) map — shard maps are ids-only, 16 bytes/row) and write
    one resumable parquet directory per shard."""
    import ray

    from .io import write_partitioned_resumable

    pdf = ranks_ds.to_pandas() if not isinstance(ranks_ds, pd.DataFrame) \
        else ranks_ds
    ids = pdf[id_col].to_numpy(np.int64)
    o = np.argsort(ids)
    mref = ray.put((ids[o], pdf["shard"].to_numpy(np.int64)[o],
                    pdf["pos"].to_numpy(np.int64)[o]))

    def attach(b: pa.Table) -> pa.Table:
        mid, msh, mpos = ray.get(mref)
        ids_ = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        p = np.minimum(np.searchsorted(mid, ids_), len(mid) - 1)
        ok = mid[p] == ids_
        t = b.filter(pa.array(ok))
        p = p[ok]
        return t.append_column("shard", pa.array(msh[p])) \
                .append_column("pos", pa.array(mpos[p]))

    return write_partitioned_resumable(
        docs_ds.map_batches(attach, batch_format="pyarrow"),
        out_dir, "shard")
