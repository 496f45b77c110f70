"""Sequence packing for LLM training data: deterministic
concatenate-and-chunk (the standard pretraining packer — concatenate
every document's tokens in a fixed global order, cut the stream every
`seq_len` tokens; documents spanning a boundary are split across
sequences).

Scale shape (the repo's standard wide-step recipe, CLAUDE.md):

  1. token counts per doc in one vectorized map_batches pass;
  2. the global prefix sum decomposes over doc_id-RANGE buckets:
     per-bucket token sums are map-side bincount partials merged on the
     driver (O(n_buckets) rows ever leave a task — the
     partition.partition_offsets_from_edges pattern), an exclusive scan
     of that tiny array gives each bucket its stream base offset;
  3. ONE coarse groupby(bucket).map_groups co-locates each id range and
     runs a vectorized in-bucket cumsum + chunk arithmetic.

No sort, no per-key aggregate, no driver materialization of doc-sized
data; bucket count scales with rows (~TARGET_ROWS_PER_BUCKET each).

Output per document: its token count, global stream offset, first/last
sequence index and piece count — exactly what a downstream tokenizer
shard needs to emit its sequences independently.  SQL oracle: a window
cumsum over doc_id order (pipelines ORACLE_SQL['pack_sequences']).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

TARGET_ROWS_PER_BUCKET = 200_000


def pack_sequences(ds, seq_len: int, id_col: str = "doc_id",
                   count_col: str = "n_tokens"):
    """Assign each row's token span to fixed-length sequences.

    `ds` must carry a dense-ish integer id (stream order) and a token
    count.  Returns a Dataset with (id_col, count_col, start, seq_first,
    seq_last, n_pieces); zero-token rows occupy one empty piece at their
    offset so every input row appears exactly once in the output.
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    from .runtime import tune_context
    tune_context()
    ds = ds.materialize()
    max_id = int(ds.max(id_col))
    nb = max(8, ds.count() // TARGET_ROWS_PER_BUCKET)
    width = max(1, -(-(max_id + 1) // nb))
    n_real = -(-(max_id + 1) // width)

    def partial(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        cnt = b[count_col].to_numpy(zero_copy_only=False)
        sums = np.bincount(ids // width, weights=cnt, minlength=n_real)
        return pa.table({"bucket": pa.array(np.arange(n_real, dtype=np.int64)),
                         "tok_sum": pa.array(sums.astype(np.int64))})

    rows = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    sums = np.zeros(n_real, dtype=np.int64)
    np.add.at(sums, rows["bucket"].to_numpy(), rows["tok_sum"].to_numpy())
    base = np.concatenate([[0], np.cumsum(sums)[:-1]])  # exclusive scan

    def add_bucket(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        return b.append_column("_pb", pa.array(ids // width))

    def bucket_pack(g: pd.DataFrame) -> pd.DataFrame:
        bk = int(g["_pb"].iloc[0])
        order = np.argsort(g[id_col].to_numpy(), kind="stable")
        ids = g[id_col].to_numpy()[order]
        cnt = g[count_col].to_numpy()[order].astype(np.int64)
        start = base[bk] + np.cumsum(cnt) - cnt
        last_tok = start + np.maximum(cnt - 1, 0)
        seq_first = start // seq_len
        seq_last = last_tok // seq_len
        return pd.DataFrame({
            id_col: ids, count_col: cnt, "start": start,
            "seq_first": seq_first, "seq_last": seq_last,
            "n_pieces": seq_last - seq_first + 1})

    return (ds.map_batches(add_bucket, batch_format="pyarrow")
              .groupby("_pb").map_groups(bucket_pack,
                                         batch_format="pandas"))
