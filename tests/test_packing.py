"""Sequence packing (linkgraph/packing.py): concat-and-chunk arithmetic
vs a sequential python oracle, partition invariance, zero-token rows,
and boundary splits."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from linkgraph.packing import pack_sequences


def pack_oracle(ids, counts, seq_len):
    order = np.argsort(ids)
    rows = []
    off = 0
    for i in order:
        n = int(counts[i])
        start = off
        last = start + max(n - 1, 0)
        rows.append((int(ids[i]), n, start, start // seq_len,
                     last // seq_len, last // seq_len - start // seq_len + 1))
        off += n
    return pd.DataFrame(rows, columns=["doc_id", "n_tokens", "start",
                                       "seq_first", "seq_last", "n_pieces"])


def _run(ids, counts, seq_len, parts=4):
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "n_tokens": pa.array(counts, pa.int64())})).repartition(parts)
    return (pack_sequences(ds, seq_len=seq_len).to_pandas()
            .sort_values("doc_id").reset_index(drop=True)
            .astype("int64"))


def test_pack_matches_sequential_oracle():
    rng = np.random.default_rng(3)
    ids = rng.permutation(400).astype(np.int64)
    counts = rng.integers(0, 97, 400).astype(np.int64)
    got = _run(ids, counts, seq_len=64)
    pd.testing.assert_frame_equal(got, pack_oracle(ids, counts, 64))


def test_pack_partition_invariant():
    rng = np.random.default_rng(5)
    ids = rng.permutation(257).astype(np.int64)
    counts = rng.integers(1, 40, 257).astype(np.int64)
    a = _run(ids, counts, seq_len=32, parts=2)
    b = _run(ids, counts, seq_len=32, parts=9)
    pd.testing.assert_frame_equal(a, b)


def test_pack_boundaries_and_zero_rows():
    # doc 0 fills seq 0 exactly; doc 1 (zero tokens) sits at the
    # boundary in one empty piece; doc 2 spans seqs 1-3
    got = _run([0, 1, 2], [8, 0, 17], seq_len=8, parts=2)
    assert got["start"].tolist() == [0, 8, 8]
    assert got["seq_first"].tolist() == [0, 1, 1]
    assert got["seq_last"].tolist() == [0, 1, 3]
    assert got["n_pieces"].tolist() == [1, 1, 3]
    # total pieces cover the stream: last token index 24 -> 4 sequences
    assert int(got["seq_last"].max()) == (8 + 17 - 1) // 8


def test_pack_rejects_bad_seq_len():
    ds = rd.from_arrow(pa.table({"doc_id": pa.array([0], pa.int64()),
                                 "n_tokens": pa.array([1], pa.int64())}))
    with pytest.raises(ValueError):
        pack_sequences(ds, seq_len=0)
