"""WARC container lane (linkgraph/warc.py) and the gzip JSONL
source/sink (io.write_jsonl_gz / read_jsonl_gz): parse correctness,
malformed-record contracts, round-trip fidelity, idempotent shards."""

import gzip
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from linkgraph.warc import (WARC_URI_PREFIX, WarcExtractStage,
                            synth_warc_blobs, warc_extract)


def _docs(texts):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
        "text": pa.array(texts, pa.string())}))


def test_warc_roundtrip_preserves_text_and_octets():
    texts = ["hello world", "", "naïve — ünïcode ✓", "a" * 5000,
             # payload containing the record magic must NOT split
             "embedded WARC/1.0\r\n\r\nmagic inside"]
    out = warc_extract(synth_warc_blobs(_docs(texts))).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(out["doc_id"]) == list(range(len(texts)))
    assert list(out["text"]) == texts
    assert list(out["n_bytes"]) == [len(t.encode()) for t in texts]
    assert out["url"].iloc[2] == f"{WARC_URI_PREFIX}2"


def test_warc_stage_rejects_malformed():
    st = WarcExtractStage()
    bad_magic = pa.table({"blob": pa.array([b"HTTP/1.1 not warc"])})
    with pytest.raises(ValueError, match="malformed WARC record"):
        st(bad_magic)
    rec = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: u/1\r\nContent-Length: 99\r\n\r\nshort")
    with pytest.raises(ValueError, match="truncated WARC payload"):
        st(pa.table({"blob": pa.array([rec])}))
    no_len = (b"WARC/1.0\r\nWARC-Type: response\r\n"
              b"WARC-Target-URI: u/1\r\n\r\n")
    with pytest.raises(ValueError, match="missing"):
        st(pa.table({"blob": pa.array([no_len])}))


def test_jsonl_gz_roundtrip_and_idempotent_names(tmp_path):
    from linkgraph.io import read_jsonl_gz, write_jsonl_gz

    df = pd.DataFrame({
        "doc_id": np.arange(57, dtype=np.int64),
        "lang": ["en", "de", "fr"] * 19,
        "text": [f"line {i} ünïcode" for i in range(57)]})
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    out = str(tmp_path / "gz")
    mani = write_jsonl_gz(ds, out)
    assert mani["rows"] == 57
    files = sorted(os.listdir(out))
    assert files == mani["files"]
    assert all(f.endswith(".jsonl.gz") for f in files)
    with gzip.open(os.path.join(out, files[0]), "rb") as f:
        assert f.read().count(b"\n") >= 1
    # re-writing the same content produces the SAME shard names
    mani2 = write_jsonl_gz(ds, out)
    assert mani2["files"] == mani["files"]
    got = read_jsonl_gz(out).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)[df.columns]
    pd.testing.assert_frame_equal(got, df)
