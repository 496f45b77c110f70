"""WARC-style web-archive container lane (the CommonCrawl ingestion
seam of a training-data pipeline).

`synth_warc_blobs` packs each incoming document batch into ONE
WARC/1.0-format byte blob (response records with WARC-Target-URI and
Content-Length headers, CRLF framing) — the deterministic small-scale
stand-in for reading real .warc files from object storage.
`WarcExtractStage` is the real parser: an actor-pool map_batches stage
(header regex compiled once in __init__) that walks each blob by
Content-Length — NOT by splitting on the record magic, so payloads
containing "WARC/1.0" parse correctly — and emits one row per record.

At 100 TB the blob column is the unit of streaming: one blob per input
file/shard, small batch sizes (blobs are MB-scale), actor-pool
concurrency sized to the node; no shuffle anywhere in the lane.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

WARC_URI_PREFIX = "https://example.com/doc/"


def synth_warc_blobs(docs_ds, id_col: str = "doc_id",
                     text_col: str = "text"):
    """Pack each batch's documents into one WARC/1.0 byte blob.

    Content-Length counts payload OCTETS (UTF-8 bytes), per the WARC
    spec; blob_id is the first doc id in the blob (deterministic given
    the batch layout; the parse result never depends on packing)."""

    def pack(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        if len(ids) == 0:
            return pa.table({"blob_id": pa.array([], pa.int64()),
                             "blob": pa.array([], pa.binary())})
        parts = []
        for i, t in zip(ids, b[text_col].to_pylist()):
            payload = (t or "").encode("utf-8")
            head = (f"WARC/1.0\r\n"
                    f"WARC-Type: response\r\n"
                    f"WARC-Target-URI: {WARC_URI_PREFIX}{int(i)}\r\n"
                    f"Content-Length: {len(payload)}\r\n"
                    f"\r\n").encode("ascii")
            parts.append(head + payload + b"\r\n\r\n")
        return pa.table({
            "blob_id": pa.array([int(ids[0])], pa.int64()),
            "blob": pa.array([b"".join(parts)], pa.binary())})

    return docs_ds.map_batches(pack, batch_format="pyarrow")


class WarcExtractStage:
    """Actor-pool parser: blob -> one row per WARC record
    (doc_id parsed from the target URI, url, n_bytes = Content-Length,
    text decoded from the payload octets)."""

    def __init__(self):
        self._hdr = re.compile(
            rb"WARC/1\.0\r\n(?P<h>(?:[!-9;-~]+: [^\r\n]*\r\n)*)\r\n")
        self._uri = re.compile(rb"WARC-Target-URI: ([^\r\n]+)")
        self._len = re.compile(rb"Content-Length: (\d+)")

    def _records(self, blob: bytes):
        pos = 0
        while pos < len(blob):
            m = self._hdr.match(blob, pos)
            if m is None:
                raise ValueError(
                    f"malformed WARC record at offset {pos}")
            h = m.group("h")
            mu = self._uri.search(h)
            ml = self._len.search(h)
            if mu is None or ml is None:
                raise ValueError(
                    f"WARC record at offset {pos} missing "
                    f"Target-URI or Content-Length")
            n = int(ml.group(1))
            payload = blob[m.end():m.end() + n]
            if len(payload) != n:
                raise ValueError(
                    f"truncated WARC payload at offset {m.end()}: "
                    f"{len(payload)} of {n} bytes")
            yield mu.group(1).decode("ascii"), n, payload
            pos = m.end() + n + 4  # trailing CRLF CRLF

    def __call__(self, b: pa.Table) -> pa.Table:
        ids, urls, sizes, texts = [], [], [], []
        for blob in b["blob"].to_pylist():
            for url, n, payload in self._records(blob):
                ids.append(int(url.rsplit("/", 1)[1]))
                urls.append(url)
                sizes.append(n)
                texts.append(payload.decode("utf-8"))
        return pa.table({
            "doc_id": pa.array(np.array(ids, np.int64)),
            "url": pa.array(urls, pa.string()),
            "n_bytes": pa.array(np.array(sizes, np.int64)),
            "text": pa.array(texts, pa.string())})


def warc_extract(blobs_ds, concurrency: int | None = None):
    """Parse WARC blobs with an actor pool (regexes compiled once per
    actor); small batch sizes — blobs are the large unit here."""
    from .runtime import pool_size

    return blobs_ds.map_batches(
        WarcExtractStage,
        batch_format="pyarrow",
        batch_size=4,
        concurrency=pool_size(8) if concurrency is None else concurrency,
        num_cpus=1)
