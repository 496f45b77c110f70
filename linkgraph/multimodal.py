"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Media payloads are opaque `binary` columns with typed metadata columns;
decode / feature-extraction / resize / frame-sampling run as ACTOR-POOL
map_batches stages (model/codec state loaded once per actor in
__init__).  The decode libraries (PIL, ffmpeg, torchaudio ...) are NOT
in this container, so the codec call itself is STUBBED: with
`use_stub=False` the stage raises NotImplementedError at the clearly
marked seam; with the default deterministic stub, a fake "decoder"
derives reproducible features from the bytes so the Ray-side plumbing —
schema, batch sizing, actor signature, output layout — is real and
tested end-to-end.

Batch sizes default SMALL (256) because media rows are wide; at scale
pair this with a larger DataContext.target_max_block_size so blocks are
not split absurdly small (see ray_guide pitfalls).
"""

from __future__ import annotations

from .runtime import pool_size

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),          # image | audio | video
    ("payload", pa.binary()),       # opaque encoded bytes
    ("width", pa.int32()),          # metadata (0 when unknown)
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def synth_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media rows for tests/benches (no external data)."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"])[rng.integers(0, 3, n)]
    payloads = [hashlib.sha256(f"{seed}:{i}".encode()).digest()
                * int(rng.integers(1, 8)) for i in range(n)]
    return pa.table({
        "media_id": pa.array(np.arange(n, dtype=np.int64)),
        "kind": pa.array(kinds),
        "payload": pa.array(payloads, pa.binary()),
        "width": pa.array(rng.integers(16, 512, n).astype(np.int32)),
        "height": pa.array(rng.integers(16, 512, n).astype(np.int32)),
        "duration_ms": pa.array(rng.integers(0, 60000, n).astype(np.int32)),
    })


def media_from_documents(docs_ds):
    """Deterministic media table DERIVED from the documents table — the
    SQL-oracle-checkable twin of synth_media_table: the kind cycles with
    doc_id, the payload is the utf-8 text bytes, and every metadata
    column is fixed integer arithmetic on doc_id / byte length, so a
    DuckDB oracle can reproduce each downstream value exactly
    (pipelines.ORACLE_SQL['media_features'/'media_frames'])."""
    kinds = np.array(["image", "audio", "video"])

    def derive(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        payloads = [(t or "").encode("utf-8") for t in b["text"].to_pylist()]
        nb = np.array([len(p) for p in payloads], dtype=np.int64)
        return pa.table({
            "media_id": pa.array(ids),
            "kind": pa.array(kinds[ids % 3]),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array((16 + (ids * 37) % 496).astype(np.int32)),
            "height": pa.array((16 + (ids * 53) % 496).astype(np.int32)),
            "duration_ms": pa.array(((nb * 131) % 60000).astype(np.int32)),
        })

    return docs_ds.map_batches(derive, batch_format="pyarrow")


class MediaDecodeStage:
    """Actor-pool decode + feature-extract stage.

    __init__ is the once-per-actor setup seam (real codecs / models load
    here); __call__ maps a binary batch to fixed-size feature vectors.
    """

    FEAT_DIM = 16

    def __init__(self, use_stub: bool = True):
        self.use_stub = use_stub

    def _decode(self, payload: bytes, kind: str) -> np.ndarray:
        if not self.use_stub:
            # >>> real decoder seam: PIL.Image.open / av.open / soundfile
            raise NotImplementedError(
                "media codecs are not available in this environment; "
                "plug a real decoder here")
        # deterministic fake: digest bytes -> FEAT_DIM floats in [0, 1)
        d = hashlib.sha256(payload + kind.encode()).digest()
        raw = np.frombuffer((d * ((self.FEAT_DIM * 4) // len(d) + 1))
                            [:self.FEAT_DIM * 4], dtype=np.uint32)
        return (raw % 10_000).astype(np.float32) / 10_000.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch["kind"].to_pylist()
        payloads = batch["payload"].to_pylist()
        feats = np.stack([self._decode(p or b"", k)
                          for p, k in zip(payloads, kinds)])
        return pa.table({
            "media_id": batch["media_id"],
            "kind": batch["kind"],
            "n_bytes": pa.array([len(p or b"") for p in payloads], pa.int64()),
            "features": pa.array(list(feats),
                                 pa.list_(pa.float32(), self.FEAT_DIM)),
        })


class FrameSampleStage:
    """Video frame-sampling plumbing: emits one row per sampled frame
    offset (flat_map-shaped inside map_batches); frame decode stubbed."""

    def __init__(self, fps: float = 1.0, use_stub: bool = True):
        self.fps = fps
        self.use_stub = use_stub

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, offs = [], []
        for mid, kind, dur in zip(batch["media_id"].to_pylist(),
                                  batch["kind"].to_pylist(),
                                  batch["duration_ms"].to_pylist()):
            if kind != "video":
                continue
            if not self.use_stub:
                raise NotImplementedError("video demuxer not available")
            step = int(1000 / self.fps)
            for off in range(0, max(1, dur or 0), step):
                ids.append(mid)
                offs.append(off)
        return pa.table({"media_id": pa.array(ids, pa.int64()),
                         "frame_ms": pa.array(offs, pa.int32())})


def decode_features(ds, concurrency: int = 4, batch_size: int = 256,
                    use_stub: bool = True):
    """media table -> (media_id, kind, n_bytes, features) via actor pool."""
    return ds.map_batches(MediaDecodeStage, fn_constructor_args=(use_stub,),
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=pool_size(concurrency))


def sample_frames(ds, fps: float = 1.0, concurrency: int = 2,
                  batch_size: int = 256, use_stub: bool = True):
    """media table -> (media_id, frame_ms) rows for video payloads."""
    return ds.map_batches(FrameSampleStage, fn_constructor_args=(fps, use_stub),
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=pool_size(concurrency))
