"""Graph store: edge Dataset -> partitioned on-disk layout for shard actors.

Ray-Data-native replacement for Gemini's load_directed 3-pass binary-file
loader (/root/reference/core/graph.hpp:771-1338):

  pass 1  degree bucket sums      -> map-only bincount partials, driver
                                     merge O(buckets) (no shuffle)
  part.   degree-aware offsets    -> greedy Gemini rule over bucket sums
  pass 2  BOTH orientations in ONE routed pass: each edge batch emits a
          push copy tagged with the owner of dst (graph.hpp:986-987) and
          a pull copy tagged with the owner of src (graph.hpp:1183-1184);
          one hive-partitioned write `parts/orient=push|pull/part=i/`.
          (Round 1 wrote the edge list to parquet, read it back, then ran
          two more routed write passes — 4 disk round-trips of |E| before
          the first superstep; the edges stay in the object store now and
          spill only under memory pressure.)

Symmetric graphs store a single adjacency (graph.hpp:732-737): for a
symmetrized edge set, the pull partition of shard i is exactly the push
partition with (src,dst) swapped, so `orient=pull` is skipped and shards
alias the structure.

The store directory is the resumable unit: `parts/` + `meta.json`.  A
rerun that finds a complete meta.json with matching version / shape /
input fingerprint skips the build; anything else rebuilds (a stale store
must never be silently reused for different input data).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from .io import read_json, write_json
from .partition import part_of, partition_offsets_from_edges


# bump when the on-disk layout or routing rules change: stale stores
# under /tmp from an older code version are then rebuilt, not reused
STORE_VERSION = 3


def _route_both_stage(offsets_ref, symmetric: bool, narrow: bool):
    """map_batches fn: ONE pass emits the push copy (part = owner of dst)
    and, for asymmetric graphs, the pull copy (part = owner of src), so
    the partitioned write happens once instead of twice.

    narrow=True (|V| < 2^31) stores ids as int32 — halves the on-disk
    and object-store edge bytes; the store write is disk-bandwidth bound
    (measured 42s for a 96M-edge build), so the byte cut is wall time.
    Shards widen back to int64 on load."""

    def route(b: pa.Table) -> pa.Table:
        offsets = ray.get(offsets_ref)
        dst = b["dst"].to_numpy(zero_copy_only=False)
        n = b.num_rows
        if narrow:
            b = b.set_column(b.schema.get_field_index("src"), "src",
                             pc.cast(b["src"], pa.int32()))
            b = b.set_column(b.schema.get_field_index("dst"), "dst",
                             pc.cast(b["dst"], pa.int32()))
        push = b.append_column(
            "part", pa.array(part_of(dst, offsets), pa.int64()))
        push = push.append_column(
            "orient", pa.array(np.repeat("push", n)))
        if symmetric:
            return push
        src = b["src"].to_numpy(zero_copy_only=False)
        pull = b.append_column(
            "part", pa.array(part_of(src, offsets), pa.int64()))
        pull = pull.append_column(
            "orient", pa.array(np.repeat("pull", n)))
        return pa.concat_tables([push, pull])

    return route


def build_graph_store(edges_ds, n_vertices: int, num_partitions: int,
                      out_dir: str, symmetric: bool = False,
                      weighted: bool = False, alpha: int | None = None,
                      fingerprint: str | None = None) -> dict:
    """Materialize the partitioned graph store; returns meta dict.

    edges_ds columns: src:int64, dst:int64[, weight:float64].
    `fingerprint` identifies the INPUT data (e.g. source-file mtime+size):
    a cached store is reused only when version, partition count, flags,
    n_vertices AND fingerprint all match, so regenerated input at the
    same path can never silently serve stale results.
    """
    meta_path = os.path.join(out_dir, "meta.json")
    if os.path.exists(meta_path):
        meta = read_json(meta_path)
        if (meta.get("complete")
                and meta.get("version") == STORE_VERSION
                and meta["num_partitions"] == num_partitions
                and meta["symmetric"] == symmetric
                and meta["weighted"] == weighted
                and meta.get("n_vertices") == int(n_vertices)
                and meta.get("fingerprint") == fingerprint):
            return meta

    from .runtime import tune_context
    tune_context()

    cols = ["src", "dst"] + (["weight"] if weighted else [])
    # materialize once: the degree pass and the routing pass both consume
    # it from the object store (spill-managed) — no parquet round-trip
    ed = edges_ds.select_columns(cols).materialize()
    n_edges = ed.count()

    # out-degree bucket sums (Gemini's balance cost basis) computed
    # map-only from the edge table — no per-vertex degree shuffle
    offsets = partition_offsets_from_edges(ed, n_vertices, num_partitions,
                                           alpha)
    offsets_ref = ray.put(offsets)

    narrow = int(n_vertices) < 2 ** 31
    ed.map_batches(_route_both_stage(offsets_ref, symmetric, narrow),
                   batch_format="pyarrow").write_parquet(
        os.path.join(out_dir, "parts"), partition_cols=["orient", "part"],
        mode="overwrite")

    meta = {
        "version": STORE_VERSION,
        "n_vertices": int(n_vertices),
        "n_edges": int(n_edges),
        "num_partitions": int(num_partitions),
        "offsets": [int(x) for x in offsets],
        "symmetric": bool(symmetric),
        "weighted": bool(weighted),
        "fingerprint": fingerprint,
        "complete": True,
    }
    write_json(meta, meta_path)
    return meta


def load_meta(store_dir: str) -> dict:
    return read_json(os.path.join(store_dir, "meta.json"))


def read_part_edges(store_dir: str, orientation: str, part: int,
                    weighted: bool) -> tuple[np.ndarray, np.ndarray, np.ndarray | None]:
    """Read one hive partition of the store (inside a shard actor)."""
    import pyarrow.parquet as pq

    path = os.path.join(store_dir, "parts", f"orient={orientation}",
                        f"part={part}")
    if not os.path.isdir(path):
        z = np.empty(0, dtype=np.int64)
        return z, z.copy(), (np.empty(0, dtype=np.float64) if weighted else None)
    cols = ["src", "dst"] + (["weight"] if weighted else [])
    t = pq.read_table(path, columns=cols)
    src = t["src"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    w = (t["weight"].to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
         if weighted else None)
    return src, dst, w
