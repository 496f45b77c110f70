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

Two physical layouts behind one meta dict (persist="auto"):

  in-memory  routed volume <= IN_MEM_STORE_CAP: the materialized routed
             blocks are handed to the shards as object refs (zero-copy
             plasma reads, no disk in the build path);
  parquet    larger graphs (or persist=True) write the hive layout
             `parts/orient=push|pull/part=i/` — per-shard SELECTIVE
             reads and durable cross-process reuse: the 100-TB path.

A persisted store directory is the resumable unit: `parts/` +
`meta.json`.  A rerun that finds a complete meta.json with matching
version / shape / input fingerprint skips the build; anything else
rebuilds (a stale store must never be silently reused for different
input data).
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

# routed edge volume up to this many bytes skips the parquet write and
# hands the materialized blocks straight to the shards (object-store
# refs, zero-copy); larger graphs take the durable hive-parquet layout
# whose per-shard selective reads are the 100-TB path
IN_MEM_STORE_CAP = 8 * 1024 ** 3


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


def _route_mem_stage(offsets_ref, symmetric: bool, narrow: bool):
    """Route stage for the IN-MEMORY layout: one int32 `tag` column
    (part*2 + orient_bit) instead of string orient + int64 part, and each
    output batch SORTED by tag — shards then locate their rows in every
    block with one searchsorted slice (no 192M-row string filter per
    shard, which cost ~70s of shard boot at 96M edges)."""

    def route(b: pa.Table) -> pa.Table:
        offsets = ray.get(offsets_ref)
        src = b["src"].to_numpy(zero_copy_only=False)
        dst = b["dst"].to_numpy(zero_copy_only=False)
        if narrow:
            b = b.set_column(b.schema.get_field_index("src"), "src",
                             pc.cast(b["src"], pa.int32()))
            b = b.set_column(b.schema.get_field_index("dst"), "dst",
                             pc.cast(b["dst"], pa.int32()))
        tag_push = part_of(dst, offsets) * 2
        if symmetric:
            tags = tag_push
            out = b
        else:
            tag_pull = part_of(src, offsets) * 2 + 1
            tags = np.concatenate([tag_push, tag_pull])
            out = pa.concat_tables([b, b])
        order = np.argsort(tags, kind="stable")
        out = out.take(pa.array(order))
        return out.append_column(
            "tag", pa.array(tags[order].astype(np.int32)))

    return route


def build_graph_store(edges_ds, n_vertices: int, num_partitions: int,
                      out_dir: str, symmetric: bool = False,
                      weighted: bool = False, alpha: int | None = None,
                      fingerprint: str | None = None,
                      persist: bool | str = "auto") -> dict:
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
    # TWO streaming passes, nothing materialized here: pass 1 computes
    # the degree-bucket histogram (and |E|) map-side, pass 2 routes.
    # The edge lineage executes once per pass — at 100TB that is the
    # scale-correct trade (a pruned parquet re-read) versus pinning the
    # whole edge table in the object store.  Callers with an EXPENSIVE
    # derivation upstream materialize before calling (pipelines/bench
    # do); a materialized input re-reads for free.
    ed = edges_ds.select_columns(cols)

    # out-degree bucket sums (Gemini's balance cost basis) computed
    # map-only from the edge table — no per-vertex degree shuffle
    offsets, n_edges = partition_offsets_from_edges(
        ed, n_vertices, num_partitions, alpha, with_count=True)
    offsets_ref = ray.put(offsets)

    narrow = int(n_vertices) < 2 ** 31
    meta = {
        "version": STORE_VERSION,
        "n_vertices": int(n_vertices),
        "n_edges": int(n_edges),
        "num_partitions": int(num_partitions),
        "offsets": [int(x) for x in offsets],
        "symmetric": bool(symmetric),
        "weighted": bool(weighted),
        "fingerprint": fingerprint,
    }

    per_edge = (8 if narrow else 16) + (8 if weighted else 0)
    copies = 1 if symmetric else 2
    in_mem = (persist is False
              or (persist == "auto"
                  and n_edges * per_edge * copies <= IN_MEM_STORE_CAP))
    if in_mem:
        # fast path: tag-sorted routed blocks stay in the object store;
        # shards slice their rows via searchsorted (zero-copy reads, no
        # disk in the build — the write was the disk-bandwidth-bound 30s
        # of a 96M-edge build).  Size-gated: the hive-parquet path below
        # gives per-shard SELECTIVE reads and durable resume at scale.
        mat = ed.map_batches(
            _route_mem_stage(offsets_ref, symmetric, narrow),
            batch_format="pyarrow").materialize()
        meta["in_mem"] = True
        meta["block_refs"] = list(mat.get_internal_block_refs())
        meta["_pin"] = mat  # keep the MaterializedDataset alive
        return meta

    ed.map_batches(_route_both_stage(offsets_ref, symmetric, narrow),
                   batch_format="pyarrow").write_parquet(
        os.path.join(out_dir, "parts"), partition_cols=["orient", "part"],
        mode="overwrite")
    meta["complete"] = True
    write_json(meta, meta_path)
    return meta


def load_meta(store_dir: str) -> dict:
    return read_json(os.path.join(store_dir, "meta.json"))


def _cols_out(t: pa.Table, weighted: bool):
    # keep the STORED width (int32 for narrow graphs): shard boot and
    # the CSR build are DRAM-bound, and an int64 upcast here doubled
    # every byte they copy (build_compressed/bincount accept int32)
    src = t["src"].to_numpy(zero_copy_only=False)
    dst = t["dst"].to_numpy(zero_copy_only=False)
    w = (t["weight"].to_numpy(zero_copy_only=False).astype(np.float64,
                                                           copy=False)
         if weighted else None)
    return src, dst, w


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
    return _cols_out(t, weighted)


def part_edges_from_blocks(blocks, orientation: str, part: int,
                           weighted: bool):
    """In-memory-store analog of read_part_edges: slice this shard's
    rows out of each TAG-SORTED routed block with one searchsorted —
    O(log n) locate + zero-copy arrow slice per block."""
    tag = part * 2 + (0 if orientation == "push" else 1)
    kept = []
    cols = ["src", "dst"] + (["weight"] if weighted else [])
    for t in blocks:
        tags = t["tag"].to_numpy(zero_copy_only=False)
        a, b = np.searchsorted(tags, [tag, tag + 1])
        if b > a:
            kept.append(t.select(cols).slice(a, b - a))
    if not kept:
        z = np.empty(0, dtype=np.int64)
        return z, z.copy(), (np.empty(0, dtype=np.float64)
                             if weighted else None)
    return _cols_out(pa.concat_tables(kept), weighted)
