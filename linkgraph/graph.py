"""High-level graph lifecycle: edge Dataset -> store -> shard pool engine.

The analog of Gemini's `new Graph; load_directed(...)` /
`load_undirected_from_directed(...)` entry points
(/root/reference/core/graph.hpp:771, :349): one build, many runs.
"""

from __future__ import annotations

from .edges import dedup_edges, symmetrize
from .engine import GraphEngine
from .store import build_graph_store, load_meta


def suggest_partitions(n_edges: int, max_parts: int,
                       target_edges_per_part: int = 3_000_000,
                       min_parts: int = 2) -> int:
    """Data-driven shard count: ~target edges per shard, clamped to the
    available parallelism.  Per-superstep fixed cost grows with the shard
    count (2 actor calls/shard + message objects), so small graphs want
    FEW shards — measured 6x superstep slowdown running a 2M-edge graph
    on 32 shards vs 8 — while graphs past target*max_parts use every
    slot.  At cluster scale (1e12 edges) this lands at thousands of
    shards spread across nodes."""
    want = -(-n_edges // max(1, target_edges_per_part))
    return max(min(min_parts, max_parts), min(want, max_parts))


def load_directed(edges_ds, n_vertices: int, num_partitions: int,
                  store_dir: str, weighted: bool = False,
                  num_cpus_per_shard: float = 0,
                  fingerprint: str | None = None,
                  persist: bool | str = "auto") -> GraphEngine:
    """Directed graph engine (PageRank / BFS / SSSP)."""
    meta = build_graph_store(edges_ds, n_vertices, num_partitions, store_dir,
                             symmetric=False, weighted=weighted,
                             fingerprint=fingerprint, persist=persist)
    return GraphEngine(store_dir, meta, num_cpus_per_shard)


def load_undirected(edges_ds, n_vertices: int, num_partitions: int,
                    store_dir: str, simple: bool = True,
                    num_cpus_per_shard: float = 0,
                    fingerprint: str | None = None,
                    persist: bool | str = "auto") -> GraphEngine:
    """Undirected graph engine (CC / LP): emits each edge both ways
    (graph.hpp:572-587) and, when simple=True, collapses duplicates so
    LP's neighbor-label histogram is over distinct neighbors."""
    und = symmetrize(edges_ds).materialize()
    if simple:
        from .edges import EDGE_DRIVER_DEDUP_CAP

        if und.count() <= EDGE_DRIVER_DEDUP_CAP:
            # driver dedup under the cap (same size-gate rule as
            # build_link_edges) — skips a hash-shuffle round
            from .io import from_pandas_clean

            pdf = (und.to_pandas().drop_duplicates(["src", "dst"])
                   .reset_index(drop=True))
            und = from_pandas_clean(pdf).repartition(
                max(2, min(16, len(pdf) // 50_000 + 2)))
        else:
            und = dedup_edges(und)
    meta = build_graph_store(und, n_vertices, num_partitions, store_dir,
                             symmetric=True, fingerprint=fingerprint,
                             persist=persist)
    return GraphEngine(store_dir, meta, num_cpus_per_shard)


def attach(store_dir: str, num_cpus_per_shard: float = 0) -> GraphEngine:
    """Re-attach an engine to an existing on-disk store (resume path)."""
    return GraphEngine(store_dir, load_meta(store_dir), num_cpus_per_shard)
