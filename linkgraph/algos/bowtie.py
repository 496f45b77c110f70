"""Bow-tie decomposition of a directed graph (Broder et al., "Graph
structure in the Web", WWW 2000): CORE = the largest SCC (size ties ->
smallest SCC label), IN = vertices that reach the core, OUT = vertices
the core reaches, OTHER = tendrils / tubes / disconnected.

Built from the engine's own primitives (coverage-widening; no reference
implementation): SCC labels from algos.scc's forward-min /
backward-confirm rounds, then two multi-source reachability sweeps — a
BFS visited flag without depths — forward on the stored orientation and
backward on the zero-copy transpose (the same push/pull swap BC and SCC
use, toolkits/bc.cpp:24-404).  The class COUNTS are map_vertices
reductions; no per-vertex table ever lands on the driver.
"""

from __future__ import annotations

import numpy as np

from ..engine import GraphEngine, VertexProgram


class ReachProgram(VertexProgram):
    """Multi-source reachability: seeds = vertices whose scc label (from
    the preceding SCC run's state) equals params['core']; reach spreads
    along out-edges with the visited-skip dense_selective exchange
    (bfs.cpp:61,:77)."""

    combine = "min"
    supports_sparse = True
    dense_selective = True
    continues = True  # reads the scc labels from the prior run's state
    result_columns = ["reach"]

    def init_state(self, ctx, prev=None):
        scc = prev["scc"]
        seed = scc == ctx.params["core"]
        return {"scc": scc, "reach": seed.copy()}

    def initial_active(self, ctx, state):
        return state["reach"].copy()

    def signal(self, ctx, state, local_idx):
        return np.zeros(len(local_idx), dtype=np.int64)

    def dense_src_values(self, ctx, state):
        return np.zeros(ctx.n_local, dtype=np.int64)

    def dense_src_mask(self, ctx, state, active):
        return active

    def dense_emit_mask(self, ctx, row_vertex, partial):
        return partial < np.iinfo(np.int64).max

    def selective_mask(self, ctx, state):
        return state["reach"]

    def apply(self, ctx, state, tgt_idx, vals):
        m = ~state["reach"][tgt_idx]
        state["reach"][tgt_idx[m]] = True
        return m


def bowtie(engine: GraphEngine) -> dict:
    """SCC + two reach sweeps -> {'core_label', 'counts': {core, in,
    out, other}, 'reports': {...}}.  Requires a DIRECTED store.

    The core pick is a distributed partial top-1: per-shard scc
    value-counts, one coarse label-bucket groupby emitting each bucket's
    (n DESC, label ASC) best, driver fold over O(buckets) rows — never a
    per-label fine-key aggregate or a driver-side label table."""
    import pandas as pd
    import pyarrow as pa
    import ray

    from .scc import strongly_connected_components
    from .triangles import n_buckets_for

    rep_scc = strongly_connected_components(engine)
    labels = engine.state_dataset(["scc"]).materialize()
    n_total = labels.count()
    nb = n_buckets_for(n_total)

    def part(b: pa.Table) -> pa.Table:
        u, c = np.unique(b["scc"].to_numpy(zero_copy_only=False),
                         return_counts=True)
        return pa.table({"lab": pa.array(u.astype(np.int64)),
                         "n": pa.array(c.astype(np.int64)),
                         "lb": pa.array((u % nb).astype(np.int64))})

    def top1(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("lab", sort=False)["n"].sum().reset_index()
        s = s.sort_values(["n", "lab"], ascending=[False, True])
        return s.head(1).astype(np.int64)

    tops = labels.map_batches(part, batch_format="pyarrow") \
                 .groupby("lb").map_groups(top1, batch_format="pandas") \
                 .to_pandas() \
                 .sort_values(["n", "lab"], ascending=[False, True])
    core = int(tops["lab"].iloc[0])
    core_n = int(tops["n"].iloc[0])

    def count_reached(c):
        return lambda ctx, state, active: float(
            (state["reach"] & (state["scc"] != c)).sum())

    rep_out = engine.run(ReachProgram(), params={"core": core},
                         run_name="bowtie_out")
    out_n = int(engine.map_vertices(count_reached(core)))

    ray.get([s.transpose.remote() for s in engine.shards])
    try:
        rep_in = engine.run(ReachProgram(), params={"core": core},
                            run_name="bowtie_in")
    finally:
        ray.get([s.transpose.remote() for s in engine.shards])
    in_n = int(engine.map_vertices(count_reached(core)))

    return {"core_label": core,
            "counts": {"core": core_n, "in": in_n, "out": out_n,
                       "other": n_total - core_n - in_n - out_n},
            "reports": {"scc": rep_scc, "out": rep_out, "in": rep_in}}
