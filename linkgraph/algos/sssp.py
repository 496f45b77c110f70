"""Single-source shortest paths over a weighted graph
(toolkits/sssp.cpp:24-105, Graph<float> at :22).

Reference semantics: distance init 1e9 (NOT inf, sssp.cpp:31-34), root 0;
push relaxes distance[dst] <= msg + weight with write_min + activation
(:43-58); pull computes min(distance[src] + weight) over ALL in-neighbors
and emits when < 1e9 (:60-71); stop when the frontier empties.  Distances
are monotone, so unmasked pulls are safe.  Deterministic here because
combines are per-target reductions, not racing atomics.
"""

from __future__ import annotations

import numpy as np

from ..engine import GraphEngine, VertexProgram

INF_DIST = 1e9  # sssp.cpp:33


class SSSPProgram(VertexProgram):
    combine = "min"
    supports_sparse = True
    static_frontier = False
    result_columns = ["distance"]

    def init_state(self, ctx):
        dist = np.full(ctx.n_local, INF_DIST, dtype=np.float64)
        root = ctx.params["root"]
        if ctx.lo <= root < ctx.hi:
            dist[root - ctx.lo] = 0.0
        return {"distance": dist}

    def initial_active(self, ctx, state):
        active = np.zeros(ctx.n_local, dtype=bool)
        root = ctx.params["root"]
        if ctx.lo <= root < ctx.hi:
            active[root - ctx.lo] = True
        return active

    def signal(self, ctx, state, local_idx):
        return state["distance"][local_idx]

    def edge_transform(self, vals, weights):
        return vals + (weights if weights is not None else 1.0)

    def dense_src_values(self, ctx, state):
        return state["distance"]

    def dense_emit_mask(self, ctx, row_vertex, partial):
        return partial < INF_DIST  # sssp.cpp:68-70

    def apply(self, ctx, state, tgt_idx, vals):
        dist = state["distance"]
        m = vals < dist[tgt_idx]
        dist[tgt_idx[m]] = vals[m]
        return m


def sssp(engine: GraphEngine, root: int, ckpt_dir: str | None = None,
         ckpt_every: int = 1, resume: bool = False) -> dict:
    return engine.run(SSSPProgram(), params={"root": int(root)},
                      ckpt_dir=ckpt_dir, ckpt_every=ckpt_every, resume=resume,
                      run_name=f"sssp_root{root}")


def max_finite_distance(engine: GraphEngine) -> float:
    """sssp.cpp:92-100 invariant: farthest reached distance."""
    return float(engine.map_vertices(
        lambda ctx, state, active:
        float(state["distance"][state["distance"] < INF_DIST].max(initial=0.0)),
        reduce="max"))
