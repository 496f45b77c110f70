"""Eigenvector centrality by power iteration on the undirected link
graph (coverage-widening; the undamped member of the Katz/PageRank
family — see algos/katz.py for the damped variant and algos/hits.py for
the directed two-sided one):

    x_0[v] = 1
    x_t[v] = sum of x_{t-1}[u] over undirected neighbors u

run for a FIXED number of static-frontier dense supersteps (the
pagerank.cpp:26-129 execution shape without the out-degree division).
Scores stay UNNORMALIZED through the recurrence — per-iteration L2/L1
normalization is a pure global rescale of a linear recurrence, so one
driver-side L1 normalization at the end (a single map_vertices reduce,
the HITS convention) yields the identical normalized vector without a
global float reduce feeding back into the iteration.  float64 holds the
unnormalized growth (lambda_max^iters <= max_degree^iters) at any sane
iteration count.

SQL oracle: pipelines._eigen_sql — the identical recurrence unrolled
over the symmetric edge list, L1-normalized once at the end, rounded on
both sides.
"""

from __future__ import annotations

import numpy as np

from ..engine import GraphEngine, VertexProgram


class EigenProgram(VertexProgram):
    combine = "add"
    supports_sparse = True
    static_frontier = True
    result_columns = ["eigen"]

    def init_state(self, ctx):
        return {"curr": np.ones(ctx.n_local, dtype=np.float64),
                "next": np.zeros(ctx.n_local, dtype=np.float64)}

    def signal(self, ctx, state, local_idx):
        return state["curr"][local_idx]

    def dense_src_values(self, ctx, state):
        return state["curr"]

    def apply(self, ctx, state, tgt_idx, vals):
        state["next"][tgt_idx] += vals
        return np.zeros(len(tgt_idx), dtype=bool)

    def post_step(self, ctx, state, active, step, final):
        state["curr"], state["next"] = state["next"], state["curr"]
        state["next"][:] = 0.0
        return {}

    def finalize(self, ctx, state):
        state["eigen"] = state["curr"]


def eigenvector_centrality(engine: GraphEngine,
                           iterations: int = 8) -> dict:
    """Fixed-iteration power method on the loaded (undirected) graph;
    leaves UNNORMALIZED float64 `eigen` vertex state."""
    return engine.run(EigenProgram(), max_steps=iterations,
                      run_name="eigen")


def eigen_l1(engine: GraphEngine) -> float:
    """Global L1 mass for driver-side normalization (one reduce)."""
    s = engine.map_vertices(
        lambda ctx, state, active: float(state["eigen"].sum()))
    return max(s, 1e-300)
