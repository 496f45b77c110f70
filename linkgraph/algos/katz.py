"""Katz centrality (coverage-widening; the damped eigenvector-centrality
family member that stays well-defined on DAG-ish link graphs, where pure
power iteration collapses to zero once the walk length exceeds the
longest path):

    x_0[v] = 1
    x_t[v] = 1 + alpha * sum of x_{t-1}[u] over in-edges u -> v

run for a FIXED number of supersteps (static frontier, dense mode by the
|E|/20 rule — same execution shape as PageRank, pagerank.cpp:26-129, but
without the out-degree renormalization).  No global normalization is
needed, so there is no cross-shard float reducer feeding back into the
iteration: the only float arithmetic is the per-target message sum, the
same per-target deterministic combine every other program uses.

SQL oracle: pipelines._katz_sql — the identical recurrence unrolled into
chained CTEs (LEFT JOIN of the per-dst sum, coalesce 0 for vertices with
no in-edges), rounded on both sides.
"""

from __future__ import annotations

import numpy as np

from ..engine import GraphEngine, VertexProgram


class KatzProgram(VertexProgram):
    combine = "add"
    supports_sparse = True
    static_frontier = True
    result_columns = ["katz"]

    def init_state(self, ctx):
        return {"curr": np.ones(ctx.n_local, dtype=np.float64),
                "next": np.zeros(ctx.n_local, dtype=np.float64),
                "_alpha": np.full(1, ctx.params.get("alpha", 0.1))}

    def signal(self, ctx, state, local_idx):
        return state["curr"][local_idx]

    def dense_src_values(self, ctx, state):
        return state["curr"]

    def apply(self, ctx, state, tgt_idx, vals):
        state["next"][tgt_idx] += vals
        return np.zeros(len(tgt_idx), dtype=bool)

    def post_step(self, ctx, state, active, step, final):
        a = float(state["_alpha"][0])
        nxt, curr = state["next"], state["curr"]
        nxt *= a
        nxt += 1.0
        state["curr"], state["next"] = nxt, curr
        curr[:] = 0.0  # becomes the next accumulation buffer
        return {}

    def finalize(self, ctx, state):
        state["katz"] = state["curr"]


def katz_centrality(engine: GraphEngine, iterations: int = 10,
                    alpha: float = 0.1) -> dict:
    """Fixed-iteration Katz on the loaded (directed) graph."""
    return engine.run(KatzProgram(), params={"alpha": alpha},
                      max_steps=iterations, run_name="katz")
