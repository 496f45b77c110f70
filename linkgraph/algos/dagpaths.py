"""Source-path counting on a DAG.

n_paths(v) = number of distinct source→v paths (counting the trivial
path at each source, i.e. n_paths(source) = 1; every DAG vertex is
reachable from some source so n_paths >= 1 everywhere).  Computed as a
wave propagation: p_0 = 1 on sources; p_{k}(v) = Σ p_{k-1}(u) over
in-edges (u, v); total(v) = Σ_k p_k(v) — each wave k contributes the
number of length-k paths ending at v.  This is the add-combine analog
of the layering relaxation (algos/toposort.py): the frontier is the
current wave, stale p on inactive vertices is masked out of the dense
pull via dense_src_mask (the BFS pattern, bfs.cpp:62-66), and the run
terminates after longest-path-length supersteps.

Caveats: counts are float64 (the engine's add-combine message dtype)
and exact below 2^53 — path counts grow exponentially with DAG width,
so at planetary scale run on a condensation / bounded-depth slice;
a cyclic input never converges — the same bounded-run raise as
dag_layers applies.
"""

from __future__ import annotations

import numpy as np

from ..engine import GraphEngine, VertexProgram


class DagPathsProgram(VertexProgram):
    combine = "add"
    supports_sparse = True
    static_frontier = False
    result_columns = ["total"]

    def init_state(self, ctx):
        # float64 state: the engine ships add-combine messages as
        # float64; counts stay EXACT below 2^53 (documented caveat)
        src = np.asarray(ctx.params["sources"], dtype=np.int64)
        local = src[(src >= ctx.lo) & (src < ctx.hi)] - ctx.lo
        p = np.zeros(ctx.hi - ctx.lo, dtype=np.float64)
        p[local] = 1.0
        return {"p": p, "total": p.copy()}

    def initial_active(self, ctx, state):
        return state["p"] > 0

    def signal(self, ctx, state, local_idx):
        return state["p"][local_idx]

    def dense_src_values(self, ctx, state):
        return state["p"]

    def dense_src_mask(self, ctx, state, active):
        return active  # only the current wave contributes (stale p masked)

    def apply(self, ctx, state, tgt_idx, vals):
        state["total"][tgt_idx] += vals
        state["p"][tgt_idx] = vals
        return vals > 0


def dag_path_counts(engine: GraphEngine, sources: np.ndarray,
                    max_steps: int = 1000) -> dict:
    """`sources` = global vertex ids with in-degree 0.  Raises on
    non-convergence (a cycle) like dag_layers."""
    rep = engine.run(DagPathsProgram(),
                     params={"sources": np.sort(np.asarray(sources,
                                                           np.int64))},
                     max_steps=max_steps, run_name="dag_paths")
    if rep["steps"] and rep["steps"][-1]["active_out"] > 0:
        raise AssertionError(
            f"dag_path_counts: frontier non-empty after {max_steps} "
            "supersteps — input graph has a cycle")
    return rep
