"""Topological layering (longest-path levels) of a DAG.

layer[v] = 0 for sources; layer[v] = 1 + max(layer[u]) over in-edges
(u, v) — the earliest-start level a scheduler can run v at, and a
topological order key (layer[u] < layer[v] for every edge).  The same
max-relaxation superstep shape as CC's min propagation (cc.cpp:22-109
mirrored with combine=max): a vertex whose layer grows re-enters the
frontier; fixpoint after longest-path-length rounds (finite iff the
input is acyclic — run it on an SCC condensation).

Cycle safety: callers pass `max_steps`; on a cyclic input the
relaxation never converges, so a bounded run that ends with a
non-empty frontier raises instead of returning wrong layers.
"""

from __future__ import annotations

import numpy as np

from ..engine import GraphEngine, VertexProgram


class LayerProgram(VertexProgram):
    combine = "max"
    supports_sparse = True
    static_frontier = False
    result_columns = ["layer"]

    def init_state(self, ctx, prev=None):
        if prev is not None:
            return prev
        return {"layer": np.zeros(ctx.hi - ctx.lo, dtype=np.int64)}

    def signal(self, ctx, state, local_idx):
        return state["layer"][local_idx] + 1

    def dense_src_values(self, ctx, state):
        return state["layer"] + 1

    def apply(self, ctx, state, tgt_idx, vals):
        lay = state["layer"]
        m = vals > lay[tgt_idx]
        lay[tgt_idx[m]] = vals[m]
        return m


def dag_layers(engine: GraphEngine, max_steps: int = 1000,
               ckpt_dir: str | None = None, ckpt_every: int = 1,
               resume: bool = False) -> dict:
    """Requires a DIRECTED acyclic store.  Raises on non-convergence
    (a cycle) instead of returning a partial layering."""
    rep = engine.run(LayerProgram(), max_steps=max_steps,
                     ckpt_dir=ckpt_dir, ckpt_every=ckpt_every,
                     resume=resume, run_name="dag_layers")
    if rep["steps"] and rep["steps"][-1]["active_out"] > 0:
        raise AssertionError(
            f"dag_layers: frontier non-empty after {max_steps} supersteps "
            "— input graph has a cycle (run SCC condensation first)")
    return rep
