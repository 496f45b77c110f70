"""k-core: synchronous peeling on a symmetric graph.

Not in the reference toolkit set — a coverage-widening algorithm in the
classic Gemini frontier style (sparse push of a shrinking "dying" set,
like cc.cpp's shrinking frontier):

  round 0: every vertex with degree < k dies;
  round i: each dying vertex signals 1 to its neighbors; a neighbor's
           live degree drops by the count received, and an alive vertex
           whose degree falls below k dies in round i+1;
  stop when no vertex dies (frontier empties).

Removal is SIMULTANEOUS per round (superstep semantics), so the
surviving set satisfies the textbook recurrence
    alive_{i+1} = { v in alive_i : |N(v) ∩ alive_i| >= k }
which the SQL oracle unrolls directly (pipelines._kcore_sql).

Requires a store built with symmetric=True (out_deg == undirected
degree, as for CC/label propagation).
"""

from __future__ import annotations

import numpy as np

from ..engine import GraphEngine, VertexProgram


class KCoreProgram(VertexProgram):
    combine = "add"
    supports_sparse = True
    result_columns = ["in_core"]

    def init_state(self, ctx):
        k = int(ctx.params["k"])
        deg = ctx.out_deg.astype(np.int64).copy()
        alive = deg >= k
        return {"deg": deg, "alive": alive,
                "_k": np.array([k], dtype=np.int64),
                "_dying0": ~alive}

    def initial_active(self, ctx, state):
        return state["_dying0"].copy()

    # dying vertices each contribute a count of 1 per incident edge
    def signal(self, ctx, state, local_idx):
        return np.ones(len(local_idx), dtype=np.float64)

    def dense_src_values(self, ctx, state):
        return np.ones(ctx.n_local, dtype=np.float64)

    def dense_src_mask(self, ctx, state, active):
        return active  # only this round's dying set signals

    def apply(self, ctx, state, tgt_idx, vals):
        k = int(state["_k"][0])
        deg, alive = state["deg"], state["alive"]
        deg[tgt_idx] -= vals.astype(np.int64)
        newly = alive[tgt_idx] & (deg[tgt_idx] < k)
        # dead from the NEXT round on; they still receive decrements from
        # later-dying neighbors but can never re-enter the frontier
        alive[tgt_idx[newly]] = False
        return newly

    def finalize(self, ctx, state):
        state["in_core"] = state["alive"].astype(np.int64)


def kcore(engine: GraphEngine, k: int, max_steps: int = 10 ** 9) -> dict:
    """Peel to the k-core; vertex state `in_core` is 1 for survivors.
    Requires a symmetric store (load_undirected)."""
    return engine.run(KCoreProgram(), params={"k": int(k)},
                      max_steps=max_steps, run_name=f"kcore_{k}")
