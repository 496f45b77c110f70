"""HITS (hubs & authorities, Kleinberg 1999) on the superstep engine.

Not in the reference toolkit set — added as a coverage-widening algorithm
exercising the transpose operator (graph.hpp:759-768 analog,
GraphShard.transpose) INSIDE an iteration loop instead of once between
phases (contrast algos/bc.py):

  auth_t[v] = sum of hub_{t-1}[u] over in-edges  u -> v   (normal orient)
  hub_t[v]  = sum of auth_t[w]   over out-edges  v -> w   (transposed)

Each half-iteration is one static-frontier dense superstep; the engine's
message flow is always src -> dst, so the hub half runs on the transposed
shards (a zero-copy pointer swap per shard, twice per iteration).

Scores stay UNNORMALIZED through the recurrence — the recurrence is
linear, so per-iteration L1 normalization only rescales both vectors by
global constants and the final L1-normalized scores are identical; one
driver-side normalization at the end avoids a global reduce per
half-step.  float64 holds the unnormalized growth comfortably at any
realistic iteration count (magnitudes ~ lambda_max^iters << 1e308).
"""

from __future__ import annotations

import numpy as np

from ..engine import GraphEngine, VertexProgram


class _HalfStep(VertexProgram):
    """One dense superstep accumulating `out_col[dst] = sum in_col[src]`
    over the CURRENT orientation; state persists across runs
    (continues=True) so the two halves alternate on one state dict."""

    combine = "add"
    supports_sparse = False
    static_frontier = True
    continues = True

    in_col: str
    out_col: str

    def init_state(self, ctx, prev=None):
        state = prev if prev else {}
        if "hub" not in state or ctx.params.get("fresh"):
            # fresh=True on the first half-step of a hits() call: a CACHED
            # engine keeps state across runs, so without the reset a second
            # hits() would resume from the previous converged vectors
            state["hub"] = np.ones(ctx.n_local, dtype=np.float64)
            state["auth"] = np.zeros(ctx.n_local, dtype=np.float64)
        # fresh accumulator: vertices with no contributing neighbors keep 0
        state[self.out_col] = np.zeros(ctx.n_local, dtype=np.float64)
        return state

    def signal(self, ctx, state, local_idx):
        return state[self.in_col][local_idx]

    def dense_src_values(self, ctx, state):
        return state[self.in_col]

    def apply(self, ctx, state, tgt_idx, vals):
        state[self.out_col][tgt_idx] += vals
        return np.zeros(len(tgt_idx), dtype=bool)


class HitsAuthStep(_HalfStep):
    in_col, out_col = "hub", "auth"
    result_columns = ["auth", "hub"]


class HitsHubStep(_HalfStep):
    in_col, out_col = "auth", "hub"


def hits(engine: GraphEngine, iterations: int = 5) -> dict:
    """Run `iterations` full HITS sweeps; leaves UNNORMALIZED float64
    `auth` / `hub` vertex state (normalize via `normalized_scores` or the
    caller's own reduce).  Returns the last half-step's run report plus
    step count."""
    import ray

    rep = None
    for it in range(iterations):
        rep = engine.run(HitsAuthStep(), params={"fresh": it == 0},
                         max_steps=1, run_name=f"hits_auth_{it}")
        ray.get([s.transpose.remote() for s in engine.shards])
        try:
            rep = engine.run(HitsHubStep(), max_steps=1,
                             run_name=f"hits_hub_{it}")
        finally:
            ray.get([s.transpose.remote() for s in engine.shards])
    return {"n_iterations": iterations, "last": rep}


def normalized_scores(engine: GraphEngine):
    """L1-normalized (auth, hub) sums for driver-side scaling: the two
    global sums via map_vertices (process_vertices analog), NOT a
    state materialization."""
    s_auth = engine.map_vertices(
        lambda ctx, state, active: float(state["auth"].sum()))
    s_hub = engine.map_vertices(
        lambda ctx, state, active: float(state["hub"].sum()))
    return max(s_auth, 1e-300), max(s_hub, 1e-300)
