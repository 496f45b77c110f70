"""SALSA (Stochastic Approach for Link-Structure Analysis, Lempel &
Moran 2000) on the superstep engine.

Not in the reference toolkit set — a coverage-widening algorithm pairing
with HITS (algos/hits.py): the same two-half-step transpose sandwich, but
each hop is a RANDOM-WALK step (degree-normalized) instead of a plain
sum, i.e. the authority chain is a walk on the bipartite hub/authority
view of the graph:

  auth_t[v] = sum over in-edges  u -> v of hub_{t-1}[u] / out_deg(u)
  hub_t[u]  = sum over out-edges u -> v of auth_t[v]    / in_deg(v)

Each half runs as one static-frontier dense superstep; the hub half runs
on the transposed shards (GraphShard.transpose — a pointer swap that
also swaps the degree arrays, so `ctx.out_deg` IS the original in-degree
during that half, exactly the divisor the walk needs; see
shards.py:202-211, graph.hpp:759-768 analog).

Like HITS, the recurrence is linear, so per-iteration L1 normalization
is a pure rescale — scores stay unnormalized through the iterations and
one driver-side L1 normalization at the end recovers the stationary
shape.  Unlike HITS the degree normalization makes every iterate a
probability-mass redistribution, so magnitudes stay O(|V|) at any
iteration count.
"""

from __future__ import annotations

import numpy as np

from ..engine import GraphEngine, VertexProgram


class _SalsaHalf(VertexProgram):
    """One dense superstep of `out_col[dst] += in_col[src]/deg(src)` over
    the CURRENT orientation, where deg is the orientation's out-degree
    (original out-degree in the auth half, original in-degree after the
    transpose in the hub half).  State persists across runs
    (continues=True) so the halves alternate on one state dict."""

    combine = "add"
    supports_sparse = False
    static_frontier = True
    continues = True

    in_col: str
    out_col: str

    def init_state(self, ctx, prev=None):
        state = prev if prev else {}
        if "hub" not in state or ctx.params.get("fresh"):
            # same fresh-reset convention as hits._HalfStep: a CACHED
            # engine keeps state across runs
            state["hub"] = np.ones(ctx.n_local, dtype=np.float64)
            state["auth"] = np.zeros(ctx.n_local, dtype=np.float64)
        state[self.out_col] = np.zeros(ctx.n_local, dtype=np.float64)
        return state

    def _walk_values(self, ctx, x):
        deg = ctx.out_deg
        # zero-degree vertices have no out-edges in this orientation, so
        # their value never ships; the where() only silences 0/0
        return np.where(deg > 0, x / np.maximum(deg, 1), 0.0)

    def signal(self, ctx, state, local_idx):
        return self._walk_values(ctx, state[self.in_col])[local_idx]

    def dense_src_values(self, ctx, state):
        return self._walk_values(ctx, state[self.in_col])

    def apply(self, ctx, state, tgt_idx, vals):
        state[self.out_col][tgt_idx] += vals
        return np.zeros(len(tgt_idx), dtype=bool)


class SalsaAuthStep(_SalsaHalf):
    in_col, out_col = "hub", "auth"
    result_columns = ["auth", "hub"]


class SalsaHubStep(_SalsaHalf):
    in_col, out_col = "auth", "hub"


def salsa(engine: GraphEngine, iterations: int = 5) -> dict:
    """Run `iterations` full SALSA sweeps; leaves UNNORMALIZED float64
    `auth` / `hub` vertex state (L1-normalize driver-side via
    hits.normalized_scores — the state columns match)."""
    import ray

    rep = None
    for it in range(iterations):
        rep = engine.run(SalsaAuthStep(), params={"fresh": it == 0},
                         max_steps=1, run_name=f"salsa_auth_{it}")
        ray.get([s.transpose.remote() for s in engine.shards])
        try:
            rep = engine.run(SalsaHubStep(), max_steps=1,
                             run_name=f"salsa_hub_{it}")
        finally:
            ray.get([s.transpose.remote() for s in engine.shards])
    return {"n_iterations": iterations, "last": rep}
