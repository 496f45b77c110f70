"""Widest path (maximin bottleneck capacity) from a single source.

The max-min semiring counterpart of SSSP (toolkits/sssp.cpp:24-105):
where SSSP relaxes  dist[dst] <- min(dist[dst], dist[src] + w)  this
relaxes            cap[dst]  <- max(cap[dst],  min(cap[src], w))
— the capacity of the widest path is the maximum over paths of the
minimum edge weight along the path (network-throughput routing).

Conventions mirror the SSSP program: root capacity is the INF constant
1e9 (unreachable vertices stay at 0 and are filtered from the result);
capacities are monotone NON-DECREASING, so unmasked dense pulls are
safe (a stale source capacity is a lower bound and can only produce a
weaker candidate, same monotonicity argument as sssp.py).  min/max of
exactly-representable weights involves NO float addition, so the
result is bit-exact against the SQL oracle (pipelines._widest_sql)
with no rounding tolerance needed.
"""

from __future__ import annotations

import numpy as np

from ..engine import GraphEngine, VertexProgram

INF_CAP = 1e9  # the sssp.cpp:33 sentinel convention, reused for the root


class WidestPathProgram(VertexProgram):
    combine = "max"
    supports_sparse = True
    static_frontier = False
    result_columns = ["capacity"]

    def init_state(self, ctx):
        cap = np.zeros(ctx.n_local, dtype=np.float64)
        root = ctx.params["root"]
        if ctx.lo <= root < ctx.hi:
            cap[root - ctx.lo] = INF_CAP
        return {"capacity": cap}

    def initial_active(self, ctx, state):
        active = np.zeros(ctx.n_local, dtype=bool)
        root = ctx.params["root"]
        if ctx.lo <= root < ctx.hi:
            active[root - ctx.lo] = True
        return active

    def signal(self, ctx, state, local_idx):
        return state["capacity"][local_idx]

    def edge_transform(self, vals, weights):
        if weights is None:
            return np.minimum(vals, 1.0)
        return np.minimum(vals, weights)

    def dense_src_values(self, ctx, state):
        return state["capacity"]

    def dense_emit_mask(self, ctx, row_vertex, partial):
        return partial > 0.0  # only candidates through reached sources

    def apply(self, ctx, state, tgt_idx, vals):
        cap = state["capacity"]
        m = vals > cap[tgt_idx]
        cap[tgt_idx[m]] = vals[m]
        return m


def widest_path(engine: GraphEngine, root: int,
                ckpt_dir: str | None = None, ckpt_every: int = 1,
                resume: bool = False) -> dict:
    return engine.run(WidestPathProgram(), params={"root": int(root)},
                      ckpt_dir=ckpt_dir, ckpt_every=ckpt_every,
                      resume=resume, run_name=f"widest_root{root}")
