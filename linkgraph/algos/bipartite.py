"""Bipartiteness / odd-cycle detection via a packed (component-label,
BFS-level) min-relaxation — CC and two-coloring in ONE superstep program.

State per vertex is a single int64 ``packed = label * 2^LEVEL_BITS +
level``; init ``v << LEVEL_BITS``.  Each superstep relaxes
``packed[dst] = min(packed[dst], min over in-nbrs (packed[src] + 1))``
(the +1 increments the level bits).  Because the label occupies the
high bits, lexicographic (label, level) min == plain int64 min, so the
engine's deterministic min-combine applies unchanged.  The fixed point
is ``packed(v) = r << LEVEL_BITS + dist(r, v)`` where r is the minimum
vertex id of v's component: labels match CC exactly and levels are BFS
hop distances from the component root.  ``level % 2`` is then a proper
2-coloring iff the component is bipartite; any edge whose endpoints
share a parity witnesses an odd cycle.

Same superstep shape as CC (toolkits/cc.cpp:22-109) with SSSP's unit
edge_transform (toolkits/sssp.cpp:43-58); converges within the
component diameter, like CC.  Levels are bounded by the unroll check in
the driver query, far below 2^LEVEL_BITS.
"""

from __future__ import annotations

import numpy as np

from ..engine import GraphEngine, VertexProgram

LEVEL_BITS = 20
LEVEL_MOD = 1 << LEVEL_BITS


class ParityCCProgram(VertexProgram):
    combine = "min"
    supports_sparse = True
    static_frontier = False
    result_columns = ["packed"]

    def init_state(self, ctx):
        if ctx.n_vertices >= (1 << (62 - LEVEL_BITS)):
            raise ValueError(
                f"vertex ids must be < 2^{62 - LEVEL_BITS} to pack "
                f"(label, level) into int64; got n={ctx.n_vertices}")
        return {"packed": np.arange(ctx.lo, ctx.hi, dtype=np.int64)
                << LEVEL_BITS}

    def signal(self, ctx, state, local_idx):
        return state["packed"][local_idx]

    def edge_transform(self, vals, weights):
        return vals + 1  # one more BFS hop (level lives in the low bits)

    def dense_src_values(self, ctx, state):
        return state["packed"]

    def dense_emit_mask(self, ctx, row_vertex, partial):
        # all packed values are finite; min-relaxation decides in apply
        return partial < np.iinfo(np.int64).max

    def apply(self, ctx, state, tgt_idx, vals):
        packed = state["packed"]
        m = vals < packed[tgt_idx]
        packed[tgt_idx[m]] = vals[m]
        return m


def parity_cc(engine: GraphEngine, max_steps: int = 10 ** 9,
              ckpt_dir: str | None = None, ckpt_every: int = 1,
              resume: bool = False) -> dict:
    """Requires a store built with symmetric=True (undirected graph)."""
    return engine.run(ParityCCProgram(), max_steps=max_steps,
                      ckpt_dir=ckpt_dir, ckpt_every=ckpt_every,
                      resume=resume, run_name="parity_cc")
