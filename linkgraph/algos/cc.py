"""Connected components: min-label propagation over a symmetric graph
(toolkits/cc.cpp:22-109; graph loaded undirected, cc.cpp:121).

label[v] = v initially; each superstep propagates the min label along
edges; a vertex whose label decreased re-enters the frontier; stop when
the frontier empties (cc.cpp:39).  Dense pull takes min over ALL
in-neighbors (cc.cpp:60-66 — labels are monotone so stale reads are
safe) and emits only when the partial beats dst's own id (cc.cpp:67-69).
Exact labels required by the north rule (min vertex id per component).
"""

from __future__ import annotations

import numpy as np

from ..engine import GraphEngine, VertexProgram


class CCProgram(VertexProgram):
    combine = "min"
    supports_sparse = True
    static_frontier = False
    result_columns = ["label"]

    def init_state(self, ctx):
        return {"label": np.arange(ctx.lo, ctx.hi, dtype=np.int64)}

    def signal(self, ctx, state, local_idx):
        return state["label"][local_idx]

    def dense_src_values(self, ctx, state):
        return state["label"]

    def dense_emit_mask(self, ctx, row_vertex, partial):
        return partial < row_vertex  # cc.cpp:67-69

    def apply(self, ctx, state, tgt_idx, vals):
        lab = state["label"]
        m = vals < lab[tgt_idx]
        lab[tgt_idx[m]] = vals[m]
        return m


def connected_components(engine: GraphEngine, max_steps: int = 10 ** 9,
                         ckpt_dir: str | None = None, ckpt_every: int = 1,
                         resume: bool = False) -> dict:
    """Requires a store built with symmetric=True (symmetrized edges)."""
    return engine.run(CCProgram(), max_steps=max_steps, ckpt_dir=ckpt_dir,
                      ckpt_every=ckpt_every, resume=resume, run_name="cc")


def component_count(engine: GraphEngine):
    """Distributed distinct-count of labels (cc.cpp:90-104 reporting)."""
    return len(engine.state_dataset(["label"]).unique("label"))
