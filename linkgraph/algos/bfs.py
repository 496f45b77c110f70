"""BFS producing a parent tree (toolkits/bfs.cpp:22-109).

Reference semantics: parent[v] = |V| means unreached (bfs.cpp:31-35);
root's parent is itself; frontier starts at {root}; push mode CASes the
first arriving src as parent (bfs.cpp:46-58), pull mode scans in-adj for
any active parent (direction-optimizing, bfs.cpp:60-68); stop when the
frontier empties.

Deviation (documented): the reference's CAS keeps whichever src wins the
race — nondeterministic; we take the MINIMUM src id among same-level
candidates, a valid BFS tree that is deterministic and partition-count
invariant.  The reference's own checkable output (found_vertices count,
bfs.cpp:95-103) is identical.
"""

from __future__ import annotations

import numpy as np

from ..engine import GraphEngine, VertexProgram


class BFSProgram(VertexProgram):
    combine = "min"
    supports_sparse = True
    static_frontier = False
    dense_selective = True  # skip visited dsts in pull mode (bfs.cpp:61,:77)
    result_columns = ["parent"]

    def init_state(self, ctx):
        inf = ctx.params.get("inf", ctx.n_vertices)
        parent = np.full(ctx.n_local, inf, dtype=np.int64)
        root = ctx.params["root"]
        if ctx.lo <= root < ctx.hi:
            parent[root - ctx.lo] = root
        return {"parent": parent}

    def initial_active(self, ctx, state):
        active = np.zeros(ctx.n_local, dtype=bool)
        root = ctx.params["root"]
        if ctx.lo <= root < ctx.hi:
            active[root - ctx.lo] = True
        return active

    def signal(self, ctx, state, local_idx):
        return local_idx + ctx.lo  # msg = src id (bfs.cpp:47)

    def dense_src_values(self, ctx, state):
        return np.arange(ctx.lo, ctx.hi, dtype=np.int64)

    def dense_src_mask(self, ctx, state, active):
        return active  # pull scans ACTIVE in-neighbors only (bfs.cpp:62-66)

    def dense_emit_mask(self, ctx, row_vertex, partial):
        return partial < np.iinfo(np.int64).max

    def selective_mask(self, ctx, state):
        inf = ctx.params.get("inf", ctx.n_vertices)
        return state["parent"] != inf  # visited (bfs.cpp:79-85)

    def apply(self, ctx, state, tgt_idx, vals):
        parent = state["parent"]
        inf = ctx.params.get("inf", ctx.n_vertices)
        m = parent[tgt_idx] == inf  # only unvisited adopt (bfs.cpp:51, :72)
        parent[tgt_idx[m]] = vals[m]
        return m


def bfs(engine: GraphEngine, root: int, ckpt_dir: str | None = None,
        ckpt_every: int = 1, resume: bool = False) -> dict:
    return engine.run(BFSProgram(), params={"root": int(root)},
                      ckpt_dir=ckpt_dir, ckpt_every=ckpt_every, resume=resume,
                      run_name=f"bfs_root{root}")


def found_vertices(engine: GraphEngine) -> int:
    """bfs.cpp:95-103 invariant: vertices with parent < |V|."""
    return int(engine.map_vertices(
        lambda ctx, state, active:
        float((state["parent"] < ctx.n_vertices).sum())))
