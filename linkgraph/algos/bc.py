"""Betweenness centrality from one root (toolkits/bc.cpp:24-196).

Two phases on the SAME shard pool:

  forward   BFS by level accumulating num_paths[dst] += num_paths[src]
            for unvisited dsts (bc.cpp:54-91); each level's newly-reached
            frontier mask is pushed on a per-shard stack;
  backward  on the TRANSPOSED graph (transpose(), bc.cpp:121 — a
            zero-copy push/pull swap in every shard), dependencies flow
            one level up per superstep: dep[dst] += Σ dep[src] over
            deeper-level in-neighbors, unvisited guard (bc.cpp:125-168);
            after each step the next level gets dep += 1/num_paths
            (bc.cpp:148-166);
  final     dep = (dep - inv) / inv  (bc.cpp:170-176) — algebraically
            Brandes' single-source dependency δ(v) = Σ_w σ(v)/σ(w)(1+δ(w)).

Unreached vertices end with num_paths=0 → inv=inf → dependency NaN,
matching the reference's arithmetic.
"""

from __future__ import annotations

import numpy as np

from ..engine import GraphEngine, VertexProgram


class BCForwardProgram(VertexProgram):
    combine = "add"
    supports_sparse = True
    result_columns = ["num_paths"]

    def init_state(self, ctx, prev=None):
        num_paths = np.zeros(ctx.n_local, dtype=np.float64)
        visited = np.zeros(ctx.n_local, dtype=bool)
        root = ctx.params["root"]
        level0 = np.zeros(ctx.n_local, dtype=bool)
        if ctx.lo <= root < ctx.hi:
            num_paths[root - ctx.lo] = 1.0
            visited[root - ctx.lo] = True
            level0[root - ctx.lo] = True
        return {"num_paths": num_paths, "visited": visited,
                "_levels": [level0]}

    def initial_active(self, ctx, state):
        return state["_levels"][0].copy()

    def signal(self, ctx, state, local_idx):
        return state["num_paths"][local_idx]

    def dense_src_values(self, ctx, state):
        return state["num_paths"]

    def dense_src_mask(self, ctx, state, active):
        return active  # pull sums ACTIVE in-neighbors only (bc.cpp:74-79)

    def apply(self, ctx, state, tgt_idx, vals):
        m = ~state["visited"][tgt_idx]  # unvisited guard (bc.cpp:60, :86)
        state["num_paths"][tgt_idx[m]] += vals[m]
        return m

    def after_step(self, ctx, state, new_active):
        state["visited"] |= new_active  # bc.cpp:92-99
        state["_levels"].append(new_active.copy())
        return None


class BCBackwardProgram(VertexProgram):
    combine = "add"
    supports_sparse = True
    continues = True  # reuses forward state (num_paths, _levels)

    def init_state(self, ctx, prev=None):
        state = prev
        with np.errstate(divide="ignore"):
            inv = 1.0 / state["num_paths"]  # inf where unreached (bc.cpp:103-111)
        dep = np.zeros(ctx.n_local, dtype=np.float64)
        levels = state["_levels"]
        if len(levels) > 1 and not levels[-1].any():
            levels.pop()  # forward's empty terminal frontier
        visited = levels[-1].copy()
        dep[visited] += inv[visited]  # bc.cpp:112-119
        state.update({"inv": inv, "dep": dep, "visited": visited})
        return state

    def initial_active(self, ctx, state):
        return state["_levels"][-1].copy()

    def signal(self, ctx, state, local_idx):
        return state["dep"][local_idx]

    def dense_src_values(self, ctx, state):
        return state["dep"]

    def dense_src_mask(self, ctx, state, active):
        return active  # deeper level only (bc.cpp:152-156)

    def apply(self, ctx, state, tgt_idx, vals):
        m = ~state["visited"][tgt_idx]  # bc.cpp:144, :160
        state["dep"][tgt_idx[m]] += vals[m]
        return m

    def after_step(self, ctx, state, new_active):
        levels = state["_levels"]
        levels.pop()
        if len(levels) == 0:
            return np.zeros(ctx.n_local, dtype=bool)
        top = levels[-1]
        state["visited"] |= top
        state["dep"][top] += state["inv"][top]  # bc.cpp:148-166
        if len(levels) == 1:
            return np.zeros(ctx.n_local, dtype=bool)  # root level: done
        return top.copy()

    def finalize(self, ctx, state):
        with np.errstate(invalid="ignore", divide="ignore"):
            state["dependencies"] = (
                (state["dep"] - state["inv"]) / state["inv"])  # bc.cpp:170-176


def betweenness(engine: GraphEngine, root: int) -> dict:
    """Single-root BC; results in state columns `dependencies`,
    `num_paths` (read via engine.state_pandas)."""
    fwd = engine.run(BCForwardProgram(), params={"root": int(root)},
                     run_name=f"bc_fwd_root{root}")
    for s in engine.shards:
        s.transpose.remote()
    try:
        bwd = engine.run(BCBackwardProgram(), params={"root": int(root)},
                         max_steps=max(1, fwd["n_steps"]),
                         run_name=f"bc_bwd_root{root}")
    finally:
        import ray

        ray.get([s.transpose.remote() for s in engine.shards])
    return {"forward": fwd, "backward": bwd}
