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
    dense_selective = True  # skip visited dsts in pull (bc.cpp:71)
    result_columns = ["num_paths"]

    def selective_mask(self, ctx, state):
        return state["visited"]

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
    dense_selective = True  # skip settled dsts in pull (bc.cpp:140)

    def selective_mask(self, ctx, state):
        return state["visited"]

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


class BCForwardCompact(BCForwardProgram):
    """Compact-variant forward phase (bc.cpp:199-404): levels stored as
    ONE int64 array `_level` (-1 = unreached) instead of a stack of
    per-level masks — memory O(n_local) instead of O(levels * n_local)
    on deep graphs (the reason the reference ships both variants)."""

    def init_state(self, ctx, prev=None):
        state = super().init_state(ctx, prev)
        level = np.full(ctx.n_local, -1, dtype=np.int64)
        level[state["_levels"][0]] = 0
        state["_level"] = level
        state["_step"] = np.array([0], dtype=np.int64)  # current depth
        del state["_levels"]
        return state

    def initial_active(self, ctx, state):
        return state["_level"] == 0

    def after_step(self, ctx, state, new_active):
        state["visited"] |= new_active
        state["_step"][0] += 1
        state["_level"][new_active] = state["_step"][0]
        return None


class BCBackwardCompact(BCBackwardProgram):
    """Compact-variant backward phase: level masks derived on demand
    from `_level` (bc.cpp:297-404's level[] walk)."""

    def init_state(self, ctx, prev=None):
        state = prev
        with np.errstate(divide="ignore"):
            inv = 1.0 / state["num_paths"]
        dep = np.zeros(ctx.n_local, dtype=np.float64)
        # deepest level actually REACHED anywhere: the driver passes it
        # via params (max of per-shard values isn't visible shard-locally)
        state["_cur"] = np.array([ctx.params["max_level"]], dtype=np.int64)
        top = state["_level"] == state["_cur"][0]
        dep[top] += inv[top]
        state.update({"inv": inv, "dep": dep, "visited": top.copy()})
        return state

    def initial_active(self, ctx, state):
        return state["_level"] == state["_cur"][0]

    def after_step(self, ctx, state, new_active):
        state["_cur"][0] -= 1
        cur = state["_cur"][0]
        if cur < 0:
            return np.zeros(ctx.n_local, dtype=bool)
        top = state["_level"] == cur
        state["visited"] |= top
        state["dep"][top] += state["inv"][top]
        if cur == 0:
            return np.zeros(ctx.n_local, dtype=bool)  # root level: done
        return top


def betweenness(engine: GraphEngine, root: int, compact: bool = False) -> dict:
    """Single-root BC; results in state columns `dependencies`,
    `num_paths` (read via engine.state_pandas).

    compact=True uses the reference's compact variant (bc.cpp:199-404):
    one level array instead of a per-level mask stack — same results
    (tests assert equality), O(n) memory on deep graphs."""
    import ray

    params = {"root": int(root)}
    if compact:
        fwd = engine.run(BCForwardCompact(), params=params,
                         run_name=f"bc_fwd_root{root}")
        # deepest reached level = number of supersteps that activated
        # anything; the last step of the report may be the empty frontier
        max_level = max((s["step"] + 1 for s in fwd["steps"]
                         if s["active_out"] > 0), default=0)
        bwd_prog = BCBackwardCompact()
        bwd_params = {**params, "max_level": int(max_level)}
    else:
        fwd = engine.run(BCForwardProgram(), params=params,
                         run_name=f"bc_fwd_root{root}")
        bwd_prog = BCBackwardProgram()
        bwd_params = params
    for s in engine.shards:
        s.transpose.remote()
    try:
        bwd = engine.run(bwd_prog, params=bwd_params,
                         max_steps=max(1, fwd["n_steps"]),
                         run_name=f"bc_bwd_root{root}")
    finally:
        ray.get([s.transpose.remote() for s in engine.shards])
    return {"forward": fwd, "backward": bwd}


class BCForwardAccum(BCForwardProgram):
    """Forward phase that CARRIES a cross-root dependency accumulator
    (`bc_acc`) through its continues-state — sampled betweenness runs
    one Brandes pass per root without ever collecting |V| rows on the
    driver between roots (same accumulator pattern as
    algos/harmonic.py)."""

    continues = True

    def init_state(self, ctx, prev=None):
        state = super().init_state(ctx, prev)
        fresh = ctx.params.get("reset", False) or not (
            prev and "bc_acc" in prev)
        state["bc_acc"] = (np.zeros(ctx.n_local, dtype=np.float64)
                           if fresh else prev["bc_acc"])
        return state


class BCBackwardAccum(BCBackwardProgram):
    """Backward phase that folds this root's finite dependencies into
    the running accumulator."""

    result_columns = ["bc"]

    def finalize(self, ctx, state):
        super().finalize(ctx, state)
        d = state["dependencies"]
        fin = np.isfinite(d)
        state["bc_acc"][fin] += d[fin]
        state["bc"] = state["bc_acc"]


def betweenness_sampled(engine: GraphEngine, roots: list[int]) -> list[dict]:
    """Sampled betweenness (the standard scalable estimator: Brandes
    from a root sample, dependencies summed): one forward+backward pass
    per root, accumulator carried in engine state.  Read the result via
    engine.state_pandas(["bc"])."""
    import ray

    reports = []
    for i, r in enumerate(roots):
        params = {"root": int(r), "reset": i == 0}
        fwd = engine.run(BCForwardAccum(), params=params,
                         run_name=f"bcs_fwd_root{r}")
        ray.get([s.transpose.remote() for s in engine.shards])
        try:
            bwd = engine.run(BCBackwardAccum(), params=params,
                             max_steps=max(1, fwd["n_steps"]),
                             run_name=f"bcs_bwd_root{r}")
        finally:
            ray.get([s.transpose.remote() for s in engine.shards])
        reports.append({"forward": fwd, "backward": bwd})
    return reports
