"""Sampled harmonic centrality (coverage-widening): for a seed set S,
harm(v) = sum over s in S, dist(s,v) finite and > 0, of 1/dist(s,v) —
the standard scalable estimator of closeness-family centralities (run
from a seed sample instead of every vertex; at 1e12 vertices S is a
random sample, here a fixed deterministic seed list).

One engine run per seed: a BFS-with-depth program (min combine,
direction-optimizing dense-selective pull like algos/bfs.py) whose
`continues` state carries the running 1/d accumulator across runs —
no per-seed |V| collection on the driver.

SQL oracle: pipelines._harmonic_sql — one unrolled BFS depth chain per
seed, summed left-to-right in seed order (the engine's accumulation
order, so float association matches)."""

from __future__ import annotations

import numpy as np

from ..engine import GraphEngine, VertexProgram

_INF = np.int64(1 << 60)


class HarmonicProgram(VertexProgram):
    combine = "min"
    supports_sparse = True
    dense_selective = True
    continues = True
    result_columns = ["harmonic"]

    def init_state(self, ctx, prev=None):
        # the first seed of a sweep RESETS the accumulator — engines are
        # cached and reused across queries, so carried-over state must
        # never leak between sweeps (or from another program's run)
        fresh = ctx.params.get("reset", False) or not (
            prev and "harmonic" in prev)
        harm = (np.zeros(ctx.n_local, dtype=np.float64) if fresh
                else prev["harmonic"])
        depth = np.full(ctx.n_local, _INF, dtype=np.int64)
        root = ctx.params["root"]
        if ctx.lo <= root < ctx.hi:
            depth[root - ctx.lo] = 0
        return {"depth": depth, "harmonic": harm}

    def initial_active(self, ctx, state):
        active = np.zeros(ctx.n_local, dtype=bool)
        root = ctx.params["root"]
        if ctx.lo <= root < ctx.hi:
            active[root - ctx.lo] = True
        return active

    def signal(self, ctx, state, local_idx):
        return state["depth"][local_idx] + 1

    def dense_src_values(self, ctx, state):
        # +1 saturates at _INF-adjacent values only for unvisited srcs,
        # which the mask below excludes
        return state["depth"] + 1

    def dense_src_mask(self, ctx, state, active):
        return active

    def dense_emit_mask(self, ctx, row_vertex, partial):
        return partial < _INF

    def selective_mask(self, ctx, state):
        return state["depth"] != _INF

    def apply(self, ctx, state, tgt_idx, vals):
        depth = state["depth"]
        m = depth[tgt_idx] == _INF
        depth[tgt_idx[m]] = vals[m]
        return m

    def finalize(self, ctx, state):
        d = state["depth"]
        m = (d > 0) & (d < _INF)
        state["harmonic"][m] += 1.0 / d[m]


def harmonic_centrality(engine: GraphEngine, seeds: list[int]) -> list[dict]:
    """Run one BFS per seed, accumulating 1/d in place; read the result
    via engine.state_pandas(["harmonic"]).  Returns per-seed reports."""
    reports = []
    for i, s in enumerate(seeds):
        reports.append(engine.run(HarmonicProgram(),
                                  params={"root": int(s), "reset": i == 0},
                                  run_name=f"harmonic_{int(s)}"))
    return reports


def _count_reached(ctx, state, active):
    return float((state["depth"] < _INF).sum())


def _sum_depth(ctx, state, active):
    d = state["depth"]
    return float(d[d < _INF].sum())


def closeness_from_seeds(engine: GraphEngine, seeds: list[int]):
    """Sampled closeness centrality: one BFS-with-depth run per seed;
    closeness(s) = (n_reached - 1) / sum of finite depths (the standard
    per-source closeness; at web scale seeds are a vertex sample).

    Both reductions are EXACT integer counts gathered via the
    process_vertices analog (engine.map_vertices — graph.hpp:1406-1468),
    so the final float division is bit-identical between the engine and
    the SQL oracle.  Returns [(seed, n_reached, sum_depth, report)]."""
    out = []
    for s in seeds:
        rep = engine.run(HarmonicProgram(),
                         params={"root": int(s), "reset": True},
                         run_name=f"closeness_{int(s)}")
        reached = int(engine.map_vertices(_count_reached))
        sumd = int(engine.map_vertices(_sum_depth))
        out.append((int(s), reached, sumd, rep))
    return out
