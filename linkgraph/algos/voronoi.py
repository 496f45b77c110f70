"""Graph Voronoi partition (multi-source BFS assignment): every vertex
joins the nearest of k seed vertices, ties to the smallest seed INDEX —
the seeding step of balanced graph partitioning / landmark routing /
k-center on graphs.

One packed min-relaxation (the bipartite.py trick, lexicographic
(dist, seed_idx) as a single int64): packed = dist << SEED_BITS |
seed_idx, seeds start at packed = idx, every hop adds 1 << SEED_BITS,
and the engine's deterministic min combine computes the exact
multi-source BFS Voronoi diagram in diameter-many supersteps.

SQL oracle: pipelines._voronoi_sql — the identical packed relaxation
unrolled over the symmetric edge list.
"""

from __future__ import annotations

import numpy as np

from ..engine import GraphEngine, VertexProgram

SEED_BITS = 20
_UNREACHED = np.int64((1 << 62) - 1)


class VoronoiProgram(VertexProgram):
    combine = "min"
    supports_sparse = True
    static_frontier = False
    result_columns = ["packed"]

    def init_state(self, ctx):
        seeds = ctx.params["seeds"]
        if len(seeds) >= (1 << SEED_BITS):
            raise ValueError("too many seeds for the packed layout")
        packed = np.full(ctx.n_local, _UNREACHED, dtype=np.int64)
        for i, s in enumerate(seeds):
            if ctx.lo <= s < ctx.hi:
                packed[s - ctx.lo] = i
        return {"packed": packed}

    def initial_active(self, ctx, state):
        return state["packed"] != _UNREACHED

    def signal(self, ctx, state, local_idx):
        return state["packed"][local_idx]

    def edge_transform(self, vals, weights):
        return vals + (1 << SEED_BITS)

    def dense_src_values(self, ctx, state):
        return state["packed"]

    def dense_emit_mask(self, ctx, row_vertex, partial):
        return partial < _UNREACHED

    def apply(self, ctx, state, tgt_idx, vals):
        packed = state["packed"]
        better = vals < packed[tgt_idx]
        packed[tgt_idx[better]] = vals[better]
        return better


def voronoi_assign(engine: GraphEngine, seeds: list[int],
                   max_steps: int = 64) -> dict:
    """Run to fixpoint; leaves int64 `packed` state
    ((dist << SEED_BITS) | seed_idx; sentinel for unreached)."""
    return engine.run(VoronoiProgram(), params={"seeds": list(seeds)},
                      max_steps=max_steps, run_name="voronoi")
