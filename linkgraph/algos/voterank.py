"""VoteRank influential spreaders (Zhang, Lu, Goh, Stanley 2016): K
rounds of vote-and-suppress over the undirected graph —

    score_t(v) = sum of va_t(u) over neighbors u
    select the max-score unselected vertex (ties -> smallest id);
    its va drops to 0 and each NEIGHBOR's va decreases by
    delta = 1 / <k> (mean degree), floored at 0.

Coverage-widening; no reference implementation.  All voting state is
EXACT INTEGER UNITS of 1/(2|E|): va starts at U = 2|E| units and
delta is |V| units (delta = |V|/(2|E|) = 1/<k>), so scores are int64
sums — the argmax can never flip on float summation order, and the
unrolled SQL oracle matches bit-for-bit (the repo's integer-units
convention, e.g. relational.top_supplier).

Scale shape: each round is ONE full add-combine superstep (score), a
max/min map_vertices pair (global argmax with id tie-break), and ONE
single-source suppression superstep — K * 2 supersteps total, each the
cost of a PageRank step; no per-vertex data leaves the cluster."""

from __future__ import annotations

import numpy as np

from ..engine import GraphEngine, VertexProgram

VOTERANK_K = 10


class VoteScoreProgram(VertexProgram):
    """One scoring superstep: every vertex signals its integer va;
    targets accumulate int64 scores."""

    combine = "add"
    supports_sparse = True
    static_frontier = True
    continues = True
    result_columns = []

    def init_state(self, ctx, prev=None):
        if prev and "va" in prev:
            prev["score"][:] = 0
            return prev
        u = ctx.params["unit"]
        return {"va": np.full(ctx.n_local, u, dtype=np.int64),
                "score": np.zeros(ctx.n_local, dtype=np.int64),
                "rank": np.full(ctx.n_local, -1, dtype=np.int64),
                "sel_score": np.zeros(ctx.n_local, dtype=np.int64)}

    def signal(self, ctx, state, local_idx):
        return state["va"][local_idx]

    def dense_src_values(self, ctx, state):
        return state["va"]

    def apply(self, ctx, state, tgt_idx, vals):
        state["score"][tgt_idx] += vals
        return np.zeros(len(tgt_idx), dtype=bool)


class VoteSuppressProgram(VertexProgram):
    """Selection bookkeeping + one suppression superstep: the selected
    vertex (params['sel'], round params['rnk']) zeroes its va, records
    its winning score, and sends delta units to its neighbors, whose
    va floors at 0."""

    combine = "add"
    supports_sparse = True
    continues = True
    result_columns = []

    def init_state(self, ctx, prev=None):
        sel = ctx.params["sel"]
        if ctx.lo <= sel < ctx.hi:
            li = sel - ctx.lo
            prev["rank"][li] = ctx.params["rnk"]
            prev["sel_score"][li] = prev["score"][li]
            prev["va"][li] = 0
        return prev

    def initial_active(self, ctx, state):
        active = np.zeros(ctx.n_local, dtype=bool)
        sel = ctx.params["sel"]
        if ctx.lo <= sel < ctx.hi:
            active[sel - ctx.lo] = True
        return active

    def signal(self, ctx, state, local_idx):
        return np.full(len(local_idx), ctx.params["delta"],
                       dtype=np.int64)

    def dense_src_values(self, ctx, state):
        return np.full(ctx.n_local, ctx.params["delta"], dtype=np.int64)

    def dense_src_mask(self, ctx, state, active):
        return active

    def dense_emit_mask(self, ctx, row_vertex, partial):
        return partial != 0

    def apply(self, ctx, state, tgt_idx, vals):
        va = state["va"]
        va[tgt_idx] = np.maximum(va[tgt_idx] - vals, 0)
        return np.zeros(len(tgt_idx), dtype=bool)


def voterank(engine: GraphEngine, k: int = VOTERANK_K,
             round_to: int = 6):
    """Run K vote-and-suppress rounds over an UNDIRECTED store; returns
    (rnk, v, score) with score = units / (2|E|) rounded."""
    import pandas as pd

    unit = int(engine.meta["n_edges"])      # symmetric store: 2|E|
    delta = int(engine.meta["n_vertices"])  # |V| units = 1/<k> of a vote

    rows = []
    for rnd in range(1, k + 1):
        engine.run(VoteScoreProgram(), params={"unit": unit},
                   max_steps=1, run_name=f"voterank_score{rnd}")
        m = engine.map_vertices(
            lambda ctx, state, active: float(
                state["score"][state["rank"] < 0].max(initial=-1)),
            reduce="max")
        m = int(m)
        sel = -int(engine.map_vertices(
            lambda ctx, state, active, _m=m: float(
                (-np.arange(ctx.lo, ctx.hi)[
                    (state["rank"] < 0) & (state["score"] == _m)])
                .max(initial=-2**62)),
            reduce="max"))
        engine.run(VoteSuppressProgram(),
                   params={"sel": sel, "rnk": rnd, "delta": delta,
                           "unit": unit},
                   max_steps=1, run_name=f"voterank_sup{rnd}")
        rows.append((rnd, sel, round(m / unit, round_to)))
    return pd.DataFrame({"rnk": np.array([r for r, _, _ in rows],
                                         np.int64),
                         "v": np.array([v for _, v, _ in rows],
                                       np.int64),
                         "score": np.array([s for _, _, s in rows],
                                           np.float64)})
