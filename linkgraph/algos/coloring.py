"""Greedy graph coloring: deterministic Jones-Plassmann rounds on a
symmetric graph (coverage-widening; not in the reference toolkit —
classic frontier-superstep algorithm in the Gemini style, same
two-phase shape as algos/mis.py).

Priorities are the repo's deterministic sha order statistics
(mis.hash_priority).  One JP ROUND is TWO supersteps:

  select     every uncolored vertex signals its priority (histogram
             combine, min taken in hist_apply); an uncolored vertex
             whose priority is strictly below every uncolored
             neighbor's (or that heard nothing) colors itself with the
             SMALLEST color not yet forbidden by its colored neighbors.
             Adjacent vertices can never color in the same round.
  broadcast  newly-colored vertices signal their color; uncolored
             receivers add it to their forbidden set.

Rounds repeat until no vertex is uncolored.  The greedy invariant: when
v colors, every higher-priority neighbor is already colored and has
broadcast, so v's forbidden set is exactly the colors of its
higher-priority neighbors — the sequential greedy coloring in priority
order, computed in parallel rounds.

SQL oracle: pipelines._coloring_sql unrolls the same recurrence.
Requires a symmetric store (load_undirected)."""

from __future__ import annotations

import numpy as np

from ..engine import GraphEngine, VertexProgram
from .mis import hash_priority

UNCOLORED = -1
_PRI_MAX = np.iinfo(np.int64).max


class ColoringProgram(VertexProgram):
    combine = "hist"
    supports_sparse = False
    result_columns = ["color"]

    def init_state(self, ctx):
        vids = np.arange(ctx.lo, ctx.hi, dtype=np.int64)
        return {"color": np.full(ctx.n_local, UNCOLORED, np.int64),
                "pri": hash_priority(vids).astype(np.int64),  # 52-bit exact
                "msg_min": np.full(ctx.n_local, _PRI_MAX, np.int64),
                "newly": np.zeros(ctx.n_local, dtype=bool),
                "forb": np.zeros((ctx.n_local, 64), dtype=bool),
                "_phase": np.array([0], np.int64)}  # 0 select, 1 broadcast

    def initial_active(self, ctx, state):
        return np.ones(ctx.n_local, dtype=bool)

    def dense_src_values(self, ctx, state):
        if int(state["_phase"][0]) == 0:
            return state["pri"]
        return state["color"]

    def dense_src_mask(self, ctx, state, active):
        return active  # uncolored (select) / newly-colored (broadcast)

    def hist_apply(self, ctx, state, tgt_idx, labels, counts):
        if int(state["_phase"][0]) == 0:  # select: neighbor pri minima
            np.minimum.at(state["msg_min"], tgt_idx, labels)
            return np.zeros(len(tgt_idx), dtype=bool)
        # broadcast: extend forbidden sets of uncolored receivers
        un = state["color"][tgt_idx] == UNCOLORED
        if un.any():
            t, c = tgt_idx[un], labels[un]
            forb = state["forb"]
            need = int(c.max()) + 1
            if need > forb.shape[1]:
                grown = np.zeros((forb.shape[0], max(need, 2 * forb.shape[1])),
                                 dtype=bool)
                grown[:, :forb.shape[1]] = forb
                state["forb"] = forb = grown
            forb[t, c] = True
        return np.zeros(len(tgt_idx), dtype=bool)

    def post_step(self, ctx, state, active, step, final) -> dict:
        if int(state["_phase"][0]) == 0:
            und = state["color"] == UNCOLORED
            join = und & (state["pri"] < state["msg_min"])
            rows = np.flatnonzero(join)
            if len(rows):
                forb = state["forb"]
                while forb[rows].all(axis=1).any():  # no free slot: grow
                    grown = np.zeros((forb.shape[0], 2 * forb.shape[1]),
                                     dtype=bool)
                    grown[:, :forb.shape[1]] = forb
                    state["forb"] = forb = grown
                # first False per row == smallest unforbidden color
                state["color"][rows] = np.argmin(forb[rows], axis=1)
            state["newly"] = join
            state["msg_min"][:] = _PRI_MAX
            state["_phase"][0] = 1
            # global (driver-summed) progress reducers: a select round
            # that colors NOTHING while uncolored vertices remain can
            # only mean adjacent vertices collided on the 52-bit sha
            # priority (each blocks the other's strict pri < msg_min
            # test) — the engine stops on progress < 0.5 and
            # greedy_coloring raises instead of livelocking (ADVICE r2)
            return {"progress": float(len(rows)),
                    "uncolored": float(int(und.sum()))}
        state["_phase"][0] = 0
        return {"progress": 1.0, "uncolored": 0.0}

    def after_step(self, ctx, state, new_active):
        if int(state["_phase"][0]) == 1:    # a select JUST ran
            return state["newly"].copy()    # broadcast the new colors
        return state["color"] == UNCOLORED  # next select round

    def finalize(self, ctx, state):
        pass


def greedy_coloring(engine: GraphEngine, max_steps: int = 10 ** 9) -> dict:
    """Run deterministic JP coloring; vertex state `color` is the
    0-based greedy color.  Requires a symmetric store."""
    # stops when the select frontier (uncolored vertices) empties, the
    # same frontier-drain termination as MIS; a zero-progress select
    # round (sha-priority collision between adjacent vertices) stops the
    # loop via the progress reducer and raises loudly (ADVICE r2)
    rep = engine.run(ColoringProgram(), max_steps=max_steps,
                     stop_reducer="progress", stop_tol=0.5,
                     run_name="coloring")
    last = rep["steps"][-1]["reducers"] if rep["steps"] else {}
    if last.get("progress", 1.0) < 0.5 and last.get("uncolored", 0.0) > 0:
        raise RuntimeError(
            "greedy_coloring: zero-progress select round with "
            f"{int(last['uncolored'])} uncolored vertices — adjacent "
            "vertices collided on the 52-bit sha priority; re-seed")
    return rep
