"""Maximal independent set: deterministic Luby rounds on a symmetric
graph (coverage-widening; not in the reference toolkit — classic
frontier-superstep algorithm in the Gemini style).

Priorities are hash order statistics, not RNG draws (the repo's
deterministic-sampling convention, sampling.py):
    pri(v) = int(sha256(str(v))[:13 hex], 16)    (52 bits, float64-exact)

One Luby ROUND is TWO supersteps:

  select     every undecided vertex signals pri to its neighbors with a
             min combine; an undecided vertex whose own pri is strictly
             below the minimum it heard (or that heard nothing) joins
             the MIS.  No two adjacent vertices can both join — one of
             them heard the other's smaller priority.
  broadcast  the newly-joined set signals; undecided receivers drop out.

Rounds repeat until no vertex is undecided (the frontier empties).
Distinct priorities guarantee progress: the globally-minimum undecided
vertex always joins.  sha256 collisions within 52 bits would make both
endpoints skip a round (livelock risk ~ n^2 / 2^52 — negligible at test
scale; at 1e12 vertices widen the prefix).

SQL oracle: pipelines._mis_sql unrolls the same two-phase recurrence.
Requires a symmetric store (load_undirected), like CC/LP/k-core.
"""

from __future__ import annotations

import hashlib

import numpy as np

from ..engine import GraphEngine, VertexProgram

# status codes
UNDECIDED, IN_MIS, OUT = 0, 1, 2


def hash_priority(vertex_ids: np.ndarray) -> np.ndarray:
    """float64-exact 52-bit sha256 priorities (matches the SQL
    ('0x' || substr(sha256(v::VARCHAR), 1, 13))::UBIGINT)."""
    return np.array(
        [int(hashlib.sha256(str(int(v)).encode()).hexdigest()[:13], 16)
         for v in vertex_ids], dtype=np.float64)


class MISProgram(VertexProgram):
    combine = "min"
    supports_sparse = True
    result_columns = ["in_mis"]

    def init_state(self, ctx):
        vids = np.arange(ctx.lo, ctx.hi, dtype=np.int64)
        return {"status": np.full(ctx.n_local, UNDECIDED, np.int64),
                "pri": hash_priority(vids),
                "msg_min": np.full(ctx.n_local, np.inf),
                "newly_in": np.zeros(ctx.n_local, dtype=bool),
                "_phase": np.array([0], np.int64)}  # 0 select, 1 broadcast

    def initial_active(self, ctx, state):
        return np.ones(ctx.n_local, dtype=bool)

    def signal(self, ctx, state, local_idx):
        return state["pri"][local_idx]

    def dense_src_values(self, ctx, state):
        return state["pri"]

    def dense_src_mask(self, ctx, state, active):
        return active  # undecided (select) / newly-in (broadcast)

    def apply(self, ctx, state, tgt_idx, vals):
        if int(state["_phase"][0]) == 0:   # select: record neighbor minima
            np.minimum.at(state["msg_min"], tgt_idx, vals)
            return np.zeros(len(tgt_idx), dtype=bool)
        # broadcast: undecided receivers of an in-MIS signal drop out.
        # Dense partials fill inactive-source rows with the min identity
        # (+inf, csr.segment_reduce) — only finite values are real signals
        und = (state["status"][tgt_idx] == UNDECIDED) & np.isfinite(vals)
        state["status"][tgt_idx[und]] = OUT
        return np.zeros(len(tgt_idx), dtype=bool)

    def post_step(self, ctx, state, active, step, final) -> dict:
        if int(state["_phase"][0]) == 0:
            und = state["status"] == UNDECIDED
            join = und & (state["pri"] < state["msg_min"])
            state["status"][join] = IN_MIS
            state["newly_in"] = join
            state["msg_min"][:] = np.inf
            state["_phase"][0] = 1
        else:
            state["_phase"][0] = 0
        return {}

    def after_step(self, ctx, state, new_active):
        # phase was toggled in post_step: 1 means a select JUST ran
        if int(state["_phase"][0]) == 1:
            return state["newly_in"].copy()     # broadcast the joiners
        return state["status"] == UNDECIDED     # next select round

    def finalize(self, ctx, state):
        state["in_mis"] = (state["status"] == IN_MIS).astype(np.int64)


def maximal_independent_set(engine: GraphEngine,
                            max_steps: int = 10 ** 9) -> dict:
    """Run deterministic-Luby MIS; vertex state `in_mis` is 1 for
    members.  Requires a symmetric store (load_undirected)."""
    return engine.run(MISProgram(), max_steps=max_steps, run_name="mis")
