"""Strongly connected components by forward-min / backward-confirm
rounds (coverage-widening; no reference implementation — the standard
label-propagation SCC for vertex-centric engines, e.g. Salihoglu &
Widom's Pregel formulation, built from the same process_edges
primitives as toolkits/cc.cpp:22-109):

  round r (over the still-unassigned subgraph):
    forward   min-label propagation along OUT-edges until fixpoint:
              f(v) = min id of any unassigned vertex that reaches v
              (exactly CC's monotone min kernel, directed);
    roots     v with f(v) == v — each is the minimum id of its SCC;
    backward  on the TRANSPOSE (zero-copy push/pull swap, the same
              transpose() BC uses), confirmed vertices broadcast their
              SCC label; w joins iff f(w) equals the label.  Every
              label arriving at w satisfies label = f(u) <= f(w)
              (w -> u implies reach(w) is a subset of reach(u)), so a
              MAX combine — realized as the engine's min combine over
              NEGATED labels — can never drop the one matching label.
    assigned vertices go inert: their f is pinned to INT_INF (the min
    identity) so dense pulls over all in-neighbors stay correct.

Label convention matches CC: scc(v) = MIN vertex id in v's SCC.
Every round assigns at least the minimum-id unassigned vertex (its f
is itself), so the loop terminates; on DAG-ish graphs with hashed ids
the expected round count is O(log n) (min-priority peeling).

SQL oracle: pipelines._scc_sql — an exact WITH RECURSIVE transitive
closure (reach UNION-distinct fixpoint), scc(v) = least(v, min mutual
partner); no unroll-depth dependency.
"""

from __future__ import annotations

import numpy as np

from ..engine import GraphEngine, VertexProgram
from ..shards import INT_INF


class SCCForwardProgram(VertexProgram):
    combine = "min"
    supports_sparse = True
    continues = True  # scc labels carry across rounds
    result_columns = ["scc"]

    def init_state(self, ctx, prev=None):
        if ctx.params.get("reset", False) or not prev or "scc" not in prev:
            scc = np.full(ctx.n_local, -1, dtype=np.int64)
        else:
            scc = prev["scc"]
        vids = np.arange(ctx.lo, ctx.hi, dtype=np.int64)
        # unassigned restart from their own id; assigned hold the min
        # identity so they contribute nothing to any pull reduction
        f = np.where(scc < 0, vids, INT_INF)
        return {"scc": scc, "f": f, "reached": np.zeros(ctx.n_local, bool)}

    def initial_active(self, ctx, state):
        return state["scc"] < 0

    def signal(self, ctx, state, local_idx):
        return state["f"][local_idx]

    def dense_src_values(self, ctx, state):
        return state["f"]

    def dense_emit_mask(self, ctx, row_vertex, partial):
        # f(dst) <= dst while unassigned (monotone from own id), and
        # assigned dsts reject everything — same prefilter as cc.cpp:67-69
        return partial < row_vertex

    def apply(self, ctx, state, tgt_idx, vals):
        f = state["f"]
        m = (state["scc"][tgt_idx] < 0) & (vals < f[tgt_idx])
        f[tgt_idx[m]] = vals[m]
        return m


class SCCBackwardProgram(VertexProgram):
    combine = "min"  # over NEGATED labels == max over labels
    supports_sparse = True
    continues = True
    result_columns = ["scc"]

    def init_state(self, ctx, prev=None):
        state = prev
        vids = np.arange(ctx.lo, ctx.hi, dtype=np.int64)
        roots = (state["scc"] < 0) & (state["f"] == vids)
        state["scc"][roots] = vids[roots]
        state["reached"] = roots
        return state

    def initial_active(self, ctx, state):
        return state["reached"].copy()

    def signal(self, ctx, state, local_idx):
        return -state["scc"][local_idx]  # active vertices are confirmed

    def dense_src_values(self, ctx, state):
        return np.where(state["reached"], -state["scc"], INT_INF)

    def dense_src_mask(self, ctx, state, active):
        return active  # only this superstep's newly-confirmed resend

    def dense_emit_mask(self, ctx, row_vertex, partial):
        return partial <= 0  # labels are >= 0; INT_INF = no active sender

    def apply(self, ctx, state, tgt_idx, vals):
        label = -vals
        m = (state["scc"][tgt_idx] < 0) & (state["f"][tgt_idx] == label)
        ti = tgt_idx[m]
        state["scc"][ti] = label[m]
        state["reached"][ti] = True
        return m

    def post_step(self, ctx, state, active, step, final):
        return {"unassigned": float((state["scc"] < 0).sum())}


def strongly_connected_components(engine: GraphEngine,
                                  max_rounds: int = 10 ** 6) -> dict:
    """Run forward/backward rounds until every vertex has an SCC label.

    Requires a DIRECTED store.  Result in state column `scc`
    (= min vertex id of the component), read via engine.state_dataset.
    """
    import ray

    rounds = []
    remaining_prev = None
    for rnd in range(max_rounds):
        fwd = engine.run(SCCForwardProgram(), params={"reset": rnd == 0},
                         run_name=f"scc_fwd{rnd}")
        ray.get([s.transpose.remote() for s in engine.shards])
        try:
            bwd = engine.run(SCCBackwardProgram(),
                             run_name=f"scc_bwd{rnd}")
        finally:
            ray.get([s.transpose.remote() for s in engine.shards])
        rounds.append({"forward": fwd, "backward": bwd})
        remaining = int(engine.map_vertices(
            lambda ctx, state, active: int((state["scc"] < 0).sum())))
        if remaining == 0:
            return {"rounds": rounds, "n_rounds": rnd + 1}
        if remaining_prev is not None and remaining >= remaining_prev:
            raise AssertionError(
                f"scc: round {rnd} assigned no vertex "
                f"({remaining} unassigned) — algorithm invariant broken")
        remaining_prev = remaining
    raise AssertionError(f"scc: not converged after {max_rounds} rounds")
