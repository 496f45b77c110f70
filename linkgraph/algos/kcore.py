"""k-core: synchronous peeling on a symmetric graph.

Not in the reference toolkit set — a coverage-widening algorithm in the
classic Gemini frontier style (sparse push of a shrinking "dying" set,
like cc.cpp's shrinking frontier):

  round 0: every vertex with degree < k dies;
  round i: each dying vertex signals 1 to its neighbors; a neighbor's
           live degree drops by the count received, and an alive vertex
           whose degree falls below k dies in round i+1;
  stop when no vertex dies (frontier empties).

Removal is SIMULTANEOUS per round (superstep semantics), so the
surviving set satisfies the textbook recurrence
    alive_{i+1} = { v in alive_i : |N(v) ∩ alive_i| >= k }
which the SQL oracle unrolls directly (pipelines._kcore_sql).

Requires a store built with symmetric=True (out_deg == undirected
degree, as for CC/label propagation).
"""

from __future__ import annotations

import numpy as np

from ..engine import GraphEngine, VertexProgram


class KCoreProgram(VertexProgram):
    combine = "add"
    supports_sparse = True
    result_columns = ["in_core"]

    def init_state(self, ctx):
        k = int(ctx.params["k"])
        deg = ctx.out_deg.astype(np.int64).copy()
        alive = deg >= k
        return {"deg": deg, "alive": alive,
                "_k": np.array([k], dtype=np.int64),
                "_dying0": ~alive}

    def initial_active(self, ctx, state):
        return state["_dying0"].copy()

    # dying vertices each contribute a count of 1 per incident edge
    def signal(self, ctx, state, local_idx):
        return np.ones(len(local_idx), dtype=np.float64)

    def dense_src_values(self, ctx, state):
        return np.ones(ctx.n_local, dtype=np.float64)

    def dense_src_mask(self, ctx, state, active):
        return active  # only this round's dying set signals

    def apply(self, ctx, state, tgt_idx, vals):
        k = int(state["_k"][0])
        deg, alive = state["deg"], state["alive"]
        deg[tgt_idx] -= vals.astype(np.int64)
        newly = alive[tgt_idx] & (deg[tgt_idx] < k)
        # dead from the NEXT round on; they still receive decrements from
        # later-dying neighbors but can never re-enter the frontier
        alive[tgt_idx[newly]] = False
        return newly

    def finalize(self, ctx, state):
        state["in_core"] = state["alive"].astype(np.int64)


def kcore(engine: GraphEngine, k: int, max_steps: int = 10 ** 9) -> dict:
    """Peel to the k-core; vertex state `in_core` is 1 for survivors.
    Requires a symmetric store (load_undirected)."""
    return engine.run(KCoreProgram(), params={"k": int(k)},
                      max_steps=max_steps, run_name=f"kcore_{k}")


class OnionProgram(KCoreProgram):
    """Peeling layers (the "onion" view of the k-core peel): layer(v) =
    the synchronous round at which v was removed — 0 for vertices whose
    initial degree is already < k, i for vertices alive through round
    i-1 whose live degree drops below k at round i.  Survivors (the
    k-core itself) keep layer -1 and are filtered from the result.
    Same superstep recurrence as KCoreProgram; the SQL oracle counts
    how many unrolled alive-sets contain each vertex (membership is
    monotone, so layer = containment-count - 1)."""

    result_columns = ["layer"]

    def init_state(self, ctx):
        st = super().init_state(ctx)
        layer = np.full(ctx.n_local, -1, dtype=np.int64)
        layer[st["_dying0"]] = 0
        st["layer"] = layer
        st["_round"] = np.array([0], dtype=np.int64)
        return st

    def apply(self, ctx, state, tgt_idx, vals):
        newly = super().apply(ctx, state, tgt_idx, vals)
        state["layer"][tgt_idx[newly]] = state["_round"][0] + 1
        return newly

    def post_step(self, ctx, state, active, step, final):
        state["_round"][0] += 1
        return {}

    def finalize(self, ctx, state):
        pass  # layer is the result; no in_core overwrite needed


def onion_layers(engine: GraphEngine, k: int,
                 max_steps: int = 10 ** 9) -> dict:
    """Peel to the k-core recording each vertex's removal round."""
    return engine.run(OnionProgram(), params={"k": int(k)},
                      max_steps=max_steps, run_name=f"onion_{k}")


class CorenessProgram(VertexProgram):
    """Full core decomposition via H-index iteration (Lü et al. 2016,
    "The H-index of a network node and its relation to degree and
    coreness", Nat. Commun. 7:10168 — public result: iterating
    c(v) <- H({c(u) : u in N(v)}) from c = degree converges to the core
    number).  Same execution shape as label propagation: static
    frontier, histogram combine (per-(dst, value) neighbor counts),
    stop when no value changes.  Values are monotone non-increasing, so
    the iteration is deterministic and partition-count invariant."""

    combine = "hist"
    supports_sparse = False
    static_frontier = True
    result_columns = ["core"]

    def init_state(self, ctx):
        return {"core": ctx.out_deg.astype(np.int64).copy()}

    def dense_src_values(self, ctx, state):
        return state["core"]

    def hist_apply(self, ctx, state, tgt_idx, labels, counts):
        """Per-target H-index of the neighbor-core multiset:
        h = max over distinct values L of min(L, #neighbors with
        core >= L).  Triples arrive lexsorted by (target, label asc)
        (csr.count_pairs), so the >=L counts are per-segment suffix
        sums — fully vectorized."""
        n = len(tgt_idx)
        if n == 0:
            return np.zeros(0, dtype=bool)
        newt = np.empty(n, dtype=bool)
        newt[0] = True
        newt[1:] = tgt_idx[1:] != tgt_idx[:-1]
        seg_starts = np.flatnonzero(newt)
        seg_id = np.cumsum(newt) - 1
        cum = np.cumsum(counts)
        last = np.append(seg_starts[1:], n) - 1
        suffix = cum[last][seg_id] - (cum - counts)
        cand = np.minimum(labels, suffix)
        h = np.maximum.reduceat(cand, seg_starts)
        t = tgt_idx[seg_starts]
        old = state["core"][t]
        new = np.minimum(old, h)  # monotone non-increasing
        ch = new < old
        state["core"][t[ch]] = new[ch]
        return ch[seg_id]  # activate every row of a changed target


def coreness(engine: GraphEngine, max_steps: int = 10 ** 9) -> dict:
    """Core number per vertex (state column `core`).  Requires a
    symmetric simple store (load_undirected)."""
    return engine.run(CorenessProgram(), max_steps=max_steps,
                      stop_on_no_activation=True, run_name="coreness")
