"""PageRank with Gemini's exact conventions (toolkits/pagerank.cpp:26-129):

  * init rank 1 (NOT 1/|V|) then pre-divide by out_degree where > 0
    (pagerank.cpp:35-45) — so pr_sum ≈ |V|;
  * superstep: next[dst] = sum of curr[src] over in-edges (:53-74);
  * vertex phase: next = (1-d) + d*next with d=0.85 (:24, :86-88);
    renormalize next /= out_degree and accumulate
    delta += |next-curr| * out_degree (|next-curr| for dangling)
    (:89-93), delta /= |V| (:98);
  * dangling vertices keep their rank undivided (SURVEY.md §7.5.4);
  * frontier always full (static), dense mode dominates by the |E|/20
    rule since active_edges == |E|.

Deviation (documented): the reference skips renormalization on the final
iteration only (:82-88); we renormalize every step and recover raw ranks
in finalize() (rank = curr * out_degree), identical to 1 ulp — within the
north rule's allclose(1e-6).
"""

from __future__ import annotations

import numpy as np

from ..engine import GraphEngine, VertexProgram


class PageRankProgram(VertexProgram):
    combine = "add"
    supports_sparse = True
    static_frontier = True
    result_columns = ["rank"]

    def init_state(self, ctx):
        d = ctx.params.get("damping", 0.85)
        curr = np.ones(ctx.n_local, dtype=np.float64)
        nz = ctx.out_deg > 0
        curr[nz] /= ctx.out_deg[nz]
        return {"curr": curr,
                "next": np.zeros(ctx.n_local, dtype=np.float64),
                "_damping": np.full(1, d)}

    def signal(self, ctx, state, local_idx):
        return state["curr"][local_idx]

    def dense_src_values(self, ctx, state):
        return state["curr"]

    def apply(self, ctx, state, tgt_idx, vals):
        state["next"][tgt_idx] += vals
        return np.zeros(len(tgt_idx), dtype=bool)

    def post_step(self, ctx, state, active, step, final):
        d = float(state["_damping"][0])
        nxt, curr = state["next"], state["curr"]
        nxt *= d
        nxt += 1.0 - d
        nz = ctx.out_deg > 0
        nxt[nz] /= ctx.out_deg[nz]
        diff = np.abs(nxt - curr)
        delta = float((diff[nz] * ctx.out_deg[nz]).sum() + diff[~nz].sum())
        state["curr"], state["next"] = nxt, curr
        curr[:] = 0.0  # becomes next buffer (fill_vertex_array, :31)
        return {"delta": delta / ctx.n_vertices}

    def finalize(self, ctx, state):
        rank = state["curr"].copy()
        nz = ctx.out_deg > 0
        rank[nz] *= ctx.out_deg[nz]
        state["rank"] = rank


class PPRProgram(PageRankProgram):
    """Personalized PageRank: identical recurrence, but the unit of rank
    mass and the (1-d) teleport both restrict to a source set S:

        rank_0[v]   = 1 if v in S else 0        (pre-divided by out-deg)
        rank_t[v]   = (1-d)*[v in S] + d * sum of rank_{t-1}[u] over u->v

    A coverage-widening variant (not in the reference toolkits) reusing
    every engine convention of PageRankProgram — pre-divide by
    out-degree, dangling keep rank, same delta reducer."""

    def init_state(self, ctx):
        state = super().init_state(ctx)
        src = np.zeros(ctx.n_local, dtype=np.float64)
        for s in ctx.params["sources"]:
            if ctx.lo <= s < ctx.hi:
                src[s - ctx.lo] = 1.0
        curr = src.copy()
        nz = ctx.out_deg > 0
        curr[nz] /= ctx.out_deg[nz]
        state["curr"] = curr
        state["_teleport"] = src
        return state

    def post_step(self, ctx, state, active, step, final):
        d = float(state["_damping"][0])
        nxt, curr = state["next"], state["curr"]
        nxt *= d
        nxt += (1.0 - d) * state["_teleport"]
        nz = ctx.out_deg > 0
        nxt[nz] /= ctx.out_deg[nz]
        diff = np.abs(nxt - curr)
        delta = float((diff[nz] * ctx.out_deg[nz]).sum() + diff[~nz].sum())
        state["curr"], state["next"] = nxt, curr
        curr[:] = 0.0
        return {"delta": delta / ctx.n_vertices}


class WeightedPageRankProgram(PageRankProgram):
    """Edge-weighted PageRank: rank mass flows proportionally to edge
    weight (curr = raw / out_weight_sum; each edge ships curr*w via
    edge_transform), all other Gemini conventions unchanged — init 1,
    dangling (zero out-weight) keep rank, same delta reducer with the
    out-weight sum as the mass factor.  Requires a weighted store
    (load_directed(..., weighted=True)); ctx.out_wsum is the per-vertex
    out-edge weight sum computed at shard boot."""

    def _wsum(self, ctx):
        if ctx.out_wsum is None:
            raise ValueError("weighted_pagerank needs a weighted store")
        return ctx.out_wsum

    def init_state(self, ctx):
        d = ctx.params.get("damping", 0.85)
        w = self._wsum(ctx)
        curr = np.ones(ctx.n_local, dtype=np.float64)
        nz = w > 0
        curr[nz] /= w[nz]
        return {"curr": curr,
                "next": np.zeros(ctx.n_local, dtype=np.float64),
                "_damping": np.full(1, d)}

    def edge_transform(self, vals, weights):
        return vals * weights if weights is not None else vals

    def post_step(self, ctx, state, active, step, final):
        d = float(state["_damping"][0])
        w = self._wsum(ctx)
        nxt, curr = state["next"], state["curr"]
        nxt *= d
        nxt += 1.0 - d
        nz = w > 0
        nxt[nz] /= w[nz]
        diff = np.abs(nxt - curr)
        delta = float((diff[nz] * w[nz]).sum() + diff[~nz].sum())
        state["curr"], state["next"] = nxt, curr
        curr[:] = 0.0
        return {"delta": delta / ctx.n_vertices}

    def finalize(self, ctx, state):
        w = self._wsum(ctx)
        rank = state["curr"].copy()
        nz = w > 0
        rank[nz] *= w[nz]
        state["rank"] = rank


def weighted_pagerank(engine: GraphEngine, iterations: int = 20,
                      damping: float = 0.85, tol: float = 0.0) -> dict:
    """Edge-weighted PageRank on a weighted store; results in `rank`."""
    return engine.run(
        WeightedPageRankProgram(), params={"damping": damping},
        max_steps=iterations,
        stop_reducer="delta" if tol > 0 else None, stop_tol=tol,
        run_name="wpagerank",
    )


def personalized_pagerank(engine: GraphEngine, sources: list[int],
                          iterations: int = 20, damping: float = 0.85,
                          tol: float = 0.0) -> dict:
    """PPR from the given source set; results in state column `rank`."""
    return engine.run(
        PPRProgram(), params={"damping": damping,
                              "sources": [int(s) for s in sources]},
        max_steps=iterations,
        stop_reducer="delta" if tol > 0 else None, stop_tol=tol,
        run_name="ppr",
    )


def pagerank(engine: GraphEngine, iterations: int = 20, damping: float = 0.85,
             tol: float = 0.0, ckpt_dir: str | None = None,
             ckpt_every: int = 1, resume: bool = False) -> dict:
    """Run PageRank; returns the run report. Read results via
    engine.state_dataset(["rank"]) / state_pandas(["rank"])."""
    return engine.run(
        PageRankProgram(), params={"damping": damping},
        max_steps=iterations,
        stop_reducer="delta" if tol > 0 else None, stop_tol=tol,
        ckpt_dir=ckpt_dir, ckpt_every=ckpt_every, resume=resume,
        run_name="pagerank",
    )


def pr_sum(engine: GraphEngine) -> float:
    """Gemini's pr_sum invariant (pagerank.cpp:107-115), ≈ |V|."""
    return engine.map_vertices(lambda ctx, state, active: float(state["rank"].sum()))


class WarmPageRankProgram(PageRankProgram):
    """PageRank warm-started from a previous run's RAW ranks — the
    incremental-recompute path after a batch of new edges lands: resume
    from the old solution on the UPDATED graph and run a few supersteps
    instead of restarting from rank 1.  `params["init_ref"]` is a ray
    ObjectRef to the dense |V| float64 raw-rank array (broadcast once;
    each shard slices its [lo, hi) range — for a same-layout engine the
    checkpoint dump/restore lane is the zero-copy alternative).  The
    recurrence, renormalization and delta conventions are inherited
    unchanged."""

    def init_state(self, ctx):
        import ray

        state = super().init_state(ctx)
        raw = ray.get(ctx.params["init_ref"])[ctx.lo:ctx.hi] \
            .astype(np.float64)
        curr = raw.copy()
        nz = ctx.out_deg > 0
        curr[nz] /= ctx.out_deg[nz]
        state["curr"] = curr
        return state


def pagerank_warm(engine: GraphEngine, init_ref, iterations: int = 5,
                  damping: float = 0.85) -> dict:
    """Run `iterations` supersteps from the broadcast raw-rank vector."""
    return engine.run(WarmPageRankProgram(),
                      params={"damping": damping, "init_ref": init_ref},
                      max_steps=iterations, run_name="pagerank_warm")
