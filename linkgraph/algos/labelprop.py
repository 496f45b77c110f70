"""Synchronous label propagation (north-rule addition; no reference
implementation — design per SURVEY.md §2.3):

  * label[v] = v initially;
  * every iteration EVERY vertex adopts the most frequent label among its
    neighbors (symmetric graph), tie-break = smallest label, so runs are
    deterministic and partition-count invariant;
  * vertices with no neighbors keep their label;
  * stop after max_iters or when no label changed.

Uses the engine's histogram combine: shards emit per-(dst, label) partial
counts from their local pull-CSC (the groupby(dst,label).count() shuffle
of SURVEY.md §2.3, realized as routed numpy partials), owners merge and
argmax.  Dense-only: most-frequent needs ALL neighbor labels, so a sparse
frontier cannot shortcut it.
"""

from __future__ import annotations

import numpy as np

from ..engine import GraphEngine, VertexProgram


class LabelPropProgram(VertexProgram):
    combine = "hist"
    supports_sparse = False
    static_frontier = True
    result_columns = ["label"]

    def init_state(self, ctx):
        return {"label": np.arange(ctx.lo, ctx.hi, dtype=np.int64)}

    def dense_src_values(self, ctx, state):
        return state["label"]

    def apply(self, ctx, state, tgt_idx, winner):
        lab = state["label"]
        m = winner != lab[tgt_idx]
        lab[tgt_idx[m]] = winner[m]
        return m


def label_propagation(engine: GraphEngine, max_iters: int = 20,
                      ckpt_dir: str | None = None, ckpt_every: int = 1,
                      resume: bool = False) -> dict:
    """Requires a symmetric store. Stops when an iteration changes nothing."""
    return engine.run(LabelPropProgram(), max_steps=max_iters,
                      stop_on_no_activation=True,
                      ckpt_dir=ckpt_dir, ckpt_every=ckpt_every, resume=resume,
                      run_name="labelprop")
