"""Seeded (semi-supervised) label spreading: a small labeled seed set
propagates over the symmetric graph; unlabeled vertices adopt the most
frequent LABELED neighbor label (tie-break = smallest label), seeds are
CLAMPED (never change) — the classic semi-supervised classification
shape (Zhu & Ghahramani label propagation), here e.g. spreading
language labels from a trusted 5% sample to the whole corpus.

Same histogram combine as labelprop (algos/labelprop.py) with two
deltas: unlabeled vertices do not vote (dense_src_mask — the
phase-gated hist source mechanism JP coloring uses), and apply skips
seed vertices.  Synchronous and deterministic, so partition-count
invariant and exactly reproducible by an unrolled SQL recurrence.

Seeds are NOT broadcast: each shard reads its own [lo, hi) slice of a
(v, label) seed parquet in init_state — the same predicate-pushdown
read as restore_vertex_array (shards.py load_state_range), so the seed
table scales with |V| without ever landing on the driver.
"""

from __future__ import annotations

import numpy as np

from ..engine import GraphEngine, VertexProgram

UNLABELED = -1


class LabelSpreadProgram(VertexProgram):
    combine = "hist"
    supports_sparse = False
    static_frontier = True
    result_columns = ["label"]

    def init_state(self, ctx):
        import pyarrow.dataset as pads

        dset = pads.dataset(ctx.params["seed_path"], format="parquet")
        f = (pads.field("v") >= ctx.lo) & (pads.field("v") < ctx.hi)
        t = dset.to_table(columns=["v", "label"], filter=f)
        lab = np.full(ctx.n_local, UNLABELED, dtype=np.int64)
        v = t["v"].to_numpy(zero_copy_only=False)
        lab[v - ctx.lo] = t["label"].to_numpy(zero_copy_only=False)
        return {"label": lab, "seed": lab != UNLABELED}

    def dense_src_values(self, ctx, state):
        return state["label"]

    def dense_src_mask(self, ctx, state, active):
        return state["label"] != UNLABELED  # only labeled vertices vote

    def apply(self, ctx, state, tgt_idx, winner):
        lab, seed = state["label"], state["seed"]
        m = (~seed[tgt_idx]) & (winner != lab[tgt_idx])
        lab[tgt_idx[m]] = winner[m]
        return m


def label_spread(engine: GraphEngine, seed_path: str, max_iters: int = 10,
                 ckpt_dir: str | None = None, ckpt_every: int = 1,
                 resume: bool = False) -> dict:
    """Requires a symmetric store; `seed_path` = parquet of (v, label)
    seed rows.  Stops early at a fixpoint (no label changed)."""
    return engine.run(LabelSpreadProgram(),
                      params={"seed_path": seed_path},
                      max_steps=max_iters, stop_on_no_activation=True,
                      ckpt_dir=ckpt_dir, ckpt_every=ckpt_every,
                      resume=resume, run_name="labelspread")
