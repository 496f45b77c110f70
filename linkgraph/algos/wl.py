"""Weisfeiler-Lehman color refinement on the undirected link graph
(coverage widening; the 1-WL graph-isomorphism / graph-feature
primitive behind WL graph kernels and GNN expressivity tests).

Classic 1-WL iterates

    label_{t+1}[v] = HASH(label_t[v], MULTISET{label_t[u] : u ~ v})

Per-round sequential implementations sort each vertex's neighbor
labels; at 100 TB that per-vertex sort is the bottleneck, so this
implementation uses the standard order-insensitive multiset encoding:
each neighbor contributes murmur_mix(label) and the multiset digest is
the mod-2^64 SUM of those contributions — commutative and associative,
so it is exactly the engine's deterministic `add` combine (int64
wraparound == uint64 mod-2^64) and one WL round is ONE ordinary dense
superstep.  Distinct multisets collide with probability ~2^-64.

    h       = mix64(label_t[u])                (signal, per edge source)
    s[v]    = sum of h over neighbors mod 2^64 (combine='add', wraps)
    label_{t+1}[v] = mix64(label_t[v] * PHI + s[v] mod 2^64)

mix64 is the murmur3 finalizer already used by ANF/neighbor-sampling
(xor-shift 33/29/32 with the 0xFF51.../0xC4CE... constants), PHI the
splitmix64 increment.  label_0 = 1 for every vertex, so round 1
separates vertices by degree and round t by their depth-t unfolding
tree — the standard refinement semantics.

Labels are carried as int64 BIT PATTERNS of the uint64 values (the
object-store message arrays stay int64 like every other program); all
arithmetic happens in uint64 views, wrapping mod 2^64 exactly like the
DuckDB HUGEINT oracle (pipelines._wl_sql: xor chains + _mulmod64_sql +
explicit % 2^64).

The per-round color COUNT (|image of label_t|) is computed without any
fine-key shuffle: per-batch np.unique partials -> one coarse
label-bucket groupby -> per-bucket exact distinct -> bounded
(round x bucket) driver fold (the triangles.TARGET_ROWS_PER_BUCKET
pattern; labels are already avalanched so `label % n_buckets` is
uniform).
"""

from __future__ import annotations

import numpy as np

from ..engine import GraphEngine, VertexProgram

WL_ROUNDS = 3
_PHI = np.uint64(0x9E3779B97F4A7C15)
_C1 = np.uint64(0xFF51AFD7ED558CCD)
_C2 = np.uint64(0xC4CEB9FE1A85EC53)


def mix64(x: np.ndarray) -> np.ndarray:
    """Murmur3 finalizer over uint64 (same chain as algos/anf.py)."""
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(33)
    x *= _C1
    x ^= x >> np.uint64(29)
    x *= _C2
    x ^= x >> np.uint64(32)
    return x


class WLProgram(VertexProgram):
    """One refinement round per superstep; keeps every round's labels
    (label_1..label_R int64 state columns) for the per-round color
    counts."""

    combine = "add"
    supports_sparse = True
    static_frontier = True

    def __init__(self, rounds: int = WL_ROUNDS):
        self.rounds = rounds
        self.result_columns = [f"label_{r}" for r in range(1, rounds + 1)]

    def init_state(self, ctx, prev=None):
        st = {"curr": np.ones(ctx.n_local, dtype=np.int64),
              "acc": np.zeros(ctx.n_local, dtype=np.int64)}
        for c in self.result_columns:
            st[c] = np.zeros(ctx.n_local, dtype=np.int64)
        return st

    def signal(self, ctx, state, local_idx):
        return mix64(state["curr"][local_idx].view(np.uint64)) \
            .view(np.int64)

    def dense_src_values(self, ctx, state):
        return mix64(state["curr"].view(np.uint64)).view(np.int64)

    def apply(self, ctx, state, tgt_idx, vals):
        # int64 += wraps mod 2^64 == the oracle's HUGEINT % 2^64
        acc = state["acc"]
        u = acc[tgt_idx].view(np.uint64) + vals.view(np.uint64)
        acc[tgt_idx] = u.view(np.int64)
        return np.zeros(len(tgt_idx), dtype=bool)

    def post_step(self, ctx, state, active, step, final):
        old = state["curr"].view(np.uint64)
        s = state["acc"].view(np.uint64)
        new = mix64(old * _PHI + s).view(np.int64)
        state["curr"] = new
        if step + 1 <= self.rounds:
            state[f"label_{step + 1}"] = new.copy()
        state["acc"] = np.zeros(ctx.n_local, dtype=np.int64)
        return {}


def wl_refine(engine: GraphEngine, rounds: int = WL_ROUNDS) -> dict:
    """Run `rounds` WL supersteps; leaves label_1..label_rounds state."""
    return engine.run(WLProgram(rounds), max_steps=rounds, run_name="wl")


def wl_color_counts(engine: GraphEngine, rounds: int = WL_ROUNDS,
                    n_vertices: int | None = None):
    """(round, n_colors) for rounds 0..R — exact distinct-label counts
    with NO fine-key aggregate: per-batch unique (round, label) pairs,
    one coarse bucket groupby, bounded partial fold."""
    import pandas as pd
    import pyarrow as pa

    from ..algos.triangles import TARGET_ROWS_PER_BUCKET

    cols = [f"label_{r}" for r in range(1, rounds + 1)]
    ds = engine.state_dataset(cols)
    n = n_vertices if n_vertices is not None else ds.count()
    nb = max(4, (n * rounds) // TARGET_ROWS_PER_BUCKET + 1)

    def part(b: pa.Table) -> pa.Table:
        rr, ll = [], []
        for r in range(1, rounds + 1):
            lab = b[f"label_{r}"].to_numpy(zero_copy_only=False)
            u = np.unique(lab)
            rr.append(np.full(len(u), r, dtype=np.int64))
            ll.append(u)
        r_ = np.concatenate(rr) if rr else np.zeros(0, np.int64)
        l_ = np.concatenate(ll) if ll else np.zeros(0, np.int64)
        return pa.table({
            "bucket": pa.array((l_.view(np.uint64) % np.uint64(nb))
                               .astype(np.int64)),
            "r": pa.array(r_), "lab": pa.array(l_)})

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        u = g.drop_duplicates(["r", "lab"]).groupby("r").size()
        return pd.DataFrame({"r": u.index.to_numpy(np.int64),
                             "n": u.to_numpy(np.int64)})

    parts = ds.map_batches(part, batch_format="pyarrow") \
        .groupby("bucket").map_groups(kern, batch_format="pandas") \
        .to_pandas()
    out = parts.groupby("r")["n"].sum()
    rounds_v = np.arange(0, rounds + 1, dtype=np.int64)
    counts = np.ones(rounds + 1, dtype=np.int64)  # round 0: all labels = 1
    for r, c in out.items():
        counts[int(r)] = int(c)
    return pd.DataFrame({"round": rounds_v, "n_colors": counts})
