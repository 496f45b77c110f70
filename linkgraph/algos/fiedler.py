"""Spectral bisection of the LARGEST connected component: the Fiedler
direction by deflated power iteration (coverage widening; the spectral
member of the partitioning family next to algos/..coarsen and
q_doc_partition_cut).

On the component C with degrees d (restricted degrees == global degrees
— components are edge-closed), iterate the positive-shifted normalized
adjacency

    M = (I + D^{-1/2} A D^{-1/2}) / 2        (eigenvalues in [0, 1])

whose top eigenvector on a connected component is v1 = sqrt(d)/||sqrt(d)||.
Deflating v1 out each round makes power iteration converge to the
SECOND eigenvector — the Fiedler direction; its sign pattern is the
classic spectral bisection and its Rayleigh quotient estimates
algebraic connectivity.

    x_0[v] = mix64(v)/2^64 - 0.5  (deterministic pseudo-random, v in C)
    repeat R times:
        y   = M x            (ONE add-combine superstep per round)
        y  -= (v1 . y) v1    (deflation, one global reduce)
        x   = y / ||y||      (one global reduce)

Every global reduce is an engine map_vertices scalar wave; per-vertex
work stays inside the shard actors.  Deterministic: fixed rounds, fixed
seeded init, smooth iteration (no discrete branching), so the ~1e-16
per-round float-order differences vs the SQL oracle stay far below the
round-6 output (the kmeans/eigen precedent).

SQL oracle: pipelines._fiedler_sql — unrolled CC chain -> largest
component -> the identical deflated iteration as CTE rounds.
"""

from __future__ import annotations

import numpy as np

from ..engine import GraphEngine, VertexProgram
from .wl import mix64

FIEDLER_ROUNDS = 8


class FiedlerStep(VertexProgram):
    """One y = M x superstep over the member mask; x/y live across
    run() calls (continues=True)."""

    combine = "add"
    supports_sparse = False
    static_frontier = True
    continues = True
    result_columns = ["fiedler"]

    def init_state(self, ctx, prev=None):
        st = prev if prev is not None else {}
        if "fx" not in st:
            raise RuntimeError("seed fiedler state via seed_fiedler()")
        st["fy"] = np.zeros(ctx.n_local, dtype=np.float64)
        return st

    def dense_src_values(self, ctx, state):
        return state["fx"] * state["finv"]  # x[src] / sqrt(d[src])

    def signal(self, ctx, state, local_idx):
        return (state["fx"] * state["finv"])[local_idx]

    def apply(self, ctx, state, tgt_idx, vals):
        state["fy"][tgt_idx] += vals
        return np.zeros(len(tgt_idx), dtype=bool)

    def post_step(self, ctx, state, active, step, final):
        # y = (sum/sqrt(d_dst) + x) / 2 on members; 0 elsewhere
        y = 0.5 * (state["fy"] * state["finv"] + state["fx"])
        state["fy"] = np.where(state["fmask"], y, 0.0)
        return {}

    def finalize(self, ctx, state):
        state["fiedler"] = state["fx"]


def largest_component_label(engine: GraphEngine) -> int:
    """Label (= min member id) of the largest CC from the engine's CC
    state, via the coarse label-bucket distinct kernel (no fine-key
    aggregate): per-bucket sizes, driver partial top-1 with (n DESC,
    label ASC) ties."""
    import pandas as pd
    import pyarrow as pa

    from .triangles import TARGET_ROWS_PER_BUCKET

    ds = engine.state_dataset(["label"])
    n = engine.meta["n_vertices"]
    nb = max(4, n // TARGET_ROWS_PER_BUCKET + 1)

    def part(b: pa.Table) -> pa.Table:
        lab = b["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "bucket": pa.array(lab % nb), "lab": pa.array(lab)})

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("lab", sort=False).size()
        # per-bucket top-1 is safe: a label lives in exactly one bucket
        i = np.lexsort((s.index.to_numpy(), -s.to_numpy()))[0]
        return pd.DataFrame({"lab": [int(s.index[i])],
                             "n": [int(s.iloc[i])]})

    parts = ds.map_batches(part, batch_format="pyarrow") \
        .groupby("bucket").map_groups(kern, batch_format="pandas") \
        .to_pandas()
    i = np.lexsort((parts["lab"].to_numpy(), -parts["n"].to_numpy()))[0]
    return int(parts["lab"].iloc[i])


def fiedler_vector(engine: GraphEngine,
                   rounds: int = FIEDLER_ROUNDS) -> None:
    """Run CC (reusing the loaded undirected store), seed the deflated
    iteration on the largest component, run `rounds` supersteps; leaves
    float64 `fiedler` vertex state (0 outside the component)."""
    from .cc import connected_components

    connected_components(engine)
    lab = largest_component_label(engine)

    def seed(ctx, state, active):
        member = state["label"] == lab
        d = ctx.out_deg.astype(np.float64)
        inv = np.zeros(ctx.n_local)
        inv[member] = 1.0 / np.sqrt(np.maximum(d[member], 1.0))
        state["fmask"] = member
        state["finv"] = inv
        state["fsq"] = np.where(member, np.sqrt(d), 0.0)
        v = np.arange(ctx.lo, ctx.hi, dtype=np.uint64)
        x0 = mix64(v).astype(np.float64) / 2.0 ** 64 - 0.5
        state["fx"] = np.where(member, x0, 0.0)
        return float((d * member).sum())  # m2 = sum of member degrees

    m2 = engine.map_vertices(seed)
    sq_norm = np.sqrt(max(m2, 1.0))

    def dot_v1(ctx, state, active):
        return float((state["fx"] * state["fsq"]).sum() / sq_norm)

    def sub_and_sq(alpha):
        def f(ctx, state, active):
            state["fx"] -= alpha * state["fsq"] / sq_norm
            state["fx"][~state["fmask"]] = 0.0
            return float((state["fx"] ** 2).sum())
        return f

    def scale(norm):
        def f(ctx, state, active):
            state["fx"] /= norm
            return 0.0
        return f

    a = engine.map_vertices(dot_v1)
    nrm = np.sqrt(max(engine.map_vertices(sub_and_sq(a)), 1e-300))
    engine.map_vertices(scale(nrm))

    for _ in range(rounds):
        engine.run(FiedlerStep(), max_steps=1, run_name="fiedler")

        def y_to_x(ctx, state, active):
            state["fx"] = state["fy"]
            return 0.0

        engine.map_vertices(y_to_x)
        a = engine.map_vertices(dot_v1)
        nrm = np.sqrt(max(engine.map_vertices(sub_and_sq(a)), 1e-300))
        engine.map_vertices(scale(nrm))

    def fin(ctx, state, active):
        state["fiedler"] = state["fx"]
        return 0.0

    engine.map_vertices(fin)
