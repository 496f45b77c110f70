"""Approximate neighborhood function (the HyperANF / ANF family —
Palmer, Gibbons, Faloutsos KDD 2002; Boldi, Rosa, Vigna WWW 2011):
N(t) = sum_v |ball(v, t)| estimated from k INDEPENDENT min-hash
registers per vertex (Cohen's size-estimation framework, JCSS 1997):

    reg_r(v, t) = min over ball(v, t) of h_r(u)
    |ball| ~= (k - 1) / sum_r (reg_r / 2^63)

Componentwise MIN over independent registers is exactly the engine's
min combine, so each register round is ONE ordinary superstep — unlike
HyperLogLog registers, no custom merge is needed, and the whole sketch
is bit-reproducible by the SQL oracle (the repo's KMV convention:
deterministic splitmix64 hashes in HUGEINT, left-associated register
sums).  Coverage-widening; no reference implementation.

Scale: state is k int64s per vertex, messages are one int64 per
(edge, register, round) — k * T supersteps of the same cost as CC.
The exact-BFS distance_dist query needs a full sweep per seed; ANF
covers ALL vertices at once, the standard trade at web scale.
"""

from __future__ import annotations

import numpy as np

from ..engine import GraphEngine, VertexProgram

ANF_K = 8       # registers per vertex
ANF_ROUNDS = 3  # neighborhood radii reported: t = 0 .. ANF_ROUNDS


def _hash_registers(vids: np.ndarray, r: int) -> np.ndarray:
    """splitmix64 avalanche of (v * 2^32 + r), top bit dropped so the
    register order-compares correctly as int64 (63-bit hashes)."""
    with np.errstate(over="ignore"):
        x = vids.astype(np.uint64) * np.uint64(4294967296) + np.uint64(r)
        x ^= x >> np.uint64(33)
        x *= np.uint64(0xFF51AFD7ED558CCD)
        x ^= x >> np.uint64(29)
        x *= np.uint64(0xC4CEB9FE1A85EC53)
        x ^= x >> np.uint64(32)
    return (x >> np.uint64(1)).astype(np.int64)


class RegisterMinProgram(VertexProgram):
    """One register's min-relaxation superstep (params['reg'] = r):
    exactly CC's monotone min kernel over the register values."""

    combine = "min"
    supports_sparse = True
    static_frontier = True
    continues = True  # registers persist across the k * T runs
    result_columns = []

    def init_state(self, ctx, prev=None):
        k = ctx.params["k"]
        if prev and "reg0" in prev and not ctx.params.get("reset"):
            return prev
        vids = np.arange(ctx.lo, ctx.hi, dtype=np.int64)
        return {f"reg{r}": _hash_registers(vids, r) for r in range(k)}

    def signal(self, ctx, state, local_idx):
        return state[f"reg{ctx.params['reg']}"][local_idx]

    def dense_src_values(self, ctx, state):
        return state[f"reg{ctx.params['reg']}"]

    def apply(self, ctx, state, tgt_idx, vals):
        reg = state[f"reg{ctx.params['reg']}"]
        m = vals < reg[tgt_idx]
        reg[tgt_idx[m]] = vals[m]
        return m


def neighborhood_function(engine: GraphEngine, k: int = ANF_K,
                          rounds: int = ANF_ROUNDS,
                          round_to: int = 6):
    """Run the sketch over an UNDIRECTED store; returns a DataFrame
    (t, nf) for t = 1..rounds, nf = round-6 sum of per-vertex ball-size
    estimates.  The per-vertex register sum is LEFT-ASSOCIATED over
    ascending r (one fixed float order shared with the SQL oracle)."""
    import pandas as pd

    def est_fn(ctx, state, active):
        acc = np.zeros(ctx.n_local, dtype=np.float64)
        for r in range(k):  # fixed order: left-associated, oracle twin
            acc = acc + state[f"reg{r}"].astype(np.float64) / 2.0 ** 63
        return float(((k - 1) / acc).sum())

    rows = []
    first = True
    for t in range(1, rounds + 1):
        for r in range(k):
            engine.run(RegisterMinProgram(),
                       params={"reg": r, "k": k, "reset": first},
                       max_steps=1, run_name=f"anf_t{t}_r{r}")
            first = False
        rows.append((t, round(engine.map_vertices(est_fn), round_to)))
    return pd.DataFrame({"t": np.array([r0 for r0, _ in rows], np.int64),
                         "nf": np.array([v for _, v in rows],
                                        np.float64)})
