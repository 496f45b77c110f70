"""Densest-subgraph 2(1+eps)-approximation by parallel peeling
(Bahmani, Kumar, Vassilvitskii, VLDB 2012: "Densest subgraph in
streaming and MapReduce") — coverage-widening; the reference answers
whole-graph aggregates with the same partial/combine shape
(core/graph.hpp:1406).

Each round measures the alive-subgraph density rho_i = m_i / n_i, then
SIMULTANEOUSLY removes every vertex whose alive-degree is at most
(1 + eps) * average = (1+eps) * 2 m_i / n_i.  With eps = 1/2 the keep
test is exact integer arithmetic (m2 = 2 m):

    remove(v) <=> deg_i(v) <= (3/2) * (2 m_i / n_i) = 3 m_i / n_i
              <=> deg_i(v) <= (3 * m2_i) / (2 * n_i)
              <=> deg_i(v) <= (3 * m2_i) // (2 * n_i)   (floor is
                  exact here: d <= T/X <=> d <= floor(T/X) for ints)

At least one vertex (a minimum-degree one) is removed every round and
the alive count shrinks geometrically (n_{i+1} < n_i / (1+eps)), so the
loop ends within ~log_{1.5} n rounds; the best-density round's alive
set is the answer, within 2(1+eps) = 3x of optimal.  Round comparison
is exact: floor(m2 * 10^24 / (2 n)) as a python int (ties -> earliest
round), reproduced verbatim in the SQL oracle's HUGEINT order key.

Physical plans (size-gate convention of triangles.py):
  * driver kernel under DRIVER_TRI_CAP edges: bincount degrees per
    round over a shrinking alive mask;
  * distributed: per round, alive flags attach onto the edge list via
    the GATED lookup join (broadcast under ATTACH_BROADCAST_CAP, coarse
    bucket co-group above), one _vertex_degrees shuffle on the filtered
    edges, and the keep test runs per batch — the alive set is only
    ever a (v, flag) Dataset, never a driver-side vertex list.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .triangles import DRIVER_TRI_CAP, _vertex_degrees

DENSEST_NUM = 3       # 1 + eps = 3/2
DENSEST_DEN = 2
DENSEST_ROUNDS = 64   # oracle unroll budget (~log_1.5 n + margin)
_SCALE = 10 ** 24     # exact fraction order key: floor(m2 * S / (2 n))


def _best(rounds: list[tuple[int, int, int]]):
    """rounds: (r, n_alive, m2).  Max by exact scaled density, ties ->
    earliest round."""
    best = None
    for r, n, m2 in rounds:
        if n <= 0:
            continue
        key = (m2 * _SCALE) // (2 * n)
        if best is None or key > best[0] or (key == best[0]
                                             and r < best[1]):
            best = (key, r, n, m2)
    return best


def _result(best) -> pd.DataFrame:
    if best is None:  # zero-vertex input: no round ever had n > 0
        return pd.DataFrame({
            "best_round": pd.Series([], dtype=np.int64),
            "n_sub": pd.Series([], dtype=np.int64),
            "m_sub": pd.Series([], dtype=np.int64),
            "density": pd.Series([], dtype=np.float64)})
    _, r, n, m2 = best
    return pd.DataFrame({
        "best_round": pd.Series([r], dtype=np.int64),
        "n_sub": pd.Series([n], dtype=np.int64),
        "m_sub": pd.Series([m2 // 2], dtype=np.int64),
        "density": pd.Series([round(m2 / (2.0 * n), 6)],
                             dtype=np.float64)})


def _densest_local(pdf: pd.DataFrame, n_vertices: int):
    s = pdf["src"].to_numpy(np.int64)
    d = pdf["dst"].to_numpy(np.int64)
    keep = s != d
    lo = np.minimum(s[keep], d[keep])
    hi = np.maximum(s[keep], d[keep])
    e = np.unique((lo << 32) | hi)
    lo, hi = (e >> 32).astype(np.int64), (e & 0xFFFFFFFF).astype(np.int64)
    alive = np.ones(n_vertices, dtype=bool)
    rounds: list[tuple[int, int, int]] = []
    r = 0
    while True:
        ea = alive[lo] & alive[hi]
        deg = (np.bincount(lo[ea], minlength=n_vertices)
               + np.bincount(hi[ea], minlength=n_vertices))
        n = int(alive.sum())
        m2 = int(deg.sum())
        if n == 0:
            break
        rounds.append((r, n, m2))
        # remove(v) <=> den * deg * n <= num * m2, folded into the
        # overflow-free scalar threshold deg > (num*m2) // (den*n)
        # (exact: deg > floor(T/X) <=> deg*X > T for integers)
        thr = (DENSEST_NUM * m2) // (DENSEST_DEN * n)
        alive = alive & (deg > thr)
        r += 1
        if r > DENSEST_ROUNDS:
            raise AssertionError(
                "densest: peel exceeded the oracle unroll budget")
    return _result(_best(rounds)), {"n_steps": r}


def _densest_ds(edges_ds, n_vertices: int):
    import ray.data as rd

    from ..joins import attach_by_key
    from ..runtime import tune_context
    tune_context()

    alive = rd.range(n_vertices).map_batches(
        lambda b: pa.table({
            "v": pa.array(b["id"].to_numpy(zero_copy_only=False)
                          .astype(np.int64)),
            "flag": pa.array(np.ones(b.num_rows, np.int64))}),
        batch_format="pyarrow").materialize()
    n = n_vertices
    rounds: list[tuple[int, int, int]] = []
    r = 0
    while n > 0:
        fe = attach_by_key(edges_ds, alive, ["src", "dst"], "v", "flag",
                           missing="fill:0")

        def both(b: pa.Table) -> pa.Table:
            k = (b["flag_src"].to_numpy(zero_copy_only=False) == 1) \
                & (b["flag_dst"].to_numpy(zero_copy_only=False) == 1)
            return pa.table({
                "src": pa.array(
                    b["src"].to_numpy(zero_copy_only=False)[k]),
                "dst": pa.array(
                    b["dst"].to_numpy(zero_copy_only=False)[k])})

        fe = fe.map_batches(both, batch_format="pyarrow").materialize()
        m_alive = fe.count()
        deg = _vertex_degrees(fe, max(m_alive, 1)).materialize() \
            if m_alive else None
        m2 = int(deg.sum("degree")) if deg is not None else 0
        rounds.append((r, n, m2))
        if m2 == 0:
            break  # all remaining vertices isolated: density 0 onward
        thr = (DENSEST_NUM * m2) // (DENSEST_DEN * n)

        def keep_rows(b: pa.Table, thr=thr) -> pa.Table:
            v = b["v"].to_numpy(zero_copy_only=False).astype(np.int64)
            c = b["degree"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            k = c > thr
            return pa.table({"v": pa.array(v[k]),
                             "flag": pa.array(np.ones(int(k.sum()),
                                                      np.int64))})

        alive = deg.map_batches(keep_rows,
                                batch_format="pyarrow").materialize()
        n = alive.count()
        r += 1
        if r > DENSEST_ROUNDS:
            raise AssertionError(
                "densest: peel exceeded the oracle unroll budget")
    return _result(_best(rounds)), {"n_steps": r}


def densest_subgraph(edges_ds, n_vertices: int,
                     force_distributed: bool = False):
    """Peel to the densest subgraph; returns a one-row frame
    (best_round, n_sub, m_sub, density) + {'n_steps': rounds} for the
    oracle-unroll check.  Density counts ALL alive vertices (isolated
    ones included), exactly as the SQL twin."""
    n_edges = edges_ds.count()
    if n_edges <= DRIVER_TRI_CAP and not force_distributed:
        return _densest_local(edges_ds.to_pandas(), n_vertices)
    return _densest_ds(edges_ds, n_vertices)
