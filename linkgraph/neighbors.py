"""Deterministic multi-hop neighbor sampling (GraphSAGE-style
mini-batch subgraph extraction; training-data op, no reference analog —
design per the task brief).

Per hop h, every frontier vertex keeps its fanouts[h] incident edges
with the SMALLEST murmur-avalanched 64-bit priority of the packed
(src << 32 | dst) pair — the avalanche is a bijection on uint64, so
priorities are collision-free and no tie-break is needed.  The SQL twin
reproduces the identical finalizer in HUGEINT (same constants as the
SimHash oracle, pipelines._mulmod64_sql).

Scale shape: frontiers are mini-batch-sized by definition (|seeds| *
prod(fanouts) edges at most), so each hop broadcasts the sorted
frontier once (ray.put) and selects with MAP-SIDE PARTIAL top-k —
per-batch k-smallest per source, then one small driver merge.  Zero
shuffles; the edge set streams once per hop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _pair_priority(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Murmur3 finalizer over (src << 32) | dst — bijective on uint64."""
    with np.errstate(over="ignore"):
        z = (src.astype(np.uint64) << np.uint64(32)) \
            | dst.astype(np.uint64)
        z ^= z >> np.uint64(33)
        z *= np.uint64(0xFF51AFD7ED558CCD)
        z ^= z >> np.uint64(29)
        z *= np.uint64(0xC4CEB9FE1A85EC53)
        z ^= z >> np.uint64(32)
    return z


def _topk_per_src(src: np.ndarray, dst: np.ndarray, pri: np.ndarray,
                  k: int):
    """k smallest-priority rows per source (segment arithmetic)."""
    order = np.lexsort((pri, src))
    s, d, p = src[order], dst[order], pri[order]
    starts = np.flatnonzero(np.concatenate([[True], s[1:] != s[:-1]]))
    lens = np.diff(np.concatenate([starts, [len(s)]]))
    seg = np.repeat(np.arange(len(starts)), lens)
    pos = np.arange(len(s)) - starts[seg]
    keep = pos < k
    return s[keep], d[keep], p[keep]


def sample_neighbors(edges_ds, seeds, fanouts=(3, 2)):
    """(hop, src, dst) of the sampled subgraph: hop 1 edges leave the
    seed set, hop h edges leave the distinct destinations of hop h-1.
    `edges_ds` rows are DIRECTED (symmetrize first for undirected
    semantics).  Deterministic for a given edge set and seed list."""
    import ray

    seeds = np.unique(np.asarray(list(seeds), dtype=np.int64))
    edges_ds = edges_ds.materialize()
    out = []
    frontier = seeds
    for hop, k in enumerate(fanouts, start=1):
        if len(frontier) == 0:
            break
        fref = ray.put(np.sort(frontier))

        def partial(b: pa.Table, k=k) -> pa.Table:
            f = ray.get(fref)
            s = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
            d = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
            pos = np.minimum(np.searchsorted(f, s), len(f) - 1)
            m = f[pos] == s
            s, d = s[m], d[m]
            p = _pair_priority(s, d)
            s, d, p = _topk_per_src(s, d, p, k)
            return pa.table({"src": pa.array(s, pa.int64()),
                             "dst": pa.array(d, pa.int64()),
                             "p": pa.array(p, pa.uint64())})

        parts = edges_ds.map_batches(partial,
                                     batch_format="pyarrow").to_pandas()
        if len(parts) == 0:
            break
        s, d, p = _topk_per_src(parts["src"].to_numpy(np.int64),
                                parts["dst"].to_numpy(np.int64),
                                parts["p"].to_numpy(np.uint64), k)
        out.append(pd.DataFrame({"hop": np.full(len(s), hop, np.int64),
                                 "src": s, "dst": d}))
        frontier = np.unique(d)
    if not out:
        return pd.DataFrame({"hop": pd.Series([], dtype=np.int64),
                             "src": pd.Series([], dtype=np.int64),
                             "dst": pd.Series([], dtype=np.int64)})
    return pd.concat(out, ignore_index=True)
