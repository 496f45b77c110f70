"""Pure numpy compressed-sparse-row kernels (unit-testable, no Ray).

The in-memory analog of Gemini's doubly-compressed adjacency
(/root/reference/core/type.hpp:57-60 CompressedAdjIndexUnit;
graph.hpp:1010-1043 build): rows are stored only for vertices with a
non-empty adjacency — `row_vertex[k]` is the k-th non-empty row's vertex
id, `indptr[k]:indptr[k+1]` spans its neighbors in `indices` (and
`weights` when the graph is weighted).  Skipping empty rows is what keeps
per-shard scans O(rows present), not O(|V|) — critical at 1e12-file scale
where most vertices are absent from any given shard.

All kernels are vectorized; none iterates Python rows.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class CompressedRows:
    """One shard's adjacency in compressed form.

    row_vertex : sorted global vertex ids of non-empty rows
    indptr     : int64[len(row_vertex)+1] offsets into indices
    indices    : global vertex ids of neighbors (shard-local by build rule)
    weights    : optional float64 aligned with indices
    """

    row_vertex: np.ndarray
    indptr: np.ndarray
    indices: np.ndarray
    weights: np.ndarray | None = None
    _row_rep: np.ndarray | None = None
    _local_idx: np.ndarray | None = None
    _local_lo: int | None = None

    @property
    def n_edges(self) -> int:
        return len(self.indices)

    @property
    def row_rep(self) -> np.ndarray:
        """int32[n_edges] row index per edge, built lazily ONCE per shard
        (the structure is static): feeds the bincount fast path of
        segment_reduce — measured 4x over np.add.reduceat, whose
        per-segment C loop (not DRAM) was the dense-superstep floor."""
        if self._row_rep is None:
            lens = np.diff(self.indptr)
            object.__setattr__(self, "_row_rep", np.repeat(
                np.arange(len(lens), dtype=np.int32), lens))
        return self._row_rep

    def local_indices(self, lo: int) -> np.ndarray:
        """`indices - lo` cached ONCE per shard (static structure): the
        per-superstep subtract allocated a fresh n_edges array every
        dense signal — pure DRAM traffic for an invariant value.  Kept
        int32 when the local range allows (it always does: local ids
        are < n_local < 2^31)."""
        if self._local_idx is None or self._local_lo != lo:
            li = self.indices - lo
            if len(li) == 0 or li.max(initial=0) < 2 ** 31:
                li = li.astype(np.int32, copy=False)
            object.__setattr__(self, "_local_idx", li)
            object.__setattr__(self, "_local_lo", lo)
        return self._local_idx

    def nbytes(self) -> int:
        n = self.row_vertex.nbytes + self.indptr.nbytes + self.indices.nbytes
        if self.weights is not None:
            n += self.weights.nbytes
        return n


def build_compressed(keys: np.ndarray, values: np.ndarray,
                     weights: np.ndarray | None = None) -> CompressedRows:
    """Build compressed rows from parallel (key, value[, weight]) arrays.

    push-CSR: keys=src, values=dst (edges routed to dst's owner,
    graph.hpp:986-987, rows indexed by src, graph.hpp:960-964).
    pull-CSC: keys=dst, values=src (routed to src's owner,
    graph.hpp:1183-1184, rows indexed by dst, graph.hpp:1158-1162).

    Deterministic: edges sorted by (key, value) regardless of input order.
    Duplicate edges are preserved (reference keeps multi-edges, SURVEY §2).
    """
    keys = np.asarray(keys)
    values = np.asarray(values)
    narrow = bool(len(keys)) and int(keys.max(initial=0)) < 2 ** 31 \
        and int(values.max(initial=0)) < 2 ** 31
    if narrow and weights is None:
        # composite VALUE sort: np.sort of (key<<32 | value) then split —
        # no index array, no payload gathers.  The CSR build is DRAM-
        # bound (32 concurrent shard builds measured 2-10s each at 96M
        # edges vs ~0.4s alone); dropping the argsort+two-gather pattern
        # roughly halves the bytes it moves
        comp = np.sort((keys.astype(np.int64) << 32)
                       | values.astype(np.int64), kind="stable")
        keys = comp >> 32
        values = comp & np.int64(0xFFFFFFFF)
        w = None
    else:
        keys = keys.astype(np.int64, copy=False)
        values = values.astype(np.int64, copy=False)
        if narrow:
            # composite-key fast path: one argsort of (key<<32 | value)
            # instead of a two-pass lexsort — shard boot is sort-bound
            order = np.argsort((keys << 32) | values, kind="stable")
        else:
            order = np.lexsort((values, keys))
        keys = keys[order]
        values = values[order]
        w = None if weights is None \
            else np.asarray(weights, dtype=np.float64)[order]
    # boundary scan instead of np.unique (which re-sorts internally)
    if len(keys):
        bound = np.empty(len(keys), dtype=bool)
        bound[0] = True
        np.not_equal(keys[1:], keys[:-1], out=bound[1:])
        starts = np.flatnonzero(bound)
        row_vertex = keys[starts]
        counts = np.diff(np.concatenate([starts, [len(keys)]]))
    else:
        row_vertex = keys
        counts = np.empty(0, dtype=np.int64)
    indptr = np.zeros(len(row_vertex) + 1, dtype=np.int64)
    np.cumsum(counts, out=indptr[1:])
    if narrow:
        # |V| < 2^31: int32 rows/indices halve CSR memory AND the id
        # bytes of every dense-signal message (12B/row instead of 16B)
        row_vertex = row_vertex.astype(np.int32)
        values = values.astype(np.int32)
    return CompressedRows(row_vertex, indptr, values, w)


def rows_of(cr: CompressedRows, vertices: np.ndarray):
    """Locate compressed-row positions for global vertex ids.

    Returns (row_pos, present_mask): `row_pos[i]` is the compressed row of
    `vertices[i]` where `present_mask[i]`; vertices with no local adjacency
    are absent (the point of the compressed index).
    """
    vertices = np.asarray(vertices, dtype=np.int64)
    pos = np.searchsorted(cr.row_vertex, vertices)
    pos_c = np.minimum(pos, len(cr.row_vertex) - 1) if len(cr.row_vertex) else pos
    present = (
        (pos < len(cr.row_vertex)) & (cr.row_vertex[pos_c] == vertices)
        if len(cr.row_vertex)
        else np.zeros(len(vertices), dtype=bool)
    )
    return pos, present


def expand_rows(cr: CompressedRows, row_pos: np.ndarray):
    """Flatten the adjacency of the given compressed rows, vectorized.

    Returns (edge_idx, row_rep) where `edge_idx` indexes cr.indices /
    cr.weights for every edge of every requested row (rows in request
    order), and `row_rep[i]` is the position in `row_pos` that edge i
    belongs to (for np.repeat-style message expansion).
    """
    starts = cr.indptr[row_pos]
    lens = cr.indptr[row_pos + 1] - starts
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    row_rep = np.repeat(np.arange(len(row_pos), dtype=np.int64), lens)
    # offset-within-row for each flat slot, then add the row's start
    csum = np.cumsum(lens) - lens
    edge_idx = np.arange(total, dtype=np.int64) - csum[row_rep] + starts[row_rep]
    return edge_idx, row_rep


def segment_reduce(values: np.ndarray, indptr: np.ndarray, op: str,
                   mask: np.ndarray | None = None,
                   row_rep: np.ndarray | None = None) -> np.ndarray:
    """Per-row reduce over CSR segments; identity-filled for masked-out edges.

    op='add' -> sum (identity 0); op='min' -> min (identity +inf);
    op='max' -> max (identity -inf / int min).
    The vectorized analog of Gemini's dense_signal inner loops
    (e.g. pagerank.cpp:63-68 sum, cc.cpp:60-66 min).

    Pass the (static) `row_rep` edge->row index to unlock the bincount
    fast path for float add: ~4x over np.add.reduceat, whose per-segment
    C loop is the measured floor of the dense superstep.  (Summation
    association changes from reduceat's partial unrolling to strictly
    sequential — a <=1e-15 relative difference, the same order the
    cross-engine oracle comparisons already tolerate.)
    """
    if op == "add":
        ident = 0
        ufunc = np.add
        vals = np.where(mask, values, ident) if mask is not None else values
        if row_rep is not None and vals.dtype == np.float64:
            return np.bincount(row_rep, weights=vals,
                               minlength=len(indptr) - 1)
    elif op == "min":
        ident = np.inf if values.dtype.kind == "f" else np.iinfo(values.dtype).max
        ufunc = np.minimum
        vals = np.where(mask, values, ident) if mask is not None else values
    elif op == "max":
        ident = -np.inf if values.dtype.kind == "f" \
            else np.iinfo(values.dtype).min
        ufunc = np.maximum
        vals = np.where(mask, values, ident) if mask is not None else values
    else:
        raise ValueError(op)
    n_rows = len(indptr) - 1
    if n_rows <= 0:
        return np.zeros(0, dtype=vals.dtype)
    lens = np.diff(indptr)
    if len(vals) == 0:
        return np.full(n_rows, ident, dtype=values.dtype)
    # reduceat quirk: an empty segment (indptr[k]==indptr[k+1]) yields
    # vals[indptr[k]] not the identity, and a trailing start==len(vals)
    # is out of bounds — clip then overwrite empties with the identity.
    starts = np.minimum(indptr[:-1], len(vals) - 1)
    out = ufunc.reduceat(vals, starts)
    out[lens == 0] = ident
    return out


def count_pairs(a: np.ndarray, b: np.ndarray,
                weights: np.ndarray | None = None):
    """Group parallel (a, b) pairs; return (ua, ub, counts) per distinct pair.

    counts sums `weights` when given (merging partial histograms), else
    multiplicities.  Vectorized two-key groupby — the label-frequency
    combine for label propagation (SURVEY.md §2.3).
    """
    if len(a) == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z.copy(), z.copy()
    order = np.lexsort((b, a))
    a_s, b_s = a[order], b[order]
    w_s = weights[order] if weights is not None else np.ones(len(a), np.int64)
    newgrp = np.empty(len(a_s), dtype=bool)
    newgrp[0] = True
    newgrp[1:] = (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])
    starts = np.flatnonzero(newgrp)
    counts = np.add.reduceat(w_s, starts)
    return a_s[starts], b_s[starts], counts


def combine_updates(dst_local: np.ndarray, vals: np.ndarray, op: str):
    """Combine per-edge/per-partial updates targeting local vertices.

    Returns (uniq_idx, agg): unique local target indices and their combined
    value.  Deterministic vectorized replacement for Gemini's atomic
    write_add / write_min (core/atomic.hpp:24-51) — combine order cannot
    change results because the reduction is computed per target, not by
    racing writers.
    """
    if len(dst_local) == 0:
        return dst_local, vals
    if op == "add" and vals.dtype == np.float64:
        # sort-free: bincount accumulates in array order — the SAME
        # per-target addition sequence the stable argsort + reduceat
        # produced (stable sort preserves appearance order within each
        # target), so results are bit-identical, ~3x faster, and the
        # output array is bounded by n_local (targets are local ids)
        counts = np.bincount(dst_local)
        acc = np.bincount(dst_local, weights=vals)
        uniq = np.flatnonzero(counts)
        return uniq, acc[uniq]
    order = np.argsort(dst_local, kind="stable")
    d = dst_local[order]
    v = vals[order]
    boundaries = np.empty(len(d), dtype=bool)
    boundaries[0] = True
    np.not_equal(d[1:], d[:-1], out=boundaries[1:])
    starts = np.flatnonzero(boundaries)
    uniq = d[starts]
    if op == "add":
        agg = np.add.reduceat(v, starts)
    elif op == "min":
        agg = np.minimum.reduceat(v, starts)
    elif op == "max":
        agg = np.maximum.reduceat(v, starts)
    else:
        raise ValueError(op)
    return uniq, agg
