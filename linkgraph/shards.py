"""GraphShard actor: one vertex partition's adjacency + mutable state.

The Ray analog of Gemini's per-rank Graph object
(/root/reference/core/graph.hpp:90-141): each shard pins

  push-CSR  rows keyed by ANY src, neighbors = locally-owned dsts
            (built from edges routed by dst owner, graph.hpp:986-987)
  pull-CSC  rows keyed by ANY dst, neighbors = locally-owned srcs
            (routed by src owner, graph.hpp:1183-1184)

plus dense per-local-vertex state arrays (`value[v - lo]` indexing) and
the frontier bitmaps.  Because pull-CSC neighbors are local by
construction, dense gather reads ONLY local state — no cross-shard state
shipping per superstep (SURVEY.md §7.5.2); messages are the only traffic.

All per-batch work is vectorized numpy over the pinned arrays; messages
move as numpy arrays through the object store (zero-copy reads).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

import ray

from .csr import (
    CompressedRows,
    build_compressed,
    combine_updates,
    count_pairs,
    expand_rows,
    rows_of,
    segment_reduce,
)
from .partition import part_of
from .store import read_part_edges

INT_INF = np.iinfo(np.int64).max


@dataclass
class ShardCtx:
    """Read-only context handed to VertexProgram hooks."""

    part: int
    lo: int
    hi: int
    n_vertices: int
    n_edges: int
    out_deg: np.ndarray  # int64[hi-lo]
    in_deg: np.ndarray
    out_wsum: np.ndarray | None = None  # float64[hi-lo], weighted stores
    params: dict = field(default_factory=dict)

    @property
    def n_local(self) -> int:
        return self.hi - self.lo


def _split_by_owner(ids: np.ndarray, offsets: np.ndarray, *cols):
    """Split (ids, *aligned cols) into per-partition tuples by owner of ids."""
    p = part_of(ids, offsets)
    order = np.argsort(p, kind="stable")
    p_sorted = p[order]
    n_parts = len(offsets) - 1
    bounds = np.searchsorted(p_sorted, np.arange(n_parts + 1))
    out = []
    for i in range(n_parts):
        sl = order[bounds[i]:bounds[i + 1]]
        out.append(tuple(c[sl] for c in (ids, *cols)))
    return out


def _split_sorted(ids: np.ndarray, offsets: np.ndarray, *cols):
    """_split_by_owner for ids ALREADY SORTED ascending: owner spans are
    searchsorted slices — no argsort.  Every dense signal emits in
    row_vertex order (sorted by construction, csr.build_compressed), and
    the argsort was the single largest superstep cost at 32 shards
    (1.17s/shard/step measured vs 0.0s for the sorted split)."""
    bounds = np.searchsorted(ids, offsets)
    return [tuple(c[bounds[i]:bounds[i + 1]] for c in (ids, *cols))
            for i in range(len(offsets) - 1)]


@ray.remote
class GraphShard:
    """One partition of the graph: adjacency + state + superstep kernels."""

    def __init__(self, store_dir: str, part: int, meta: dict,
                 block_refs=None):
        self.part = part
        self.store_dir = store_dir
        self.meta = meta
        self.offsets = np.asarray(meta["offsets"], dtype=np.int64)
        self.lo = int(self.offsets[part])
        self.hi = int(self.offsets[part + 1])
        self.n_parts = meta["num_partitions"]
        weighted = meta["weighted"]

        if block_refs is not None:
            # in-memory store: zero-copy reads of the routed Arrow blocks
            from .store import part_edges_from_blocks

            blocks = ray.get(list(block_refs))
            src, dst, w = part_edges_from_blocks(blocks, "push", part,
                                                 weighted)
        else:
            src, dst, w = read_part_edges(store_dir, "push", part, weighted)
        if meta["symmetric"]:
            # symmetric edge set: pull partition == push partition with roles
            # swapped == the same compressed structure (graph.hpp:732-737)
            psrc, pdst, pw = dst, src, w
        else:
            if block_refs is not None:
                psrc, pdst, pw = part_edges_from_blocks(blocks, "pull",
                                                        part, weighted)
            else:
                psrc, pdst, pw = read_part_edges(store_dir, "pull", part,
                                                 weighted)
        # LAZY CSR: each orientation is sorted on FIRST use — a static
        # dense program (PageRank) never touches push-CSR and a
        # pure-sparse run never touches pull-CSC, so boot skips those
        # argsorts (the dominant shard-boot cost) entirely
        self._push = None          # rows: src, nbrs: local dst
        self._push_raw = (src, dst, w)
        self._pull_is_push = bool(meta["symmetric"])
        self._pull = None          # rows: dst, nbrs: local src
        self._pull_raw = None if self._pull_is_push else (pdst, psrc, pw)
        # local degrees from the shard's own partitions:
        #   out_degree of local v = #edges with src==v  (all land in pull part)
        #   in_degree  of local v = #edges with dst==v  (all land in push part)
        n_local = self.hi - self.lo
        self.out_deg = np.bincount(psrc - self.lo, minlength=n_local).astype(np.int64) \
            if len(psrc) else np.zeros(n_local, dtype=np.int64)
        self.in_deg = np.bincount(dst - self.lo, minlength=n_local).astype(np.int64) \
            if len(dst) else np.zeros(n_local, dtype=np.int64)
        # out-edge weight sums (weighted PageRank's renormalizer): all
        # out-edges of a local v live in this shard's pull partition
        self.out_wsum = (
            np.bincount(psrc - self.lo, weights=pw, minlength=n_local)
            if weighted and len(psrc)
            else (np.zeros(n_local, dtype=np.float64) if weighted else None))

        self.program = None
        self.state: dict[str, np.ndarray] = {}
        self.active = np.zeros(n_local, dtype=bool)
        self.next_active = np.zeros(n_local, dtype=bool)

    # -- lazy adjacency ------------------------------------------------------

    @property
    def push(self) -> CompressedRows:
        if self._push is None:
            k, v, w = self._push_raw
            self._push = build_compressed(k, v, w)
            self._push_raw = None
        return self._push

    @property
    def pull(self) -> CompressedRows:
        if self._pull_is_push:
            return self.push
        if self._pull is None:
            k, v, w = self._pull_raw
            self._pull = build_compressed(k, v, w)
            self._pull_raw = None
        return self._pull

    def _side_stats(self, cr, raw):
        if cr is not None:
            return cr.n_edges, cr.nbytes()
        return len(raw[0]), sum(a.nbytes for a in raw if a is not None)

    # -- lifecycle -----------------------------------------------------------

    def ping(self) -> dict:
        push_e, push_b = self._side_stats(self._push, self._push_raw)
        pull_e, pull_b = ((push_e, 0) if self._pull_is_push else
                          self._side_stats(self._pull, self._pull_raw))
        return {
            "part": self.part, "lo": self.lo, "hi": self.hi,
            "push_edges": push_e, "pull_edges": pull_e,
            "bytes": push_b + pull_b,
        }

    def init_run(self, program, params: dict) -> int:
        self.program = program
        self.ctx = ShardCtx(self.part, self.lo, self.hi,
                            self.meta["n_vertices"], self.meta["n_edges"],
                            self.out_deg, self.in_deg, self.out_wsum,
                            params)
        if getattr(program, "continues", False):
            self.state = program.init_state(self.ctx, self.state)
        else:
            self.state = program.init_state(self.ctx)
        self.active = program.initial_active(self.ctx, self.state)
        self.next_active = np.zeros(self.ctx.n_local, dtype=bool)
        self._snaps: dict = {}
        return int(self.active.sum())

    def transpose(self):
        """Swap push/pull orientation + degrees (graph.hpp:759-768) —
        pointer swap, zero-copy; BC's backward phase runs on G^T.
        Swaps the lazy slots too, so an unbuilt orientation stays unbuilt
        (symmetric graphs: pull aliases push, only degrees swap)."""
        if not self._pull_is_push:
            self._push, self._pull = self._pull, self._push
            self._push_raw, self._pull_raw = self._pull_raw, self._push_raw
        self.out_deg, self.in_deg = self.in_deg, self.out_deg
        return self.part

    def frontier_stats(self):
        """(active count, sum of out_degree over active) — drives the
        sparse/dense switch (graph.hpp:1502-1508)."""
        return int(self.active.sum()), int(self.out_deg[self.active].sum())

    # -- sparse (push) mode --------------------------------------------------

    def sparse_signal(self):
        """Active masters emit (global id, msg) — small by mode rule."""
        idx = np.flatnonzero(self.active)
        if len(idx) == 0:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        msgs = self.program.signal(self.ctx, self.state, idx)
        return idx + self.lo, msgs

    def sparse_apply(self, msg_refs, step=None, final=False):
        """Apply the broadcast frontier messages via local push-CSR rows.
        With step != None also runs finish_step (fused: one actor round
        trip per shard per superstep instead of two)."""
        activated = self._sparse_apply(msg_refs)
        if step is None:
            return activated
        return activated, self.finish_step(step, final)

    def _sparse_apply(self, msg_refs):
        parts = ray.get(list(msg_refs))
        ids = np.concatenate([p[0] for p in parts])
        msgs = np.concatenate([p[1] for p in parts])
        if len(ids) == 0:
            return 0
        pos, present = rows_of(self.push, ids)
        if not present.any():
            return 0
        edge_idx, row_rep = expand_rows(self.push, pos[present])
        if len(edge_idx) == 0:
            return 0
        dst_local = self.push.indices[edge_idx] - self.lo
        vals = msgs[present][row_rep]
        w = self.push.weights[edge_idx] if self.push.weights is not None else None
        vals = self.program.edge_transform(vals, w)
        uniq, agg = combine_updates(dst_local, vals, self.program.combine)
        changed = self.program.apply(self.ctx, self.state, uniq, agg)
        self.next_active[uniq[changed]] = True
        return int(changed.sum())

    # -- dense (pull) mode ---------------------------------------------------

    def selective_slice(self):
        """Packed skip bitmap of this shard's OWNED vertices for the
        dense-selective exchange (graph.hpp:1664-1689): np.packbits of
        program.selective_mask — |V_local|/8 bytes per shard pair."""
        mask = self.program.selective_mask(self.ctx, self.state)
        if mask is None:
            mask = np.zeros(self.ctx.n_local, dtype=bool)
        return np.packbits(mask)

    def _skip_rows(self, cr, sel_refs) -> np.ndarray:
        """bool[n_rows]: pull rows whose dst is flagged in the exchanged
        skip bitmaps (row_vertex is sorted, so each owner's span is one
        searchsorted slice)."""
        sel = ray.get(list(sel_refs))
        rv = cr.row_vertex
        skip = np.zeros(len(rv), dtype=bool)
        for j in range(self.n_parts):
            lo, hi = int(self.offsets[j]), int(self.offsets[j + 1])
            a, b = np.searchsorted(rv, [lo, hi])
            if a == b or hi == lo:
                continue
            bits = np.unpackbits(sel[j], count=hi - lo).astype(bool)
            skip[a:b] = bits[rv[a:b] - lo]
        return skip

    def dense_signal(self, sel_refs=None):
        """Scan pull-CSC, reduce per dst row over LOCAL src state, route
        partials to dst owners.  Returns n_parts pieces.  With sel_refs
        (dense-selective programs) rows whose dst is flagged skipped are
        dropped BEFORE any gather — the direction-optimizing pull does
        O(edges of unsettled rows), not O(E) (bfs.cpp:60-68)."""
        cr: CompressedRows = self.pull
        prog = self.program
        if prog.combine == "hist":
            return self._dense_signal_hist()
        n_rows = len(cr.row_vertex)
        if n_rows == 0:
            empty = (np.empty(0, cr.row_vertex.dtype),
                     np.empty(0, np.float64))
            return [empty] * self.n_parts
        if sel_refs is not None:
            return self._dense_signal_selective(cr, sel_refs)
        src_vals = prog.dense_src_values(self.ctx, self.state)
        li = cr.local_indices(self.lo)
        edge_vals = src_vals[li]
        w = cr.weights
        edge_vals = prog.edge_transform(edge_vals, w)
        vmask = prog.dense_src_mask(self.ctx, self.state, self.active)
        emask = vmask[li] if vmask is not None else None
        partial = segment_reduce(edge_vals, cr.indptr, prog.combine, emask,
                                 row_rep=cr.row_rep)
        emit = prog.dense_emit_mask(self.ctx, cr.row_vertex, partial)
        if emit.all():
            # full emit (min-combine programs, near-full add graphs):
            # skip the two mask-gathers — the split slices views
            return _split_sorted(cr.row_vertex, self.offsets, partial)
        return _split_sorted(cr.row_vertex[emit], self.offsets, partial[emit])

    def _dense_signal_selective(self, cr, sel_refs):
        """Row-subset pull: only unskipped rows are expanded, only edges
        from ACTIVE srcs contribute; rows with no active in-neighbor emit
        nothing (vectorized analog of the per-row early-exit scan,
        bfs.cpp:62-68)."""
        prog = self.program
        keep_rows = np.flatnonzero(~self._skip_rows(cr, sel_refs))
        empty = (np.empty(0, np.int64), np.empty(0, np.float64))
        if len(keep_rows) == 0:
            return [empty] * self.n_parts
        edge_idx, row_rep = expand_rows(cr, keep_rows)
        if len(edge_idx) == 0:
            return [empty] * self.n_parts
        src_local = cr.indices[edge_idx] - self.lo
        vmask = prog.dense_src_mask(self.ctx, self.state, self.active)
        if vmask is not None:
            em = vmask[src_local]
            edge_idx, row_rep, src_local = (
                edge_idx[em], row_rep[em], src_local[em])
            if len(edge_idx) == 0:
                return [empty] * self.n_parts
        vals = prog.dense_src_values(self.ctx, self.state)[src_local]
        w = cr.weights[edge_idx] if cr.weights is not None else None
        vals = prog.edge_transform(vals, w)
        uniq_rep, partial = combine_updates(row_rep, vals, prog.combine)
        rows = cr.row_vertex[keep_rows[uniq_rep]]
        emit = prog.dense_emit_mask(self.ctx, rows, partial)
        return _split_sorted(rows[emit], self.offsets, partial[emit])

    def _dense_signal_hist(self):
        """Histogram combine (label propagation): emit per-(dst,label) counts."""
        cr = self.pull
        if len(cr.row_vertex) == 0:
            empty = (np.empty(0, np.int64), np.empty(0, np.int64),
                     np.empty(0, np.int64))
            return [empty] * self.n_parts
        labels = self.program.dense_src_values(self.ctx, self.state)
        edge_labels = labels[cr.local_indices(self.lo)]
        row_id = np.repeat(np.arange(len(cr.row_vertex), dtype=np.int64),
                           np.diff(cr.indptr))
        vmask = self.program.dense_src_mask(self.ctx, self.state,
                                            self.active)
        if vmask is not None:  # phase-gated hist sources (e.g. coloring)
            em = vmask[cr.local_indices(self.lo)]
            row_id, edge_labels = row_id[em], edge_labels[em]
        ur, ul, counts = count_pairs(row_id, edge_labels)
        # count_pairs returns groups lexsorted by row id -> sorted rows
        return _split_sorted(cr.row_vertex[ur], self.offsets, ul, counts)

    def dense_apply(self, piece_refs, step=None, final=False,
                    piece_index=None):
        """Combine routed partials into local state (the slot side).
        With step != None also runs finish_step (fused round trip).
        piece_index: set when signals returned ONE object holding all
        n_parts pieces (small-message mode — n_parts objects per
        superstep instead of n_parts^2); this shard uses pieces[index]."""
        activated = self._dense_apply(piece_refs, piece_index)
        if step is None:
            return activated
        return activated, self.finish_step(step, final)

    def _dense_apply(self, piece_refs, piece_index=None):
        got = ray.get(list(piece_refs))
        if piece_index is not None:
            got = [p[piece_index] for p in got]
        pieces = []
        for p in got:  # tolerate whole piece-lists (n_parts==1 path)
            pieces.extend(p) if isinstance(p, list) else pieces.append(p)
        prog = self.program
        if prog.combine == "hist":
            return self._dense_apply_hist(pieces)
        ids = np.concatenate([p[0] for p in pieces])
        vals = np.concatenate([p[1] for p in pieces])
        if len(ids) == 0:
            return 0
        uniq, agg = combine_updates(ids - self.lo, vals, prog.combine)
        changed = prog.apply(self.ctx, self.state, uniq, agg)
        self.next_active[uniq[changed]] = True
        return int(changed.sum())

    def init_stats(self):
        """(active, active out-degree sum) right after init/resume."""
        return int(self.active.sum()), int(self.out_deg[self.active].sum())

    def step_static(self, piece_refs, piece_index, step, final,
                    snapshot: int = 0):
        """Fully-fused superstep for static-frontier programs (PageRank,
        LP): apply the previous superstep's routed partials, run the
        vertex phase, and emit THIS superstep's dense signal — ONE actor
        task per shard per superstep.  Valid because a full frontier is
        always dense (active_edges == |E| >= |E|/20) and dense signal
        reads only local state.  Returns (meta, pieces) via num_returns=2
        so the driver fetches only meta.

        snapshot > 0: the engine is scheduling supersteps AHEAD of the
        stop-condition evaluation (engine._run_static_fused lookahead);
        keep a copy of the post-step state for the last `snapshot` steps
        so a late-arriving stop decision can roll the speculative
        supersteps back (`rollback`) — exact-stop semantics preserved.
        """
        if piece_refs is None:
            meta = (0, None)  # initial call: signal only
        else:
            activated = self._dense_apply(piece_refs, piece_index)
            meta = (activated, self.finish_step(step, final))
            if snapshot:
                self._snaps[step] = {k: v.copy()
                                     for k, v in self.state.items()}
                for old in [s for s in self._snaps
                            if s < step - snapshot]:
                    del self._snaps[old]
        pieces = None if final else self.dense_signal()
        return meta, pieces

    def step_static_parts(self, piece_refs, step, final,
                          snapshot: int = 0):
        """step_static with PER-OWNER piece routing for message volumes
        above the fused-object cap (engine._use_fused): called with
        options(num_returns=1 + n_parts), it returns (meta, piece for
        owner 0, ..., piece for owner n-1) so each consumer fetches
        only its slice — the num_returns message plan, now fused with
        apply+vertex-phase into one task per shard per superstep."""
        if piece_refs is None:
            meta = (0, None)  # initial call: signal only
        else:
            activated = self._dense_apply(piece_refs, None)
            meta = (activated, self.finish_step(step, final))
            if snapshot:
                self._snaps[step] = {k: v.copy()
                                     for k, v in self.state.items()}
                for old in [s for s in self._snaps
                            if s < step - snapshot]:
                    del self._snaps[old]
        if final:
            return (meta, *([None] * self.n_parts))
        return (meta, *self.dense_signal())

    def rollback(self, step: int) -> None:
        """Restore the post-`step` snapshot (discard speculative
        supersteps executed past a stop condition).  Static-frontier
        only: the frontier is always full, so state is the whole
        story."""
        snap = self._snaps[step]
        self.state = {k: v.copy() for k, v in snap.items()}
        self.active = np.ones(self.ctx.n_local, dtype=bool)
        self.next_active = np.zeros(self.ctx.n_local, dtype=bool)
        self._snaps.clear()

    def _dense_apply_hist(self, pieces):
        ids = np.concatenate([p[0] for p in pieces])
        labels = np.concatenate([p[1] for p in pieces])
        counts = np.concatenate([p[2] for p in pieces])
        if len(ids) == 0:
            return 0
        uid, ulab, ucnt = count_pairs(ids, labels, counts)
        if hasattr(self.program, "hist_apply"):
            # raw-histogram programs (e.g. JP coloring) consume the full
            # merged (dst, label, count) triples instead of the LP argmax
            changed = self.program.hist_apply(
                self.ctx, self.state, uid - self.lo, ulab, ucnt)
            self.next_active[(uid - self.lo)[changed]] = True
            return int(changed.sum())
        # per dst: max count, tie-break smallest label (deterministic,
        # SURVEY.md §2.3 LP design)
        order = np.lexsort((ulab, -ucnt, uid))
        uid, ulab = uid[order], ulab[order]
        first = np.ones(len(uid), dtype=bool)
        first[1:] = uid[1:] != uid[:-1]
        tgt, winner = uid[first] - self.lo, ulab[first]
        changed = self.program.apply(self.ctx, self.state, tgt, winner)
        self.next_active[tgt[changed]] = True
        return int(changed.sum())

    # -- vertex phase / bookkeeping -----------------------------------------

    def finish_step(self, step: int, final: bool):
        """Swap frontiers, run the program's vertex phase; return metrics."""
        prog = self.program
        reducers = prog.post_step(self.ctx, self.state, self.active, step, final)
        if prog.static_frontier:
            self.next_active = self.active  # stays full (pagerank.cpp:32-33)
        self.active, self.next_active = (
            self.next_active, np.zeros(self.ctx.n_local, dtype=bool))
        override = prog.after_step(self.ctx, self.state, self.active)
        if override is not None:
            self.active = override
        return {"active": int(self.active.sum()),
                "active_out_deg": int(self.out_deg[self.active].sum()),
                **{k: float(v) for k, v in reducers.items()}}

    def finalize_run(self):
        self._snaps = {}
        self.program.finalize(self.ctx, self.state)
        return 0

    def map_vertices(self, fn):
        """process_vertices analog (graph.hpp:1406-1468): fn(ctx, state,
        active) -> partial scalar, summed on the driver."""
        return fn(self.ctx, self.state, self.active)

    def state_table(self, columns: list[str]):
        """Export local vertex state as an Arrow table (v + columns)."""
        import pyarrow as pa

        n = self.ctx.n_local
        data = {"v": pa.array(np.arange(self.lo, self.hi, dtype=np.int64))}
        for c in columns:
            data[c] = pa.array(self.state[c][:n])
        return pa.table(data)

    @staticmethod
    def _is_vertex_state(name: str, arr) -> bool:
        # "_"-prefixed entries are scalar run parameters, not per-vertex
        return isinstance(arr, np.ndarray) and not name.startswith("_")

    # -- checkpoint / resume (north rule: every superstep resumable) --------

    def save_state(self, ckpt_dir: str, step: int) -> dict:
        import pyarrow as pa

        from .io import write_table

        cols = {name: pa.array(arr) for name, arr in self.state.items()
                if self._is_vertex_state(name, arr)}
        cols["__active"] = pa.array(self.active)
        path = f"{ckpt_dir}/step={step}/part={self.part}.parquet"
        write_table(pa.table(cols), path)
        return {"part": self.part, "rows": self.ctx.n_local,
                "active": int(self.active.sum()), "path": path}

    def load_state_range(self, path: str, columns: list[str]) -> int:
        """Read this shard's [lo, hi) slice of a dumped vertex array."""
        import pyarrow.dataset as pads

        dset = pads.dataset(path, format="parquet")
        f = (pads.field("v") >= self.lo) & (pads.field("v") < self.hi)
        t = dset.to_table(columns=["v"] + columns, filter=f)
        order = np.argsort(t["v"].to_numpy(zero_copy_only=False))
        for c in columns:
            vals = t[c].to_numpy(zero_copy_only=False)[order]
            assert len(vals) == self.ctx.n_local
            self.state[c] = vals.copy()
        return self.ctx.n_local

    def load_state(self, ckpt_dir: str, step: int) -> int:
        import pyarrow.parquet as pq

        t = pq.read_table(f"{ckpt_dir}/step={step}/part={self.part}.parquet")
        for name in t.column_names:
            arr = t[name].to_numpy(zero_copy_only=False)
            if name == "__active":
                self.active = arr.astype(bool)
            else:
                self.state[name] = arr.copy()
        self.next_active = np.zeros(self.ctx.n_local, dtype=bool)
        return int(self.active.sum())
