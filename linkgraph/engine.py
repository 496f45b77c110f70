"""Superstep driver: Gemini's process_vertices / process_edges on Ray.

Re-expresses /root/reference/core/graph.hpp:1406-1866 for a shard-actor
pool:

  process_edges superstep
    1. frontier stats from every shard             (graph.hpp:1502-1507)
    2. adaptive mode: sparse iff
       active_out_edges < n_edges / SPARSE_DENOM   (graph.hpp:1508)
    3a. sparse/push: shards' active masters emit (src, msg); the small
        message set is BROADCAST (object-store refs, read zero-copy by
        every shard) and applied via local push-CSR rows
        (graph.hpp:1529-1662) — dst is always local, no second shuffle
    3b. dense/pull: every shard reduces its pull-CSC rows over LOCAL src
        state and routes per-dst partials to the dst owner
        (num_returns=n_parts direct actor handoff — the message shuffle,
        graph.hpp:1663-1854); owners combine deterministically
    4. vertex phase + frontier swap per shard, partial reducers summed on
       the driver (replaces MPI_Allreduce, graph.hpp:1856-1858)

Combines are per-target vectorized reductions (csr.combine_updates), so
results are deterministic and independent of partition count — unlike the
reference's atomics (SURVEY.md §4 determinism row).
"""

from __future__ import annotations

import time

import numpy as np

import ray

from .checkpoint import latest_step, write_manifest
from .shards import GraphShard

SPARSE_DENOM = 20  # sparse iff active_edges < |E|/20 (graph.hpp:1508)


class VertexProgram:
    """Algorithm spec: vectorized numpy hooks run inside shard actors.

    The signal/slot pair of Gemini's process_edges (graph.hpp:1492-1866)
    becomes: `signal`/`dense_src_values` (what a vertex says),
    `edge_transform` (per-edge arithmetic, e.g. +weight),
    `apply` (how a target combines what it heard), `post_step` (the
    process_vertices phase between supersteps).
    """

    combine: str = "add"          # 'add' | 'min' | 'hist'
    supports_sparse: bool = True
    static_frontier: bool = False  # True: frontier stays full (PageRank/LP)
    continues: bool = False        # True: init_state receives prior state
                                   # (multi-phase algorithms, e.g. BC backward)
    dense_selective: bool = False  # True: exchange a skip bitmap before each
                                   # dense superstep so pull scans skip rows
                                   # whose dst is already settled (Gemini's
                                   # dense_selective, graph.hpp:1664-1689 /
                                   # bfs.cpp:61,:77)

    # state ------------------------------------------------------------
    def init_state(self, ctx, prev=None) -> dict[str, np.ndarray]:
        raise NotImplementedError

    def initial_active(self, ctx, state) -> np.ndarray:
        return np.ones(ctx.n_local, dtype=bool)

    # push (sparse) side ------------------------------------------------
    def signal(self, ctx, state, local_idx) -> np.ndarray:
        raise NotImplementedError

    # pull (dense) side -------------------------------------------------
    def dense_src_values(self, ctx, state) -> np.ndarray:
        raise NotImplementedError

    def dense_src_mask(self, ctx, state, active):
        return None  # default: reduce over ALL in-neighbors (cc.cpp:60-66)

    def selective_mask(self, ctx, state):
        """When dense_selective: bool[n_local] of local vertices to SKIP
        as dense-pull targets (BFS: visited — bfs.cpp:61)."""
        return None

    def dense_emit_mask(self, ctx, row_vertex, partial) -> np.ndarray:
        if self.combine == "add":
            return partial != 0
        return np.ones(len(row_vertex), dtype=bool)

    # both sides --------------------------------------------------------
    def edge_transform(self, vals, weights):
        return vals

    def apply(self, ctx, state, tgt_idx, vals) -> np.ndarray:
        raise NotImplementedError

    def post_step(self, ctx, state, active, step, final) -> dict:
        return {}

    def after_step(self, ctx, state, new_active):
        """Post-frontier-swap hook; return a mask to REPLACE the next
        frontier (per-level algorithms like BC), or None to keep it."""
        return None

    def finalize(self, ctx, state) -> None:
        pass

    result_columns: list[str] = []


class GraphEngine:
    """Owns the shard pool for one loaded graph; runs programs on it.

    Like the reference, the loaded graph is reused across runs
    (pagerank.cpp:144-147 runs compute 6x on one load).
    """

    def __init__(self, store_dir: str, meta: dict,
                 num_cpus_per_shard: float = 0):
        # shards default to num_cpus=0: they hold pinned state and compute
        # in synchronized waves driven by run(), so reserving CPUs only
        # risks deadlocking co-resident engines/stages on small sessions;
        # effective parallelism == num_partitions.
        self.store_dir = store_dir
        meta = dict(meta)
        # in-memory store: routed blocks ride as object refs; the
        # MaterializedDataset pin keeps them alive for the engine's life
        block_refs = meta.pop("block_refs", None)
        self._store_pin = meta.pop("_pin", None)
        self.meta = meta
        self.n_parts = meta["num_partitions"]
        self.shards = [
            GraphShard.options(num_cpus=num_cpus_per_shard).remote(
                store_dir, p, meta, block_refs)
            for p in range(self.n_parts)
        ]
        self.shard_info = ray.get([s.ping.remote() for s in self.shards])
        # small-message mode: when TOTAL message bytes are modest, each
        # dense signal returns ONE object holding all pieces (n_parts
        # objects/superstep instead of n_parts^2 — measured 6x superstep
        # speedup at 2M edges / 32 shards).  In fused mode every applier
        # fetches every shard's piece-list (n_parts x total-bytes moved),
        # so it must stay OFF for big graphs — per-owner num_returns then
        # ships each byte exactly once.  The estimate is per-PROGRAM (see
        # _use_fused): hist combines (label propagation) ship 3-column
        # rows bounded only by E, not by the (dst, shard) pair count.
        self.fused_messages = self._use_fused(combine="add")

    def _use_fused(self, combine: str) -> bool:
        """Message-volume estimate for the fused-object decision, scaled
        by the program's combine type: scalar combines emit <= one
        16-byte (dst, val) row per distinct (dst, shard) pair; hist
        combines emit (dst, label, count) rows, up to one per edge."""
        if combine == "hist":
            est = 24 * self.meta["n_edges"]
        else:
            # narrow graphs ship int32 ids: 12B per (dst, val) row
            per_row = 12 if self.meta["n_vertices"] < 2 ** 31 else 16
            est = per_row * min(self.meta["n_edges"],
                                self.meta["n_vertices"] * max(1, self.n_parts))
        return est <= 48 * 1024 * 1024

    def shutdown(self):
        for s in self.shards:
            ray.kill(s)
        self.shards = []

    # ---------------------------------------------------- wave throttle
    #
    # Shards are num_cpus=0 actors (see __init__), so nothing stops a
    # 32-shard wave from running 32-wide inside an 8-CPU session —
    # oversubscribing the box and making any CPU-budget comparison
    # meaningless.  Superstep waves therefore self-throttle to the
    # session's CPU count with a sliding launch window: at most
    # `_wave_cap()` shard tasks in flight, the next launched as one
    # completes.  Sessions with CPUs >= shards (the normal sizing,
    # graph.suggest_partitions) take the unthrottled fast path.

    def _wave_cap(self) -> int:
        try:
            cap = int(ray.cluster_resources().get("CPU", 0))
        except Exception:
            cap = 0
        return max(1, cap or self.n_parts)

    def _wave(self, launch):
        """launch(i) -> ref or num_returns-list for shard i; returns
        [launch(i) for all i] with at most _wave_cap() in flight."""
        n = self.n_parts
        cap = self._wave_cap()
        if cap >= n:
            return [launch(i) for i in range(n)]
        out, pending = [], []
        for i in range(n):
            r = launch(i)
            out.append(r)
            pending.append(r[0] if isinstance(r, list) else r)
            if len(pending) >= cap:
                _, pending = ray.wait(pending, num_returns=1,
                                      fetch_local=False)
        return out

    # ------------------------------------------------------------------

    def run(self, program: VertexProgram, params: dict | None = None,
            max_steps: int = 10 ** 9, stop_reducer: str | None = None,
            stop_tol: float = 0.0, stop_on_no_activation: bool = False,
            ckpt_dir: str | None = None,
            ckpt_every: int = 1, resume: bool = False,
            run_name: str = "run") -> dict:
        """Drive supersteps until the frontier empties, `max_steps`, or
        reducer `stop_reducer` < stop_tol.  Returns the run report (per-
        superstep metrics).  With ckpt_dir every `ckpt_every` supersteps
        are checkpointed; resume=True continues from the latest complete
        checkpoint (north rule: resumable with per-partition lineage).
        """
        params = params or {}
        t0 = time.perf_counter()
        start_step = 0
        if resume and ckpt_dir is not None:
            done = latest_step(ckpt_dir, self.n_parts)
            if done is not None:
                ray.get([s.init_run.remote(program, params) for s in self.shards])
                counts = ray.get([s.load_state.remote(ckpt_dir, done)
                                  for s in self.shards])
                active = sum(counts)
                start_step = done + 1
            else:
                active = sum(ray.get([s.init_run.remote(program, params)
                                      for s in self.shards]))
        else:
            active = sum(ray.get([s.init_run.remote(program, params)
                                  for s in self.shards]))

        steps = []
        n_edges = max(1, self.meta["n_edges"])
        step = start_step
        fused = self._use_fused(getattr(program, "combine", "add"))
        if (program.static_frontier and self.n_parts > 1
                and (fused or ckpt_dir is None)):
            # fully-fused path: ONE actor task per shard per superstep
            # (apply prev + vertex phase + next signal in one call);
            # above the fused-object cap the per-owner num_returns
            # routing is used instead (step_static_parts) — checkpointed
            # non-fused runs keep the generic loop below
            steps = self._run_static_fused(program, step, max_steps,
                                           stop_reducer, stop_tol,
                                           stop_on_no_activation,
                                           ckpt_dir, ckpt_every, run_name,
                                           fused)
            ray.get([s.finalize_run.remote() for s in self.shards])
            return {
                "run": run_name, "steps": steps, "n_steps": len(steps),
                "start_step": start_step,
                "n_edges": self.meta["n_edges"],
                "n_vertices": self.meta["n_vertices"],
                "wall_s": time.perf_counter() - t0,
            }
        # per-shard (active, frontier out-degree) carried from each fused
        # apply+finish, so a superstep costs exactly TWO actor round trips
        # (signal, apply) instead of four
        stats = ray.get([s.init_stats.remote() for s in self.shards])
        while step < max_steps:
            ts = time.perf_counter()
            active = sum(a for a, _ in stats)
            active_edges = sum(d for _, d in stats)
            if active == 0 and not program.static_frontier:
                break
            sparse = (program.supports_sparse
                      and active_edges < n_edges / SPARSE_DENOM)
            final = step == max_steps - 1
            if sparse:
                msg_refs = self._wave(
                    lambda i: self.shards[i].sparse_signal.remote())
                results = ray.get(self._wave(
                    lambda i: self.shards[i].sparse_apply.remote(
                        msg_refs, step, final)))
            else:
                # dense-selective exchange (graph.hpp:1664-1689): each
                # shard publishes a packed skip bitmap of its owned
                # vertices; pull scans drop settled-dst rows entirely
                sel = ([s.selective_slice.remote() for s in self.shards]
                       if program.dense_selective else None)
                if self.n_parts == 1:
                    sig = [s.dense_signal.remote(sel) for s in self.shards]
                    results = [ray.get(
                        self.shards[0].dense_apply.remote(sig, step, final))]
                elif fused:
                    sig = self._wave(
                        lambda i: self.shards[i].dense_signal.remote(sel))
                    results = ray.get(self._wave(
                        lambda i: self.shards[i].dense_apply.remote(
                            sig, step, final, i)))
                else:
                    sig = self._wave(
                        lambda i: self.shards[i].dense_signal.options(
                            num_returns=self.n_parts).remote(sel))
                    results = ray.get(self._wave(
                        lambda i: self.shards[i].dense_apply.remote(
                            [sig[j][i] for j in range(self.n_parts)],
                            step, final)))
            activated = sum(r[0] for r in results)
            finish = [r[1] for r in results]
            stats = [(f["active"], f["active_out_deg"]) for f in finish]
            reducers: dict[str, float] = {}
            for f in finish:
                for k, v in f.items():
                    if k not in ("active", "active_out_deg"):
                        reducers[k] = reducers.get(k, 0.0) + v
            rec = {
                "step": step, "mode": "sparse" if sparse else "dense",
                "active_in": active, "active_edges": active_edges,
                "activated": activated,
                "active_out": sum(f["active"] for f in finish),
                "wall_s": time.perf_counter() - ts,
                "reducers": reducers,
                "per_part": [{"part": i, "active": f["active"]}
                             for i, f in enumerate(finish)],
            }
            steps.append(rec)
            if ckpt_dir is not None and (step % ckpt_every == 0 or final):
                parts = ray.get([s.save_state.remote(ckpt_dir, step)
                                 for s in self.shards])
                write_manifest(ckpt_dir, step, run_name, rec, parts, self.meta)
            step += 1
            if stop_reducer is not None and reducers.get(stop_reducer, 0.0) < stop_tol:
                break
            if stop_on_no_activation and activated == 0:
                break
            if rec["active_out"] == 0 and not program.static_frontier:
                break

        ray.get([s.finalize_run.remote() for s in self.shards])
        return {
            "run": run_name, "steps": steps, "n_steps": len(steps),
            "start_step": start_step,
            "n_edges": self.meta["n_edges"],
            "n_vertices": self.meta["n_vertices"],
            "wall_s": time.perf_counter() - t0,
        }

    # supersteps scheduled AHEAD of stop-condition evaluation in the
    # static-fused loop: keeps every shard's task queue non-empty so the
    # driver's per-step ray.get barrier + dispatch leaves the critical
    # path (Gemini's comm/comp overlap, graph.hpp:1560-1583, expressed
    # as actor-queue pipelining).  Shards snapshot post-step state for
    # the window, so a stop that lands late rolls the speculative steps
    # back — byte-identical results to the serial loop.
    STATIC_LOOKAHEAD = 3

    def _run_static_fused(self, program, start_step, max_steps,
                          stop_reducer, stop_tol, stop_on_no_activation,
                          ckpt_dir, ckpt_every, run_name,
                          fused: bool = True):
        """Superstep loop for static-frontier programs (always dense):
        each superstep is one `step_static` task per shard; the driver
        fetches only the small meta objects between steps.  With no
        checkpointing, up to STATIC_LOOKAHEAD supersteps are scheduled
        ahead (see above)."""
        if ckpt_dir is None:
            return self._run_static_pipelined(
                program, start_step, max_steps, stop_reducer, stop_tol,
                stop_on_no_activation, fused)
        P = self.n_parts
        # initial signal (superstep `start_step`)
        calls = self._wave(
            lambda i: self.shards[i].step_static.options(
                num_returns=2).remote(None, i, -1, False))
        pieces = [c[1] for c in calls]
        records = []
        step = start_step
        while step < max_steps:
            ts = time.perf_counter()
            final = step == max_steps - 1
            calls = self._wave(
                lambda i: self.shards[i].step_static.options(
                    num_returns=2).remote(pieces, i, step, final))
            meta = ray.get([c[0] for c in calls])
            pieces = [c[1] for c in calls]
            activated = sum(m[0] for m in meta)
            finish = [m[1] for m in meta]
            reducers: dict[str, float] = {}
            for f in finish:
                for k, v in f.items():
                    if k not in ("active", "active_out_deg"):
                        reducers[k] = reducers.get(k, 0.0) + v
            rec = {
                "step": step, "mode": "dense",
                "active_in": sum(f["active"] for f in finish),
                "activated": activated,
                "active_out": sum(f["active"] for f in finish),
                "wall_s": time.perf_counter() - ts,
                "reducers": reducers,
                "per_part": [{"part": i, "active": f["active"]}
                             for i, f in enumerate(finish)],
            }
            records.append(rec)
            if ckpt_dir is not None and (step % ckpt_every == 0 or final):
                parts = ray.get([s.save_state.remote(ckpt_dir, step)
                                 for s in self.shards])
                write_manifest(ckpt_dir, step, run_name, rec, parts, self.meta)
            step += 1
            if stop_reducer is not None and \
                    reducers.get(stop_reducer, 0.0) < stop_tol:
                break
            if stop_on_no_activation and activated == 0:
                break
        return records

    def _run_static_pipelined(self, program, start_step, max_steps,
                              stop_reducer, stop_tol,
                              stop_on_no_activation, fused: bool = True):
        """Lookahead variant of the static-fused loop: schedule up to
        STATIC_LOOKAHEAD supersteps before fetching metas.  Snapshots
        (only when a stop condition exists) make a late stop exact:
        shards roll back to the stopping step's state and the
        speculative records are discarded.  fused=False routes messages
        per owner (step_static_parts, num_returns) — consumers fetch
        only their slice, same plan as the generic dense loop."""
        from collections import deque

        P = self.n_parts
        W = self.STATIC_LOOKAHEAD
        has_stop = stop_reducer is not None or stop_on_no_activation
        snap = W + 2 if has_stop else 0
        if fused:
            calls = self._wave(
                lambda i: self.shards[i].step_static.options(
                    num_returns=2).remote(None, i, -1, False))
            pieces = [c[1] for c in calls]
        else:
            calls = self._wave(
                lambda i: self.shards[i].step_static_parts.options(
                    num_returns=1 + P).remote(None, -1, False))
            slices = [[calls[j][1 + i] for j in range(P)]
                      for i in range(P)]
        records = []
        inflight: deque = deque()
        next_step = start_step
        ts = time.perf_counter()
        while inflight or next_step < max_steps:
            while len(inflight) <= W and next_step < max_steps:
                step, final = next_step, next_step == max_steps - 1
                if fused:
                    calls = self._wave(
                        lambda i: self.shards[i].step_static.options(
                            num_returns=2).remote(pieces, i, step,
                                                  final, snap))
                    pieces = [c[1] for c in calls]
                else:
                    calls = self._wave(
                        lambda i:
                        self.shards[i].step_static_parts.options(
                            num_returns=1 + P).remote(slices[i], step,
                                                      final, snap))
                    slices = [[calls[j][1 + i] for j in range(P)]
                              for i in range(P)]
                inflight.append((step, [c[0] for c in calls]))
                next_step += 1
            step, mrefs = inflight.popleft()
            meta = ray.get(mrefs)
            activated = sum(m[0] for m in meta)
            finish = [m[1] for m in meta]
            reducers: dict[str, float] = {}
            for f in finish:
                for k, v in f.items():
                    if k not in ("active", "active_out_deg"):
                        reducers[k] = reducers.get(k, 0.0) + v
            now = time.perf_counter()
            records.append({
                "step": step, "mode": "dense",
                "active_in": sum(f["active"] for f in finish),
                "activated": activated,
                "active_out": sum(f["active"] for f in finish),
                "wall_s": now - ts,
                "reducers": reducers,
                "per_part": [{"part": i, "active": f["active"]}
                             for i, f in enumerate(finish)],
            })
            ts = now
            stop = ((stop_reducer is not None
                     and reducers.get(stop_reducer, 0.0) < stop_tol)
                    or (stop_on_no_activation and activated == 0))
            if stop:
                overran = bool(inflight)
                for _, mr in inflight:   # drain speculative supersteps
                    ray.get(mr)
                inflight.clear()
                if overran:
                    ray.get([s.rollback.remote(step)
                             for s in self.shards])
                break
        return records

    # ------------------------------------------------------------------

    def map_vertices(self, fn, reduce: str = "sum") -> float:
        """Reduce fn(ctx, state, active) over shards (process_vertices,
        graph.hpp:1406-1468; the driver-side reduce replaces Allreduce)."""
        parts = ray.get([s.map_vertices.remote(fn) for s in self.shards])
        return max(parts) if reduce == "max" else sum(parts)

    def state_dataset(self, columns: list[str]):
        """Vertex state as a Ray Dataset (v + columns), one block/shard."""
        import ray.data as rd

        refs = [s.state_table.remote(columns) for s in self.shards]
        return rd.from_arrow_refs(refs)

    def dump_vertex_array(self, columns: list[str], path: str) -> None:
        """Persist vertex state as partitioned parquet — the analog of
        Gemini's dump_vertex_array (graph.hpp:253-285): each shard's
        owned slice lands in its own file(s)."""
        self.state_dataset(columns).write_parquet(path, mode="overwrite")

    def restore_vertex_array(self, path: str, columns: list[str]) -> None:
        """Load state columns back into the shards (graph.hpp:288-306
        analog); each shard reads only its own [lo, hi) slice (parquet
        row-group predicate pushdown)."""
        ray.get([s.load_state_range.remote(path, columns)
                 for s in self.shards])

    def state_pandas(self, columns: list[str]):
        """Small-graph/test helper: full state on the driver, sorted by v."""
        import pyarrow as pa

        tables = ray.get([s.state_table.remote(columns) for s in self.shards])
        return pa.concat_tables(tables).to_pandas().sort_values("v").reset_index(
            drop=True)
