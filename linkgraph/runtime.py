"""Process-level Ray Data tuning for linkgraph pipelines.

Ray's hash-shuffle operators (join, hash aggregate) spin one aggregator
ACTOR per partition at 1 CPU each and wait up to
``min_hash_shuffle_aggregator_wait_time_in_s`` (default 300s!) for the
pool to schedule.  On small-CPU sessions, a 16-partition join therefore
stalls for minutes (observed: every doc-graph query blocked ~5 min at 8
CPUs).  Fractional per-partition CPU reservations keep the pools
schedulable; shuffles are short-lived waves, so oversubscription is
harmless here — the same reasoning as GraphShard's num_cpus=0
(linkgraph/engine.py).

Idempotent; called from the library's pipeline entry points.
"""

from __future__ import annotations

_DONE = False


def tune_context() -> None:
    global _DONE
    if _DONE:
        return
    from ray.data import DataContext

    ctx = DataContext.get_current()
    for attr in ("hash_shuffle_operator_actor_num_cpus_per_partition_override",
                 "hash_aggregate_operator_actor_num_cpus_per_partition_override"):
        if hasattr(ctx, attr):
            setattr(ctx, attr, 0.125)
    if hasattr(ctx, "min_hash_shuffle_aggregator_wait_time_in_s"):
        ctx.min_hash_shuffle_aggregator_wait_time_in_s = 30
    _DONE = True


def pool_size(requested: int) -> int:
    """Actor-pool concurrency with CPU headroom: a pool that reserves
    every session CPU starves the upstream read/map tasks and deadlocks
    the streaming executor (observed: langid actor pool at concurrency=4
    on a 4-CPU pytest session).  Clamp to cpus-1, floor 1."""
    import ray

    if not ray.is_initialized():
        return max(1, requested)
    cpus = int(ray.cluster_resources().get("CPU", requested + 1))
    return max(1, min(requested, cpus - 1))


def counted(ds):
    """(materialized_ds, n_rows) — the one blessed way to size-gate.

    ``ds.count()`` on an un-executed Dataset runs the whole lineage and
    throws the blocks away; consuming the same ``ds`` again afterwards
    re-executes it (the diamond-lineage rule, CLAUDE.md).  Materialize
    ONCE, read the row count from block metadata (free), and hand back
    the materialized node so every gate site pays a single execution."""
    m = ds.materialize()
    return m, m.count()
