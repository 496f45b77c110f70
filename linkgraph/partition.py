"""Degree-aware contiguous vertex-range partitioner.

Reproduces the *policy* of Gemini's chunk-based partitioning
(/root/reference/core/graph.hpp:823-846): vertices are split into
`num_partitions` contiguous ranges `[offset[i], offset[i+1])` balancing
the cost `sum(out_degree[v] + alpha)` with `alpha = 8*(partitions-1)`
(graph.hpp:213).  Contiguous ranges are what keep per-shard vertex state
dense (`value[v - lo]` numpy indexing) and make vertex->owner routing a
single vectorized `searchsorted`.

Scale design: the driver never materializes an |V|-sized array.  Degrees
are summed into `n_buckets` fixed-width contiguous vertex buckets with a
distributed `groupby(bucket).sum()` (combiner pushdown); only the
O(n_buckets) bucket table reaches the driver, where boundaries are chosen
at bucket granularity by the same greedy expected-cost rule Gemini uses
(graph.hpp:826-846: remaining_amount / remaining_partitions).  We do NOT
copy the reference's page-aligned truncation (graph.hpp:841) — it
collapses partitions for |V| < 4096*P (SURVEY.md §4 quirks).
"""

from __future__ import annotations

import numpy as np


def gemini_alpha(num_partitions: int) -> int:
    """Gemini's balance smoothing factor, alpha = 8*(P-1) (graph.hpp:213)."""
    return 8 * (num_partitions - 1)


def bucket_degree_sums(degree_ds, n_vertices: int, n_buckets: int,
                       degree_col: str = "degree") -> np.ndarray:
    """Distributed: (v, degree) dataset -> dense per-bucket degree sums.

    Buckets are fixed-width contiguous vertex ranges; the groupby ships one
    row per (block, bucket) thanks to partial aggregation, so the driver
    sees O(n_buckets) rows regardless of |V|.
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    width = max(1, -(-n_vertices // n_buckets))  # ceil

    def add_bucket(b: pa.Table) -> pa.Table:
        bk = pc.divide(pc.cast(b["v"], pa.int64()), pa.scalar(width, pa.int64()))
        return pa.table({"bucket": bk, degree_col: b[degree_col]})

    rows = (
        degree_ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum(degree_col, alias_name="deg_sum"))
        .to_pandas()
    )
    n_buckets_real = -(-n_vertices // width)
    sums = np.zeros(n_buckets_real, dtype=np.int64)
    if len(rows):
        sums[rows["bucket"].to_numpy(dtype=np.int64)] = rows["deg_sum"].to_numpy(
            dtype=np.int64
        )
    return sums


def choose_offsets(bucket_sums: np.ndarray, n_vertices: int,
                   num_partitions: int, alpha: int | None = None) -> np.ndarray:
    """Greedy expected-cost boundary choice at bucket granularity.

    Walk buckets accumulating cost = deg_sum + alpha*bucket_width; close
    partition i when its cost reaches remaining_total/remaining_partitions
    (Gemini's rule, graph.hpp:826-846).  Returns int64 offsets, length
    num_partitions+1, offsets[0]=0, offsets[-1]=n_vertices.
    """
    if alpha is None:
        alpha = gemini_alpha(num_partitions)
    if n_vertices == 0:
        return np.zeros(num_partitions + 1, dtype=np.int64)
    n_buckets = len(bucket_sums)
    width = -(-n_vertices // n_buckets)
    # cost per bucket: degrees + alpha per actual vertex in the bucket
    counts = np.full(n_buckets, width, dtype=np.int64)
    counts[-1] = n_vertices - width * (n_buckets - 1)
    cost = bucket_sums + alpha * counts
    total = int(cost.sum())

    offsets = np.zeros(num_partitions + 1, dtype=np.int64)
    b = 0
    remaining = total
    for p in range(num_partitions):
        parts_left = num_partitions - p
        expected = remaining / parts_left
        acc = 0
        while b < n_buckets and parts_left < n_buckets - b + 1 and (
            acc == 0 or acc + cost[b] / 2 < expected
        ):
            # take bucket b into partition p; keep at least one bucket per
            # remaining partition so no partition is empty when buckets allow
            acc += int(cost[b])
            b += 1
        remaining -= acc
        offsets[p + 1] = min(b * width, n_vertices)
    offsets[num_partitions] = n_vertices
    return offsets


def partition_offsets(degree_ds, n_vertices: int, num_partitions: int,
                      alpha: int | None = None,
                      buckets_per_partition: int = 64) -> np.ndarray:
    """Full pipeline: degree dataset -> partition offsets (driver: O(buckets))."""
    n_buckets = max(num_partitions * buckets_per_partition, num_partitions)
    n_buckets = min(n_buckets, max(1, n_vertices))
    sums = bucket_degree_sums(degree_ds, n_vertices, n_buckets)
    return choose_offsets(sums, n_vertices, num_partitions, alpha)


def partition_offsets_from_edges(edges_ds, n_vertices: int,
                                 num_partitions: int,
                                 alpha: int | None = None,
                                 buckets_per_partition: int = 64,
                                 src_col: str = "src",
                                 with_count: bool = False):
    """Shuffle-free offsets straight from the edge table.

    The partitioner only needs degree SUMS per fixed-width vertex bucket,
    never per-vertex degrees — so skip the groupby entirely: each edge
    batch bincounts `src // width` into a dense O(n_buckets) partial
    (map-only, combiner done inside the batch), the driver sums the tiny
    partials.  Replaces two chained hash-shuffle aggregates that cost 14s
    of fixed overhead on a 2M-edge store build (BENCH round 2)."""
    import pyarrow as pa

    n_buckets = max(num_partitions * buckets_per_partition, num_partitions)
    n_buckets = min(n_buckets, max(1, n_vertices))
    width = max(1, -(-n_vertices // n_buckets))
    n_real = -(-n_vertices // width)

    def partial(b: pa.Table) -> pa.Table:
        src = b[src_col].to_numpy(zero_copy_only=False)
        counts = np.bincount(src // width, minlength=n_real)
        return pa.table({"bucket": pa.array(np.arange(n_real, dtype=np.int64)),
                         "deg_sum": pa.array(counts.astype(np.int64))})

    rows = edges_ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    sums = np.zeros(n_real, dtype=np.int64)
    np.add.at(sums, rows["bucket"].to_numpy(), rows["deg_sum"].to_numpy())
    offsets = choose_offsets(sums, n_vertices, num_partitions, alpha)
    if with_count:
        # the bucket sums ARE the edge count — callers get |E| from this
        # pass for free instead of a separate count() execution
        return offsets, int(sums.sum())
    return offsets


def part_of(v: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Vectorized vertex -> owning partition (Gemini get_partition_id,
    graph.hpp:330-338, as one searchsorted)."""
    return np.searchsorted(offsets, v, side="right").astype(np.int64) - 1
