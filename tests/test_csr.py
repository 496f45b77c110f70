"""Unit tests: CSR kernels vs brute force, partitioner invariants (SURVEY §5.1).

(scipy is unavailable in this container; oracles are naive python/numpy.)
"""

import numpy as np
import pytest

from linkgraph.csr import (
    build_compressed,
    combine_updates,
    expand_rows,
    rows_of,
    segment_reduce,
)
from linkgraph.partition import choose_offsets, gemini_alpha, part_of
from linkgraph.synth import micro_graph


@pytest.mark.parametrize("name", ["path_8", "cycle_5", "star_1_50",
                                  "two_cliques_k5", "multi_edge", "er_1k"])
def test_build_compressed_vs_scipy(name):
    e = micro_graph(name)
    n = int(e.max()) + 1
    cr = build_compressed(e[:, 0], e[:, 1])
    assert n >= 1
    # per-row neighbor multisets match brute force; empty rows are skipped
    for k, v in enumerate(cr.row_vertex):
        ours = cr.indices[cr.indptr[k]:cr.indptr[k + 1]]
        theirs = e[e[:, 0] == v][:, 1]
        assert sorted(ours) == sorted(theirs)
    assert set(cr.row_vertex) == set(np.unique(e[:, 0]))
    assert cr.n_edges == len(e)
    # determinism under permutation
    rng = np.random.default_rng(0)
    p = rng.permutation(len(e))
    cr2 = build_compressed(e[p, 0], e[p, 1])
    assert np.array_equal(cr.row_vertex, cr2.row_vertex)
    assert np.array_equal(cr.indices, cr2.indices)


def test_weights_follow_sort():
    src = np.array([2, 0, 2, 1])
    dst = np.array([1, 5, 0, 3])
    w = np.array([20.1, 5.0, 20.0, 13.0])
    cr = build_compressed(src, dst, w)
    assert np.array_equal(cr.row_vertex, [0, 1, 2])
    assert np.array_equal(cr.indices, [5, 3, 0, 1])
    assert np.allclose(cr.weights, [5.0, 13.0, 20.0, 20.1])


def test_rows_of_and_expand():
    e = micro_graph("star_1_50")  # 0 -> 1..50
    cr = build_compressed(e[:, 0], e[:, 1])
    pos, present = rows_of(cr, np.array([0, 7, 99]))
    assert present.tolist() == [True, False, False]
    edge_idx, row_rep = expand_rows(cr, pos[present])
    assert len(edge_idx) == 50
    assert np.array_equal(cr.indices[edge_idx], np.arange(1, 51))
    assert np.array_equal(row_rep, np.zeros(50))
    # empty request
    ei, rr = expand_rows(cr, np.empty(0, dtype=np.int64))
    assert len(ei) == 0 and len(rr) == 0


def test_segment_reduce_masked():
    vals = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    indptr = np.array([0, 2, 2, 5])
    assert np.allclose(segment_reduce(vals, indptr, "add"), [3.0, 0.0, 12.0])
    mask = np.array([True, False, True, True, False])
    assert np.allclose(segment_reduce(vals, indptr, "add", mask), [1.0, 0.0, 7.0])
    assert np.allclose(segment_reduce(vals, indptr, "min", mask),
                       [1.0, np.inf, 3.0])


def test_combine_updates():
    d = np.array([3, 1, 3, 1, 7])
    v = np.array([1.0, 5.0, 2.0, 4.0, 9.0])
    u, a = combine_updates(d, v, "add")
    assert np.array_equal(u, [1, 3, 7])
    assert np.allclose(a, [9.0, 3.0, 9.0])
    u, a = combine_updates(d, v, "min")
    assert np.allclose(a, [4.0, 1.0, 9.0])
    u, a = combine_updates(np.empty(0, np.int64), np.empty(0), "add")
    assert len(u) == 0


def test_choose_offsets_balance_and_invariants():
    rng = np.random.default_rng(1)
    n_vertices, n_buckets, P = 100_000, 512, 8
    sums = rng.integers(0, 1000, n_buckets).astype(np.int64)
    off = choose_offsets(sums, n_vertices, P, alpha=gemini_alpha(P))
    assert off[0] == 0 and off[-1] == n_vertices
    assert np.all(np.diff(off) >= 0)
    widths = np.diff(off)
    assert np.all(widths > 0)  # no empty partition with ample buckets
    # skewed: one hot bucket should not blow balance beyond its own cost
    sums2 = np.zeros(n_buckets, dtype=np.int64)
    sums2[3] = 10_000_000
    off2 = choose_offsets(sums2, n_vertices, P, alpha=0)
    # hot bucket isolated into an early partition; rest split remaining
    assert off2[-1] == n_vertices and np.all(np.diff(off2) >= 0)


def test_part_of_routing():
    off = np.array([0, 10, 20, 35], dtype=np.int64)
    v = np.array([0, 9, 10, 19, 20, 34])
    assert part_of(v, off).tolist() == [0, 0, 1, 1, 2, 2]


def test_choose_offsets_tiny_graph_no_collapse():
    # reference quirk NOT copied: |V| < 4096*P must still give usable ranges
    off = choose_offsets(np.array([5, 5, 5, 5], dtype=np.int64), 17, 4, alpha=8)
    assert off[0] == 0 and off[-1] == 17 and np.all(np.diff(off) >= 0)


def test_segment_reduce_and_combine_updates_max():
    from linkgraph.csr import combine_updates, segment_reduce

    vals = np.array([3, 1, 4, 1, 5, 9, 2], np.int64)
    indptr = np.array([0, 2, 2, 5, 7], np.int64)
    out = segment_reduce(vals, indptr, "max")
    assert out[0] == 3 and out[2] == 5 and out[3] == 9
    assert out[1] == np.iinfo(np.int64).min  # empty segment identity

    mask = np.array([True, True, False, True, True, True, True])
    outm = segment_reduce(vals, indptr, "max", mask)
    assert outm[2] == 5 and outm[0] == 3

    dst = np.array([2, 0, 2, 2, 0], np.int64)
    v = np.array([7, 1, 9, 3, 2], np.int64)
    uniq, agg = combine_updates(dst, v, "max")
    assert list(uniq) == [0, 2] and list(agg) == [2, 9]
