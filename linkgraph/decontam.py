"""Benchmark decontamination (training-data op, no reference analog —
design per the task brief): flag corpus documents that share any
word n-gram with a benchmark/eval document set, the standard
pre-training contamination check (word n-grams over lowercased
whitespace-split words; NGRAM_WORDS sets the default width).

Gram keys are 64-bit hashes — the per-word polynomial+avalanche hash
(text._batch_word_hashes) FNV-folded across the n-word window.  Like
the word-hash oracles, equivalence with the string-keyed SQL twin
holds up to 2^-64 collisions.

Scale shape: the benchmark side is small by definition — its distinct
gram hashes broadcast once (ray.put) and every corpus batch filters
with one searchsorted; above BENCH_GRAM_BROADCAST_CAP the pipeline
switches to the coarse-bucket join twin (union bench+corpus grams
bucketed on the gram hash, vectorized in-bucket membership, then one
coarse per-doc sum — never a per-gram-key hash aggregate).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .algos.triangles import n_buckets_for
from .text import _batch_word_hashes

# default gram width: real pipelines use 8-13; the synthetic corpus'
# small vocabulary needs 4 for cross-doc overlaps to exist at all
NGRAM_WORDS = 4
_FNV = np.uint64(1099511628211)

# distinct benchmark gram hashes up to this count ride the broadcast
# path (8 bytes each — 40MB at the cap); larger eval sets take the
# distributed coarse-bucket join
BENCH_GRAM_BROADCAST_CAP = 5_000_000


def doc_gram_hashes(texts: list, n: int = NGRAM_WORDS):
    """(doc_idx, gram_hash) of every word n-gram in the batch, distinct
    per doc, fully vectorized (one word-hash pass + n-1 fold rounds)."""
    word_doc, h, n_docs = _batch_word_hashes(texts)
    if len(h) < n:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    valid = word_doc[: len(word_doc) - n + 1] == word_doc[n - 1:]
    idx = np.flatnonzero(valid)
    if len(idx) == 0:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    g = h[idx].copy()
    with np.errstate(over="ignore"):
        for r in range(1, n):
            g = g * _FNV + h[idx + r]
    # distinct per doc: one lexsort + run dedup
    d = word_doc[idx]
    order = np.lexsort((g, d))
    d, g = d[order], g[order]
    keep = np.concatenate([[True], (d[1:] != d[:-1]) | (g[1:] != g[:-1])])
    return d[keep], g[keep]


def _gram_table(batch: pa.Table, n: int) -> pa.Table:
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    d, g = doc_gram_hashes(batch["text"].to_pylist(), n)
    return pa.table({"doc_id": pa.array(ids[d], pa.int64()),
                     "g": pa.array(g, pa.uint64())})


def contamination(docs_ds, bench_mod: int = 53, n: int = NGRAM_WORDS):
    """(doc_id, n_hits) for every non-benchmark document sharing >= 1
    word n-gram with the benchmark slice (doc_id % bench_mod == 0);
    n_hits = number of its DISTINCT grams found in the benchmark set."""
    import ray

    def keep(mod_zero: bool):
        def f(b: pa.Table) -> pa.Table:
            ids = b["doc_id"].to_numpy(zero_copy_only=False)
            m = (ids % bench_mod == 0) == mod_zero
            return b.filter(pa.array(m))
        return f

    bench_grams = docs_ds.map_batches(keep(True), batch_format="pyarrow") \
                         .map_batches(lambda b: _gram_table(b, n),
                                      batch_format="pyarrow") \
                         .materialize()
    n_bench = bench_grams.count()
    corpus = docs_ds.map_batches(keep(False), batch_format="pyarrow") \
                    .map_batches(lambda b: _gram_table(b, n),
                                 batch_format="pyarrow")

    if n_bench <= BENCH_GRAM_BROADCAST_CAP:
        bset = np.unique(np.concatenate(
            [t["g"].to_numpy(zero_copy_only=False)
             for t in bench_grams.iter_batches(batch_format="pyarrow",
                                               batch_size=None)] or
            [np.empty(0, np.uint64)]))
        bref = ray.put(bset)

        def hits(b: pa.Table) -> pa.Table:
            bs = ray.get(bref)
            g = b["g"].to_numpy(zero_copy_only=False)
            ids = b["doc_id"].to_numpy(zero_copy_only=False)
            if len(bs) == 0 or len(g) == 0:
                m = np.zeros(len(g), bool)
            else:
                p = np.minimum(np.searchsorted(bs, g), len(bs) - 1)
                m = bs[p] == g
            u, c = np.unique(ids[m], return_counts=True)
            return pa.table({"doc_id": pa.array(u, pa.int64()),
                             "n_hits": pa.array(c.astype(np.int64))})

        # grams are already distinct per doc and a doc lives in one row,
        # so per-batch hit counts are EXACT per doc — no reduce needed
        return corpus.map_batches(hits, batch_format="pyarrow")

    # distributed twin: coarse-bucket membership join on the gram hash,
    # then one coarse per-doc sum (same kernel shape as _vertex_degrees)
    corpus = corpus.materialize()
    nb = n_buckets_for(corpus.count() + n_bench)

    def tag(is_bench: bool):
        def f(b: pa.Table) -> pa.Table:
            g = b["g"].to_numpy(zero_copy_only=False)
            ids = (np.full(len(g), -1, np.int64) if is_bench
                   else b["doc_id"].to_numpy(zero_copy_only=False))
            return pa.table({"doc_id": pa.array(ids, pa.int64()),
                             "g": pa.array(g, pa.uint64()),
                             "gb": pa.array((g % np.uint64(nb))
                                            .astype(np.int64))})
        return f

    def bucket_hits(gdf: pd.DataFrame) -> pd.DataFrame:
        ids = gdf["doc_id"].to_numpy(np.int64)
        g = gdf["g"].to_numpy(np.uint64)
        is_b = ids < 0
        bs = np.unique(g[is_b])
        cg, cid = g[~is_b], ids[~is_b]
        if len(bs) == 0 or len(cg) == 0:
            return pd.DataFrame({"doc_id": np.empty(0, np.int64),
                                 "cnt": np.empty(0, np.int64)})
        p = np.minimum(np.searchsorted(bs, cg), len(bs) - 1)
        m = bs[p] == cg
        u, c = np.unique(cid[m], return_counts=True)
        return pd.DataFrame({"doc_id": u, "cnt": c.astype(np.int64)})

    both = corpus.map_batches(tag(False), batch_format="pyarrow").union(
        bench_grams.map_batches(tag(True), batch_format="pyarrow"))
    partial = both.groupby("gb").map_groups(bucket_hits,
                                            batch_format="pandas")
    nb2 = n_buckets_for(corpus.count())

    def dbucket(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        return b.append_column("db", pa.array((ids % nb2).astype(np.int64)))

    def merge(gdf: pd.DataFrame) -> pd.DataFrame:
        u, inv = np.unique(gdf["doc_id"].to_numpy(np.int64),
                           return_inverse=True)
        c = np.bincount(inv, weights=gdf["cnt"].to_numpy(np.float64),
                        minlength=len(u)).astype(np.int64)
        return pd.DataFrame({"doc_id": u, "n_hits": c})

    return partial.map_batches(dbucket, batch_format="pyarrow") \
                  .groupby("db").map_groups(merge, batch_format="pandas")
