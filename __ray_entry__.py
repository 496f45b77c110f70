"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).  Results may be a ``ray.data.Dataset``, a
``pandas.DataFrame`` or a ``pyarrow.Table``; the driver converts.

Ray is initialised by the driver BEFORE this module is imported: neither
this module nor the linkgraph library calls ``ray.init()`` /
``ray.shutdown()``.

Query inventory: linkgraph.pipelines (one entry per operator family from
SURVEY.md §2 + the training-data additions).  EVERY query has a SQL
oracle — including the probabilistic/approximate family: the
MinHash/SimHash index arithmetic is deterministic uint64 math
reproduced exactly in DuckDB HUGEINT (pipelines._minhash_sql /
_simhash_sql), the sign-LSH and IVF ANN paths re-derive their
hyperplanes / unrolled k-means centroids from the same seeds
(_ann_lsh_sql / _ann_ivf_sql), the media stub-decode lanes are
sha256-derived in SQL, and the iterative trainers (BPE merges,
unigram-LM Viterbi EM, k-means, Louvain/Leiden, percolation CC) are
unrolled CTE chains — 343 queries, 343 oracles as of round 5.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: documents link graph
    -> 20-iteration Gemini-convention PageRank -> (v, rank) Dataset."""
    from linkgraph.pipelines import q_doc_pagerank

    return q_doc_pagerank("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from linkgraph.pipelines import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from linkgraph.pipelines import ORACLE_SQL

    return dict(ORACLE_SQL)
