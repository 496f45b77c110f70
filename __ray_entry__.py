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
SURVEY.md §2 + the training-data additions).  The only key present in
``queries()`` but absent from ``oracle_sql()`` is ``ann_ivf`` (k-means
centroid training is the one genuinely-iterative float pipeline not
reproduced in SQL; its recall vs the exact ``ann_topk`` is pytest-
checked instead).  The whole near-dup family IS oracle-checked: the
MinHash/SimHash index arithmetic is deterministic uint64 math that the
oracles reproduce exactly in DuckDB HUGEINT (pipelines._minhash_sql /
_simhash_sql); the media stub-decode pipeline likewise (sha256-derived
lanes reproduced in SQL).
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
