"""quota_sample: determinism, quota enforcement, and driver-path ==
distributed-path equality (the size-gated plan invariant)."""

import hashlib

import numpy as np
import pandas as pd
import pytest

from linkgraph.io import from_pandas_clean
from linkgraph.sampling import quota_sample


def _docs(n=200, groups=7, seed=3):
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "k": [f"g{g}" for g in rng.integers(0, groups, n)],
    })


def _oracle(pdf, n):
    pdf = pdf.copy()
    pdf["_pri"] = [hashlib.sha256(str(v).encode()).hexdigest()
                   for v in pdf["doc_id"]]
    pdf = pdf.sort_values(["_pri", "doc_id"], kind="mergesort")
    out = pdf.groupby("k", sort=False).head(n)[["doc_id", "k"]]
    return out.sort_values(["k", "doc_id"]).reset_index(drop=True)


def test_quota_sample_matches_oracle_and_caps():
    pdf = _docs()
    ds = from_pandas_clean(pdf).repartition(5)
    got = quota_sample(ds, key="k", id_col="doc_id", n=4)
    want = _oracle(pdf, 4)
    pd.testing.assert_frame_equal(got, want)
    assert (got.groupby("k").size() <= 4).all()


def test_quota_sample_driver_equals_distributed():
    pdf = _docs(n=300, groups=5)
    ds = from_pandas_clean(pdf).repartition(6)
    a = quota_sample(ds, key="k", id_col="doc_id", n=3)
    b = quota_sample(from_pandas_clean(pdf).repartition(6),
                     key="k", id_col="doc_id", n=3, driver_cap=0)
    pd.testing.assert_frame_equal(a, b)


def test_quota_sample_partition_invariance():
    pdf = _docs(n=150, groups=4, seed=9)
    outs = [quota_sample(from_pandas_clean(pdf).repartition(p),
                         key="k", id_col="doc_id", n=2)
            for p in (1, 3, 8)]
    pd.testing.assert_frame_equal(outs[0], outs[1])
    pd.testing.assert_frame_equal(outs[0], outs[2])
