"""as-of join and range-aggregate join (linkgraph/joins.py): tie
breaks, boundary inclusivity, key isolation, schema guards."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from linkgraph.joins import asof_join, range_agg_join


def _ts(us_list):
    return pa.array(np.array(us_list, dtype="datetime64[us]"))


def _mk(ids, users, us, vals=None):
    cols = {"event_id": pa.array(ids, pa.int64()),
            "user_id": pa.array(users, pa.int64()),
            "ts": _ts(us)}
    if vals is not None:
        cols["value"] = pa.array(vals, pa.float64())
    return rd.from_arrow(pa.table(cols))


def test_asof_backward_inclusive_and_ties():
    # user 1: right rows at t=10 (ids 100, 101 — tie -> max id wins),
    # t=30; left at t=10 (exact match inclusive), t=25, t=5 (no match)
    left = _mk([1, 2, 3], [1, 1, 1], [10, 25, 5])
    right = _mk([100, 101, 102], [1, 1, 1], [10, 10, 30],
                [1.0, 2.0, 3.0])
    out = asof_join(left, right, key="user_id", ts="ts",
                    left_cols=["event_id"],
                    right_cols={"event_id": "match_id",
                                "value": "match_value"},
                    tie_col="event_id").to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    assert out.loc[0, "match_id"] == 101  # exact ts, tie -> largest id
    assert out.loc[0, "match_value"] == 2.0
    assert out.loc[1, "match_id"] == 101  # t=25 sees t=10, not t=30
    assert np.isnan(out.loc[2, "match_id"])  # t=5 precedes everything


def test_asof_keys_isolated():
    left = _mk([1, 2], [1, 2], [50, 50])
    right = _mk([100, 200], [1, 2], [10, 20], [1.0, 2.0])
    out = asof_join(left, right, key="user_id", ts="ts",
                    left_cols=["event_id"],
                    right_cols={"event_id": "match_id",
                                "value": "match_value"}).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    assert out["match_id"].tolist() == [100, 200]  # never cross-user


def test_asof_rejects_shared_payload_names():
    left = _mk([1], [1], [10])
    right = _mk([2], [1], [5], [1.0])
    with pytest.raises(ValueError, match="disjoint"):
        asof_join(left, right, key="user_id", ts="ts",
                  left_cols=["event_id"],
                  right_cols={"event_id": "event_id"})


def test_range_agg_boundaries_inclusive():
    # window = 10us trailing; left at t=20 must include right rows at
    # t=10 (lower bound) and t=20 (upper bound), exclude t=9 and t=21
    left = _mk([1], [7], [20])
    right = _mk([0, 0, 0, 0], [7, 7, 7, 7], [9, 10, 20, 21],
                [100.0, 1.0, 2.0, 100.0])
    out = range_agg_join(left, right, key="user_id", ts="ts",
                         left_cols=["event_id"], value_col="value",
                         window_us=10).to_pandas()
    assert out.loc[0, "n_matches"] == 2
    assert out.loc[0, "sum_value"] == 3.0


def test_range_agg_zero_matches_and_isolation():
    left = _mk([1, 2], [1, 2], [100, 100])
    right = _mk([0], [1], [50], [5.0])  # outside user-1 window; user 2 none
    out = range_agg_join(left, right, key="user_id", ts="ts",
                         left_cols=["event_id"], value_col="value",
                         window_us=10).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    assert out["n_matches"].tolist() == [0, 0]
    assert out["sum_value"].tolist() == [0.0, 0.0]


def test_range_agg_matches_pandas_oracle():
    rng = np.random.default_rng(5)
    n_l, n_r = 300, 800
    lus = rng.integers(0, 12, n_l)
    rus = rng.integers(0, 12, n_r)
    lts = rng.integers(0, 10_000, n_l)
    rts = rng.integers(0, 10_000, n_r)
    vals = rng.random(n_r).round(3)
    w = 500
    left = _mk(np.arange(n_l), lus, np.sort(lts) * 0 + lts)
    right = _mk(np.zeros(n_r, np.int64), rus, rts, vals)
    out = range_agg_join(left, right, key="user_id", ts="ts",
                         left_cols=["event_id"], value_col="value",
                         window_us=w).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    for i in [0, 17, 123, 299]:
        m = (rus == lus[i]) & (rts >= lts[i] - w) & (rts <= lts[i])
        assert out.loc[i, "n_matches"] == int(m.sum())
        assert abs(out.loc[i, "sum_value"] - vals[m].sum()) < 1e-9


# ----------------------------------------------------- semi / anti join

def _semi_fixture():
    rng = np.random.default_rng(7)
    left = rd.from_arrow(pa.table({
        "k": pa.array(rng.integers(0, 200, 500), pa.int64()),
        "payload": pa.array(rng.normal(size=500))}))
    right = rd.from_arrow(pa.table({
        "k": pa.array(rng.integers(100, 300, 300), pa.int64()),
        "other": pa.array(rng.integers(0, 9, 300), pa.int64())}))
    return left, right


def test_semi_anti_partition_left_exactly():
    from linkgraph.joins import anti_join, semi_join

    left, right = _semi_fixture()
    lp = left.to_pandas()
    rk = set(right.to_pandas()["k"])
    semi = semi_join(left, right, "k").to_pandas()
    anti = anti_join(left, right, "k").to_pandas()
    assert len(semi) + len(anti) == len(lp)
    assert set(semi.columns) == set(lp.columns) == set(anti.columns)
    assert semi["k"].isin(rk).all()
    assert not anti["k"].isin(rk).any()
    # exact row multiset: every left row lands on exactly one side
    key = lambda df: sorted(map(tuple, df[["k", "payload"]].to_numpy()))
    assert key(pd.concat([semi, anti])) == key(lp)


def test_semi_anti_plans_equal(monkeypatch):
    """Broadcast plan == distributed coarse-bucket plan."""
    import linkgraph.joins as joins_mod

    left, right = _semi_fixture()
    outs = {}
    for plan, cap in (("bcast", 10 ** 9), ("dist", 0)):
        monkeypatch.setattr(joins_mod, "SEMI_BROADCAST_CAP", cap)
        outs[plan] = {
            kind: fn(left, right, "k").to_pandas()
            .sort_values(["k", "payload"]).reset_index(drop=True)
            for kind, fn in (("semi", joins_mod.semi_join),
                             ("anti", joins_mod.anti_join))}
    for kind in ("semi", "anti"):
        pd.testing.assert_frame_equal(outs["bcast"][kind],
                                      outs["dist"][kind])


def test_semi_anti_string_keys_and_empty_right():
    from linkgraph.joins import anti_join, semi_join

    left = rd.from_arrow(pa.table({
        "k": pa.array(["a", "b", "c", "a"]),
        "x": pa.array([1, 2, 3, 4], pa.int64())}))
    right = rd.from_arrow(pa.table({"k": pa.array(["a", "z"])}))
    semi = semi_join(left, right, "k").to_pandas()
    assert sorted(semi["x"]) == [1, 4]
    anti = anti_join(left, right, "k").to_pandas()
    assert sorted(anti["x"]) == [2, 3]
    empty = rd.from_arrow(pa.table({"k": pa.array([], pa.string())}))
    assert semi_join(left, empty, "k").count() == 0
    assert anti_join(left, empty, "k").count() == 4


def test_attach_by_key_paths_equal(monkeypatch):
    """Gated lookup join: broadcast path == bucketed co-group path,
    multiple probe columns, int keys."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    import linkgraph.joins as J

    rng = np.random.default_rng(4)
    keys = np.arange(50, dtype=np.int64) * 3
    vals = rng.integers(0, 7, 50).astype(np.int64)
    mp = pa.table({"v": pa.array(keys), "label": pa.array(vals)})
    s = keys[rng.integers(0, 50, 300)]
    d = keys[rng.integers(0, 50, 300)]
    probe = pa.table({"src": pa.array(s), "dst": pa.array(d)})

    def norm(ds):
        return ds.to_pandas().sort_values(["src", "dst"]) \
            .reset_index(drop=True)

    a = norm(J.attach_by_key(rd.from_arrow(probe), rd.from_arrow(mp),
                             ["src", "dst"], key="v", value="label"))
    monkeypatch.setattr(J, "ATTACH_BROADCAST_CAP", -1)
    b = norm(J.attach_by_key(rd.from_arrow(probe), rd.from_arrow(mp),
                             ["src", "dst"], key="v", value="label"))
    lut = dict(zip(keys.tolist(), vals.tolist()))
    want_src = a["src"].map(lut)
    assert (a["label_src"] == want_src).all()
    assert (a["label_dst"] == a["dst"].map(lut)).all()
    pd.testing.assert_frame_equal(
        a, b[a.columns.tolist()].sort_values(["src", "dst"])
        .reset_index(drop=True), check_like=True)


def test_attach_by_key_missing_self_paths_equal(monkeypatch):
    """missing="self": probe keys absent from the map keep themselves,
    identically on the broadcast and bucketed plans."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    import linkgraph.joins as J

    rng = np.random.default_rng(11)
    keys = (np.arange(20, dtype=np.int64) * 5 + 1)
    vals = rng.integers(100, 200, 20).astype(np.int64)
    mp = pa.table({"v": pa.array(keys), "label": pa.array(vals)})
    p = rng.integers(0, 110, 400).astype(np.int64)  # mostly unmapped
    probe = pa.table({"id": pa.array(p)})

    def norm(ds):
        return ds.to_pandas().sort_values(["id", "label_id"]) \
            .reset_index(drop=True)

    a = norm(J.attach_by_key(rd.from_arrow(probe), rd.from_arrow(mp),
                             ["id"], key="v", value="label",
                             missing="self"))
    monkeypatch.setattr(J, "ATTACH_BROADCAST_CAP", -1)
    b = norm(J.attach_by_key(rd.from_arrow(probe), rd.from_arrow(mp),
                             ["id"], key="v", value="label",
                             missing="self"))
    lut = dict(zip(keys.tolist(), vals.tolist()))
    want = a["id"].map(lambda x: lut.get(x, x))
    assert (a["label_id"] == want).all()
    pd.testing.assert_frame_equal(a, b)


def test_table_diff_statuses(ray_session):
    import numpy as np
    import pandas as pd
    import pytest

    from linkgraph.io import from_pandas_clean
    from linkgraph.joins import table_diff

    left = pd.DataFrame({"k": np.array([1, 2, 3, 4], np.int64),
                         "v": ["a", "b", "c", "d"]})
    right = pd.DataFrame({"k": np.array([2, 3, 5], np.int64),
                          "v": ["b", "CHANGED", "e"]})
    out = (table_diff(from_pandas_clean(left), from_pandas_clean(right),
                      key="k", value="v")
           .to_pandas().sort_values("k").reset_index(drop=True))
    want = pd.DataFrame({
        "k": np.array([1, 2, 3, 4, 5], np.int64),
        "status": ["removed", "unchanged", "changed", "removed",
                   "added"]})
    pd.testing.assert_frame_equal(out, want)

    dup = pd.DataFrame({"k": np.array([1, 1], np.int64),
                        "v": ["x", "y"]})
    with pytest.raises(Exception, match="duplicate key"):
        table_diff(from_pandas_clean(dup), from_pandas_clean(right),
                   key="k", value="v").to_pandas()


def test_bloom_semi_join_equals_semi_join(monkeypatch):
    """Bloom prefilter + exact verify == plain semi_join, on both the
    broadcast and the forced-distributed verify plans, int and string
    keys, including a tiny bitmap (high fp rate -> verify must drop)."""
    import linkgraph.joins as joins_mod
    from linkgraph.joins import bloom_semi_join, semi_join

    left, right = _semi_fixture()
    want = semi_join(left, right, "k").to_pandas() \
        .sort_values(["k", "payload"]).reset_index(drop=True)
    for cap in (10 ** 9, 0):          # broadcast vs distributed verify
        for m_bits in (None, 256):    # sized vs saturated bitmap
            got = bloom_semi_join(left, right, "k", m_bits=m_bits,
                                  broadcast_cap=cap).to_pandas() \
                .sort_values(["k", "payload"]).reset_index(drop=True)
            pd.testing.assert_frame_equal(got, want)

    sleft = rd.from_arrow(pa.table({
        "k": pa.array(["a", "b", "c", "d", "a"], pa.string()),
        "payload": pa.array([1.0, 2.0, 3.0, 4.0, 5.0])}))
    sright = rd.from_arrow(pa.table({"k": pa.array(["a", "c", "x"])}))
    got = bloom_semi_join(sleft, sright, "k").to_pandas() \
        .sort_values(["k", "payload"]).reset_index(drop=True)
    assert list(got["k"]) == ["a", "a", "c"]

    empty = rd.from_arrow(pa.table({"k": pa.array([], pa.string())}))
    assert bloom_semi_join(sleft, empty, "k").count() == 0


def test_counted_single_execution(tmp_path):
    """runtime.counted materializes once: a lineage instrumented to drop
    a marker file per map invocation runs exactly once despite the gate
    count AND a downstream consume (the diamond-lineage rule)."""
    import glob
    import os
    import uuid

    from linkgraph.runtime import counted

    mark = str(tmp_path / f"exec-{uuid.uuid4().hex}")
    os.makedirs(mark, exist_ok=True)

    def spy(b: pa.Table) -> pa.Table:
        with open(os.path.join(mark, uuid.uuid4().hex), "w"):
            pass
        return b

    ds = rd.from_arrow(pa.table({"k": pa.array([1, 2, 3], pa.int64())}))
    ds = ds.repartition(1).map_batches(spy, batch_format="pyarrow")
    m, n = counted(ds)
    assert n == 3
    assert m.count() == 3                      # metadata, no re-execute
    assert m.to_pandas()["k"].tolist() == [1, 2, 3]
    assert len(glob.glob(os.path.join(mark, "*"))) == 1


def test_semi_join_executes_right_once(tmp_path):
    """The size-gate in _key_filter_join must not re-execute the right
    lineage for its count (VERDICT r4 minor #1)."""
    import glob
    import os
    import uuid

    from linkgraph.joins import semi_join

    mark = str(tmp_path / f"right-{uuid.uuid4().hex}")
    os.makedirs(mark, exist_ok=True)

    def spy(b: pa.Table) -> pa.Table:
        with open(os.path.join(mark, uuid.uuid4().hex), "w"):
            pass
        return b

    left = rd.from_arrow(pa.table({"k": pa.array([1, 2, 5], pa.int64()),
                                   "x": pa.array([10, 20, 50],
                                                 pa.int64())}))
    right = rd.from_arrow(pa.table({"k": pa.array([2, 5], pa.int64())})) \
        .repartition(1).map_batches(spy, batch_format="pyarrow")
    out = semi_join(left, right, "k").to_pandas().sort_values("k")
    assert out["k"].tolist() == [2, 5]
    assert len(glob.glob(os.path.join(mark, "*"))) == 1
