"""Store build resumability + vertex-array dump/restore parity
(reference: dump/restore_vertex_array, graph.hpp:253-306)."""

import numpy as np

from linkgraph.algos import pagerank
from linkgraph.edges import edges_from_arrays
from linkgraph.graph import load_directed
from linkgraph.store import build_graph_store, load_meta
from linkgraph.synth import micro_graph


def test_store_build_is_resumable(tmp_path):
    e = micro_graph("er_1k")
    n = int(e.max()) + 1
    ds = edges_from_arrays(e[:, 0], e[:, 1])
    meta1 = build_graph_store(ds, n, 3, str(tmp_path / "s"),
                              persist=True)
    assert meta1["complete"] and meta1["n_edges"] == len(e)
    # second build with a complete meta returns WITHOUT recomputation
    # (pass a poisoned dataset: it would throw if consumed)
    poisoned = ds.map_batches(lambda b: 1 / 0, batch_format="pyarrow")
    meta2 = build_graph_store(poisoned, n, 3, str(tmp_path / "s"),
                              persist=True)
    assert meta2 == meta1
    assert load_meta(str(tmp_path / "s")) == meta1


def test_dump_restore_vertex_array(tmp_path):
    e = micro_graph("powerlaw_1k")
    n = int(e.max()) + 1
    eng = load_directed(edges_from_arrays(e[:, 0], e[:, 1]), n,
                        num_partitions=3, store_dir=str(tmp_path / "g"))
    try:
        pagerank(eng, iterations=4)
        before = eng.state_pandas(["rank"])["rank"].to_numpy()
        eng.dump_vertex_array(["rank"], str(tmp_path / "dump"))
        # clobber state, then restore
        eng.map_vertices(lambda ctx, state, active:
                         state["rank"].fill(-1.0) or 0.0)
        eng.restore_vertex_array(str(tmp_path / "dump"), ["rank"])
        after = eng.state_pandas(["rank"])["rank"].to_numpy()
        assert np.array_equal(before, after)
    finally:
        eng.shutdown()


def test_in_mem_store_matches_persisted(tmp_path):
    """The in-memory (object-ref) layout and the durable hive-parquet
    layout must produce identical engine results."""
    from linkgraph.engine import GraphEngine

    e = micro_graph("powerlaw_1k")
    n = int(e.max()) + 1
    ds = edges_from_arrays(e[:, 0], e[:, 1])
    m_mem = build_graph_store(ds, n, 3, str(tmp_path / "mem"),
                              persist=False)
    m_dur = build_graph_store(ds, n, 3, str(tmp_path / "dur"),
                              persist=True)
    assert m_mem.get("in_mem") and "block_refs" in m_mem
    e1 = GraphEngine(str(tmp_path / "mem"), m_mem)
    e2 = GraphEngine(str(tmp_path / "dur"), m_dur)
    try:
        pagerank(e1, iterations=5)
        pagerank(e2, iterations=5)
        r1 = e1.state_pandas(["rank"])["rank"].to_numpy()
        r2 = e2.state_pandas(["rank"])["rank"].to_numpy()
        assert np.array_equal(r1, r2)
    finally:
        e1.shutdown()
        e2.shutdown()


def test_csv_and_json_edge_sources(tmp_path):
    """CSV / NDJSON edge lists load into the same (src, dst) contract and
    drive the engine identically to the parquet path."""
    import json

    import pandas as pd

    from linkgraph.io import read_edges_csv, read_edges_json

    pdf = pd.DataFrame({"src": [0, 1, 2, 3], "dst": [1, 2, 3, 0],
                        "weight": [1.0, 2.0, 3.0, 4.0]})
    csv_p = tmp_path / "e.csv"
    pdf.to_csv(csv_p, index=False)
    jl_p = tmp_path / "e.jsonl"
    with open(jl_p, "w") as f:
        for r in pdf.to_dict("records"):
            f.write(json.dumps(r) + "\n")
    want = pdf[["src", "dst"]].astype("int64")
    for reader, p in ((read_edges_csv, csv_p), (read_edges_json, jl_p)):
        got = reader(str(p)).to_pandas().sort_values(["src", "dst"]) \
            .reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want)


def test_snap_text_edge_source(tmp_path):
    """SNAP-style whitespace edge lists load into the (src, dst)
    contract: comments and blank lines skipped, tabs and runs of spaces
    both accepted."""
    import pandas as pd

    from linkgraph.io import read_edges_text

    p = tmp_path / "graph.txt"
    p.write_text("# Directed graph: test\n"
                 "# src\tdst\n"
                 "0\t1\n"
                 "1 2\n"
                 "\n"
                 "2   3\n"
                 "3\t0\n")
    got = read_edges_text(str(p)).to_pandas() \
        .sort_values(["src", "dst"]).reset_index(drop=True)
    want = pd.DataFrame({"src": [0, 1, 2, 3], "dst": [1, 2, 3, 0]})
    pd.testing.assert_frame_equal(got, want)


def test_snap_text_malformed_line_raises(tmp_path):
    """A single-token line raises a descriptive ValueError, not an
    opaque Arrow list-index error (ADVICE r2)."""
    import pytest

    from linkgraph.io import read_edges_text

    p = tmp_path / "bad.txt"
    p.write_text("0 1\n42\n2 3\n")
    with pytest.raises(Exception) as ei:
        read_edges_text(str(p)).to_pandas()
    assert "malformed edge line" in str(ei.value)


def test_binary_edgeunit_source_roundtrip(tmp_path):
    """The reference's packed EdgeUnit binary format (type.hpp:28-42)
    round-trips through write_edges_binary/read_edges_binary, unweighted
    and weighted, including multi-block parallel reads."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from linkgraph.io import read_edges_binary, write_edges_binary

    rng = np.random.default_rng(7)
    n = 10_000
    pdf = pd.DataFrame({
        "src": rng.integers(0, 1000, n).astype("int64"),
        "dst": rng.integers(0, 1000, n).astype("int64"),
        "weight": rng.random(n).astype(np.float32).astype(np.float64)})
    for weighted in (False, True):
        cols = ["src", "dst"] + (["weight"] if weighted else [])
        p = tmp_path / f"edges_{weighted}.bin"
        write_edges_binary(rd.from_pandas(pdf[cols]), str(p),
                           weighted=weighted)
        unit = 12 if weighted else 8
        assert p.stat().st_size == n * unit
        got = read_edges_binary(str(p), weighted=weighted,
                                edges_per_block=3000).to_pandas()
        # block arrival order is not guaranteed (preserve_order off);
        # the engine's edge contract is order-free
        pd.testing.assert_frame_equal(
            got.sort_values(cols).reset_index(drop=True),
            pdf[cols].sort_values(cols).reset_index(drop=True))


def test_write_partitioned_resumable(tmp_path):
    """Resumable sink: completed partitions (with _SUCCESS) are skipped
    and left untouched on re-run; a crash-torn partition (no marker) is
    cleared and rewritten whole; final data equals a clean write."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from linkgraph.io import write_partitioned_resumable

    def mk():
        return rd.from_arrow(pa.table({
            "g": pa.array([0, 0, 1, 1, 2, 2], pa.int64()),
            "x": pa.array([1, 2, 3, 4, 5, 6], pa.int64())}))

    out = str(tmp_path / "sink")
    r1 = write_partitioned_resumable(mk(), out, "g")
    assert r1 == {"written": 3, "skipped": 0}

    # simulate a crash in partition g=1: marker gone, torn file left
    os.remove(os.path.join(out, "g=1", "_SUCCESS"))
    with open(os.path.join(out, "g=1", "torn.parquet"), "w") as f:
        f.write("garbage")
    mt0 = {d: os.path.getmtime(os.path.join(out, d, "_SUCCESS"))
           for d in ("g=0", "g=2")}

    r2 = write_partitioned_resumable(mk(), out, "g")
    assert r2 == {"written": 1, "skipped": 2}
    # finished partitions untouched, torn file gone
    for d, t in mt0.items():
        assert os.path.getmtime(os.path.join(out, d, "_SUCCESS")) == t
    assert not os.path.exists(os.path.join(out, "g=1", "torn.parquet"))
    got = pq.read_table(out).to_pandas().sort_values(["g", "x"])
    assert got["x"].tolist() == [1, 2, 3, 4, 5, 6]
    assert got["g"].astype(int).tolist() == [0, 0, 1, 1, 2, 2]
