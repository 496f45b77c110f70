import hashlib

import pyarrow as pa

from linkgraph import synth


def test_deterministic():
    a = synth.synth_repo_files(5, 40)
    b = synth.synth_repo_files(5, 40)
    assert a.equals(b)
    assert a.num_rows == 200
    assert a.schema.names == ["repo", "path", "commit", "lang", "content"]


def test_sharded_equals_whole():
    whole = synth.synth_repo_files(6, 10)
    parts = pa.concat_tables([
        synth.synth_repo_files(6, 10, repo_lo=0, repo_hi=2),
        synth.synth_repo_files(6, 10, repo_lo=2, repo_hi=6),
    ])
    assert whole.equals(parts)


def test_sharing_exists():
    t = synth.synth_repo_files(20, 50)
    import collections
    paths = collections.Counter(
        (p for p in t["path"].to_pylist()))
    shas = collections.Counter(
        hashlib.sha256(c.encode()).hexdigest() for c in t["content"].to_pylist())
    assert any(v >= 2 for v in paths.values()), "no shared paths"
    assert any(v >= 2 for v in shas.values()), "no shared content"
    assert any(c == "" for c in t["content"].to_pylist()), "no empty content"


def test_dataset_synth_matches_local():
    local = synth.synth_repo_files(8, 12)
    ds = synth.synth_repo_files_dataset(8, 12, repos_per_block=3)
    got = ds.to_pandas().sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    want = local.to_pandas().sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    assert got.equals(want)


def test_micro_graphs():
    for name in ["path_8", "cycle_5", "star_1_50", "two_cliques_k5",
                 "two_cliques_k5_nobridge", "multi_edge", "er_1k", "powerlaw_1k"]:
        e = synth.micro_graph(name)
        assert e.ndim == 2 and e.shape[1] == 2 and len(e) > 0
    assert len(synth.micro_graph("two_cliques_k5")) == 21
