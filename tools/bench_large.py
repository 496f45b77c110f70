"""Large-scale forced-distributed bench (VERDICT r4 next-step #1).

Runs the headline suite at ~10-100x the regular bench scale with EVERY
size gate forced to its distributed plan (driver/broadcast caps set to
0), so no stage can fall back to the small-side shortcut paths that
dominate at sf0.1.  This is the sandbox stand-in for "would the
engine survive 100 TB": the plans exercised here are exactly the ones
a 256-node cluster would run.

Usage (fresh process per config; writes ONE JSON line):

  cd /tmp && PYTHONPATH=/root/repo python /root/repo/tools/bench_large.py
  env: LG_CPUS (32), LG_REPOS (20000 -> 2M files), LG_FILES_PER (100),
       LG_SYNTH_V (20_000_000), LG_SYNTH_E (200_000_000),
       LG_STAGES (comma list; default all:
                  edge_build,pagerank,pagerank_synth,cc,triangles,minhash)

Results are recorded in BENCH/BASELINE.md ("Large-scale
forced-distributed runs").
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

SEED = 42


def force_distributed() -> dict:
    """Zero every driver/broadcast size gate; returns what was forced."""
    import linkgraph.algos.triangles as tri
    import linkgraph.dedup as dd
    import linkgraph.edges as ed
    import linkgraph.ids as ids
    import linkgraph.joins as jn

    forced = {}
    for mod, names in [
            (ed, ["EDGE_DRIVER_DEDUP_CAP", "STAR_DRIVER_CAP"]),
            (dd, ["DRIVER_PAIR_CAP", "HOT_DRIVER_CAP",
                  "BUCKET_DRIVER_CAP", "EMBED_BROADCAST_ELEMS"]),
            (jn, ["SEMI_BROADCAST_CAP", "ATTACH_BROADCAST_CAP"]),
            (ids, ["BROADCAST_MAP_CAP"]),
            (tri, ["BROADCAST_DEG_CAP", "DRIVER_TRI_CAP",
                   "EDGE_KEY_BROADCAST_CAP"])]:
        for n in names:
            forced[f"{mod.__name__}.{n}"] = getattr(mod, n)
            setattr(mod, n, 0)
    return forced


def main() -> None:
    import logging

    import ray
    from ray.data import DataContext

    num_cpus = int(os.environ.get("LG_CPUS", "32"))
    n_repos = int(os.environ.get("LG_REPOS", "20000"))
    files_per = int(os.environ.get("LG_FILES_PER", "100"))
    synth_v = int(os.environ.get("LG_SYNTH_V", "20000000"))
    synth_e = int(os.environ.get("LG_SYNTH_E", "200000000"))
    stages = os.environ.get(
        "LG_STAGES",
        "edge_build,pagerank,pagerank_synth,cc,triangles,minhash") \
        .split(",")

    scratch = "/tmp/lg_bench"
    shutil.rmtree(scratch, ignore_errors=True)
    os.makedirs(scratch, exist_ok=True)

    ray.init(address="local", num_cpus=num_cpus,
             include_dashboard=False, logging_level="ERROR")
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    DataContext.get_current().enable_progress_bars = False

    forced = force_distributed()

    from bench import _gen_edges, _with_docid
    from linkgraph.algos import (
        connected_components, pagerank, triangle_count,
    )
    from linkgraph.dedup import minhash_dedup_pairs
    from linkgraph.edges import build_link_edges
    from linkgraph.graph import (
        load_directed, load_undirected, suggest_partitions,
    )
    from linkgraph.synth import synth_repo_files_dataset

    q: dict[str, float] = {}
    detail: dict = {"config": {
        "num_cpus": num_cpus, "files": n_repos * files_per,
        "synth_v": synth_v, "synth_e": synth_e,
        "gates_forced": sorted(forced)}}

    edges = None
    n_vertices = n_edges = 0
    if "edge_build" in stages:
        t0 = time.perf_counter()
        files = synth_repo_files_dataset(
            n_repos, files_per, seed=SEED,
            repos_per_block=max(1, n_repos // 256))
        edges, n_vertices, _ = build_link_edges(files)
        edges = edges.materialize()
        n_edges = edges.count()
        q["edge_build"] = time.perf_counter() - t0
        detail["edge_build"] = {
            "files": n_repos * files_per, "vertices": n_vertices,
            "edges": n_edges,
            "files_per_sec": round(n_repos * files_per
                                   / q["edge_build"], 1)}
        print(f"# edge_build {q['edge_build']:.1f}s "
              f"V={n_vertices} E={n_edges}", file=sys.stderr)

    if "pagerank" in stages and edges is not None:
        t0 = time.perf_counter()
        eng = load_directed(
            edges, n_vertices,
            num_partitions=suggest_partitions(n_edges, num_cpus),
            store_dir=os.path.join(scratch, "pr_store"))
        build_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        rep = pagerank(eng, iterations=20, tol=1e-6)
        pr_s = time.perf_counter() - t0
        eng.shutdown()
        q["pagerank"] = build_s + pr_s
        detail["pagerank"] = {
            "store_build_s": round(build_s, 3),
            "supersteps_s": round(pr_s, 3),
            "n_supersteps": rep["n_steps"], "edges": n_edges,
            "edges_per_sec_per_superstep":
                round(n_edges * rep["n_steps"] / pr_s, 1)}
        print(f"# pagerank build {build_s:.1f}s + {pr_s:.1f}s",
              file=sys.stderr)

    if "pagerank_synth" in stages:
        t0 = time.perf_counter()
        se = _gen_edges(synth_v, synth_e, n_blocks=256)
        eng = load_directed(
            se, synth_v,
            num_partitions=suggest_partitions(synth_e, num_cpus),
            store_dir=os.path.join(scratch, "synth_store"))
        build2_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        rep2 = pagerank(eng, iterations=20, tol=1e-6)
        pr2_s = time.perf_counter() - t0
        real_e = eng.meta["n_edges"]
        eng.shutdown()
        q["pagerank_synth"] = build2_s + pr2_s
        detail["pagerank_synth"] = {
            "store_build_s": round(build2_s, 3),
            "supersteps_s": round(pr2_s, 3),
            "n_supersteps": rep2["n_steps"], "edges": real_e,
            "edges_per_sec_per_superstep":
                round(real_e * rep2["n_steps"] / pr2_s, 1)}
        print(f"# pagerank_synth build {build2_s:.1f}s + {pr2_s:.1f}s "
              f"E={real_e} "
              f"({real_e * rep2['n_steps'] / pr2_s / 1e6:.0f}M e/s)",
              file=sys.stderr)

    if "cc" in stages and edges is not None:
        t0 = time.perf_counter()
        eng = load_undirected(
            edges, n_vertices,
            num_partitions=suggest_partitions(2 * n_edges, num_cpus),
            store_dir=os.path.join(scratch, "cc_store"))
        repc = connected_components(eng)
        eng.shutdown()
        q["cc"] = time.perf_counter() - t0
        detail["cc"] = {"n_supersteps": repc["n_steps"]}
        print(f"# cc {q['cc']:.1f}s", file=sys.stderr)

    if "triangles" in stages and edges is not None:
        t0 = time.perf_counter()
        tri_n = triangle_count(edges, num_partitions=num_cpus)
        q["triangles"] = time.perf_counter() - t0
        detail["triangles"] = {"count": tri_n}
        print(f"# triangles {q['triangles']:.1f}s n={tri_n}",
              file=sys.stderr)

    if "minhash" in stages:
        t0 = time.perf_counter()
        files2 = synth_repo_files_dataset(
            n_repos, files_per, seed=SEED,
            repos_per_block=max(1, n_repos // 256))
        docs = files2.map_batches(_with_docid,
                                  batch_format="pyarrow").materialize()
        pairs = minhash_dedup_pairs(
            docs, id_col="doc_id", text_col="text", threshold=0.8,
            concurrency=max(2, num_cpus - 4), cap=32)
        import pandas as pd

        n_pairs = len(pairs) if isinstance(pairs, pd.DataFrame) \
            else pairs.count()
        q["minhash"] = time.perf_counter() - t0
        detail["minhash"] = {"pairs": int(n_pairs),
                             "docs": n_repos * files_per}
        print(f"# minhash {q['minhash']:.1f}s pairs={n_pairs}",
              file=sys.stderr)

    ray.shutdown()
    shutil.rmtree(scratch, ignore_errors=True)
    print(json.dumps({
        "metric": "large-scale forced-distributed suite",
        "value": round(sum(q.values()), 3), "unit": "sec",
        "queries": {k: round(v, 3) for k, v in q.items()},
        "num_cpus": num_cpus, "detail": detail}))


if __name__ == "__main__":
    main()
