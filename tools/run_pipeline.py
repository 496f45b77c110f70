"""CLI entrypoint for cluster runs (`ray job submit -- python
tools/run_pipeline.py ...`) and local execution.

Runs the full pipeline: repo-files parquet -> link-edge derivation ->
graph store -> one or more algorithms -> parquet results, with
per-superstep checkpoints and resume.

Examples
--------
    # derive the graph and run 20-iteration PageRank
    python tools/run_pipeline.py --input /data/repo_files \
        --workdir /data/lg --algo pagerank --iterations 20

    # resume a killed CC run from its latest checkpoint
    python tools/run_pipeline.py --input /data/repo_files \
        --workdir /data/lg --algo cc --resume

On a cluster, submit with the repo in the working dir:
    ray job submit --working-dir . -- python tools/run_pipeline.py ...
(the script calls ray.init() only if Ray is not already initialised, so
it composes with driver-managed sessions too).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True,
                    help="parquet dir: (repo, path, commit, lang, content)")
    ap.add_argument("--workdir", required=True,
                    help="output root: edges/, store*/, ckpt/, results/")
    ap.add_argument("--algo", default="pagerank",
                    choices=["pagerank", "cc", "labelprop", "bfs", "sssp",
                             "bc", "triangles"])
    ap.add_argument("--iterations", type=int, default=20)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--root", type=int, default=0, help="bfs/sssp/bc root")
    ap.add_argument("--partitions", type=int, default=0,
                    help="shard count (0 = auto from edge count and CPUs)")
    ap.add_argument("--num-cpus", type=int, default=0,
                    help="ray.init num_cpus when starting a local session")
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        kw = {"address": os.environ.get("RAY_ADDRESS", "local"),
              "include_dashboard": False, "logging_level": "ERROR"}
        if kw["address"] == "local" and args.num_cpus:
            kw["num_cpus"] = args.num_cpus
        ray.init(**kw)
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from linkgraph import algos
    from linkgraph.edges import build_link_edges
    from linkgraph.graph import load_directed, load_undirected, \
        suggest_partitions
    from linkgraph.io import read_repo_files, write_json

    t0 = time.perf_counter()
    files = read_repo_files(args.input)
    edges, n_vertices, _ = build_link_edges(files)
    edges = edges.materialize()
    n_edges = edges.count()
    cpus = int(ray.cluster_resources().get("CPU", 8))
    parts = args.partitions or suggest_partitions(n_edges, cpus)
    report = {"input": args.input, "algo": args.algo,
              "n_vertices": n_vertices, "n_edges": n_edges,
              "partitions": parts}

    if args.algo == "triangles":
        report["triangles"] = int(algos.triangle_count(edges, parts))
        report["wall_s"] = round(time.perf_counter() - t0, 2)
        print(json.dumps(report))
        return

    undirected = args.algo in ("cc", "labelprop")
    loader = load_undirected if undirected else load_directed
    store = os.path.join(args.workdir,
                         "store_und" if undirected else "store_dir")
    eng = loader(edges, n_vertices, parts, store)
    ckpt = os.path.join(args.workdir, f"ckpt_{args.algo}")
    common = dict(ckpt_dir=ckpt, resume=args.resume)
    if args.algo == "pagerank":
        rep = algos.pagerank(eng, iterations=args.iterations, tol=args.tol,
                             **common)
        cols = ["rank"]
    elif args.algo == "cc":
        rep = algos.connected_components(eng, **common)
        cols = ["label"]
    elif args.algo == "labelprop":
        rep = algos.label_propagation(eng, max_iters=args.iterations,
                                      **common)
        cols = ["label"]
    elif args.algo == "bfs":
        rep = algos.bfs(eng, root=args.root, **common)
        cols = ["parent"]
    elif args.algo == "sssp":
        rep = algos.sssp(eng, root=args.root, **common)
        cols = ["distance"]
    else:  # bc
        rep = algos.betweenness(eng, root=args.root)
        cols = ["dependencies", "num_paths"]

    out = os.path.join(args.workdir, f"results_{args.algo}")
    eng.dump_vertex_array(cols, out)
    eng.shutdown()
    steps = rep.get("n_steps") or rep.get("forward", {}).get("n_steps")
    report.update({"results": out, "n_steps": steps,
                   "wall_s": round(time.perf_counter() - t0, 2)})
    write_json(report, os.path.join(args.workdir,
                                    f"report_{args.algo}.json"))
    print(json.dumps(report))


if __name__ == "__main__":
    main()
