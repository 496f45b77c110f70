"""Trimmed scaling measurement for the NORTH-RULE metric specifically:
PageRank superstep throughput (edges/sec/superstep, 20 iters) at two
session CPU budgets (8 vs 32) in fresh processes, with a DRAM-kernel
probe IMMEDIATELY adjacent to each engine measurement.

Why this exists: the full `bench.py --scaling` takes ~25 min/attempt;
this sandbox's hypervisor throttles memory-bound throughput by up to
100x on a seconds timescale (tools/cpu-vs-mem probes, BENCH/BASELINE.md
round-3 notes), so long runs almost always straddle a degraded window.
This tool measures ONLY the headline superstep metric (~4 min/level),
maximizing the chance both levels land inside one clean window, and
records the probe right next to each measurement for normalization.

Usage:
  python tools/scaling_superstep.py            # both levels, one JSON line
  python tools/scaling_superstep.py --level 8  # one level (child mode)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

V = int(os.environ.get("GRAFT_SCALE_V", "8000000"))
E = int(os.environ.get("GRAFT_SCALE_E", "96000000"))
REPEATS = int(os.environ.get("GRAFT_SCALE_REPEATS", "3"))
# N and 4N CPU budgets.  8,32 is the headline pair; 2,8 is the control
# pair that stays below this box's SMT knee (32 vCPUs are HT siblings
# of 16 physical cores — a pure-ALU spin measures only 2.7x from 8->32)
LEVELS = tuple(int(x) for x in
               os.environ.get("GRAFT_SCALE_LEVELS", "8,32").split(","))


def _probe(n_procs: int, n_iter: int = 8) -> float:
    """Aggregate e/s of tools/bw_probe.py's EXACT kernel (gather +
    segment_reduce) across n_procs processes — the code-independent
    ceiling, same accounting as every prior round's probe so the
    engine/probe ratios stay comparable."""
    import multiprocessing as mp

    import numpy as np

    def kernel(q):
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        from linkgraph.csr import segment_reduce

        rng = np.random.default_rng(0)
        E, n_local = 3_000_000, 250_000
        idx = rng.integers(0, n_local, E)
        indptr = np.sort(rng.integers(0, E, 2_400_000))
        indptr = np.concatenate([[0], indptr, [E]])
        vals = rng.random(n_local)
        t0 = time.perf_counter()
        for _ in range(n_iter):
            ev = vals[idx]
            segment_reduce(ev, indptr, "add")
        q.put(E * n_iter / (time.perf_counter() - t0))

    q = mp.Queue()
    ps = [mp.Process(target=kernel, args=(q,)) for _ in range(n_procs)]
    for p in ps:
        p.start()
    vals = [q.get() for _ in ps]
    for p in ps:
        p.join()
    return sum(vals)


def run_level(ncpu: int) -> dict:
    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench
    from linkgraph.algos import pagerank
    from linkgraph.graph import load_directed, suggest_partitions

    scratch = f"/tmp/scale_superstep_{ncpu}"
    shutil.rmtree(scratch, ignore_errors=True)
    os.makedirs(scratch)
    t0 = time.perf_counter()
    se = bench._gen_edges(V, E)
    eng = load_directed(se, V, num_partitions=suggest_partitions(E, ncpu),
                        store_dir=os.path.join(scratch, "s"))
    build_s = time.perf_counter() - t0
    rep = pagerank(eng, iterations=20, tol=1e-6)  # warm-up (lazy CSC)
    best = float("inf")
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        rep = pagerank(eng, iterations=20, tol=1e-6)
        best = min(best, time.perf_counter() - t0)
    steps = rep["n_steps"]
    eng.shutdown()
    ray.shutdown()
    shutil.rmtree(scratch, ignore_errors=True)
    return {"ncpu": ncpu, "build_s": round(build_s, 2),
            "best_20it_s": round(best, 3), "n_steps": steps,
            "edges_per_sec_per_superstep": round(E * steps / best, 1)}


def main():
    if "--level" in sys.argv:
        ncpu = int(sys.argv[sys.argv.index("--level") + 1])
        print("LEVEL " + json.dumps(run_level(ncpu)), flush=True)
        return
    out = {"V": V, "E": E, "repeats": REPEATS, "levels": list(LEVELS),
           "probe": {}, "level": {}}
    for ncpu in LEVELS:
        out["probe"][str(ncpu)] = round(_probe(ncpu), 1)
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--level", str(ncpu)],
            capture_output=True, text=True)
        line = [ln for ln in r.stdout.splitlines()
                if ln.startswith("LEVEL ")]
        if not line:
            print(json.dumps({"error": r.stderr[-2000:]}))
            return
        out["level"][str(ncpu)] = json.loads(line[-1][6:])
        out["probe"][str(ncpu) + "_post"] = round(_probe(ncpu), 1)
    lo, hi = str(LEVELS[0]), str(LEVELS[1])
    tlo = out["level"][lo]["edges_per_sec_per_superstep"]
    thi = out["level"][hi]["edges_per_sec_per_superstep"]
    ratio = LEVELS[1] / LEVELS[0]
    out["superstep_speedup"] = round(thi / tlo, 3)
    out["scaling_efficiency_superstep"] = round(thi / tlo / ratio, 3)
    plo = max(out["probe"][lo], out["probe"][lo + "_post"])
    phi = max(out["probe"][hi], out["probe"][hi + "_post"])
    out["engine_over_probe"] = {lo: round(tlo / plo, 3),
                                hi: round(thi / phi, 3)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
