"""Aggregate throughput of the dense-signal kernel (gather+reduceat) when
run on 1/4/8/16/32 independent processes — plateau => DRAM-bound."""
import multiprocessing as mp, time, sys
import numpy as np

def worker(n_iter, q):
    sys.path.insert(0, "/root/repo")
    from linkgraph.csr import segment_reduce
    rng = np.random.default_rng(0)
    E, n_local = 3_000_000, 250_000
    idx = rng.integers(0, n_local, E)
    indptr = np.sort(rng.integers(0, E, 2_400_000)); indptr = np.concatenate([[0], indptr, [E]])
    vals = rng.random(n_local)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        ev = vals[idx]
        segment_reduce(ev, indptr, "add")
    q.put(E * n_iter / (time.perf_counter() - t0))

if __name__ == "__main__":
    for nproc in (1, 4, 8, 16, 32):
        q = mp.Queue()
        ps = [mp.Process(target=worker, args=(8, q)) for _ in range(nproc)]
        [p.start() for p in ps]
        rates = [q.get() for _ in ps]
        [p.join() for p in ps]
        print(f"nproc={nproc:2d} aggregate={sum(rates)/1e6:8.1f}M edges/s per-proc={np.mean(rates)/1e6:6.1f}M")
