"""Verify drive: full pipeline synth -> link edges -> graph store -> engine
-> pagerank + cc on the repo-derived graph, via the public surface."""
import logging

import numpy as np
import ray
from ray.data import DataContext

ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR")
logging.getLogger("ray.data").setLevel(logging.ERROR)
DataContext.get_current().enable_progress_bars = False

from linkgraph.edges import build_link_edges  # noqa: E402
from linkgraph.synth import synth_repo_files_dataset  # noqa: E402
from linkgraph.graph import load_directed, load_undirected  # noqa: E402
from linkgraph.algos import pagerank, connected_components  # noqa: E402
from linkgraph.algos.pagerank import pr_sum  # noqa: E402
from linkgraph.algos.cc import component_count  # noqa: E402

files = synth_repo_files_dataset(60, 80, seed=42, repos_per_block=10)
edges, n_vertices, _ = build_link_edges(files)
edges = edges.materialize()

eng = load_directed(edges, n_vertices, num_partitions=4,
                    store_dir="/tmp/lg_store_dir")
rep = pagerank(eng, iterations=20, tol=1e-6)
ranks = eng.state_pandas(["rank"])
s = pr_sum(eng)
assert len(ranks) == n_vertices
assert np.isfinite(ranks["rank"]).all()
top = ranks.sort_values("rank", ascending=False).head(3)
modes = [st["mode"] for st in rep["steps"]]
eng.shutdown()

eng2 = load_undirected(edges, n_vertices, num_partitions=4,
                       store_dir="/tmp/lg_store_und")
rep2 = connected_components(eng2, ckpt_dir="/tmp/lg_ck")
ncomp = component_count(eng2)
eng2.shutdown()

print(f"OK V={n_vertices} E(meta)={rep['n_edges']} pr_steps={rep['n_steps']} "
      f"modes={set(modes)} pr_sum={s:.2f} top_rank={top['rank'].iloc[0]:.3f} "
      f"cc_steps={rep2['n_steps']} components={ncomp}")
ray.shutdown()
