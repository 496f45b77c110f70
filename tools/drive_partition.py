"""Verify drive: partition.py over a real Ray Data degree pipeline + csr kernels."""
import logging

import numpy as np
import ray
from ray.data import DataContext

ray.init(address="local", num_cpus=8, include_dashboard=False,
         logging_level="ERROR")
logging.getLogger("ray.data").setLevel(logging.ERROR)
DataContext.get_current().enable_progress_bars = False

from linkgraph.edges import build_link_edges, degree_table, symmetrize  # noqa: E402
from linkgraph.synth import synth_repo_files_dataset  # noqa: E402
from linkgraph.partition import partition_offsets, part_of  # noqa: E402
from linkgraph.csr import build_compressed, rows_of, expand_rows  # noqa: E402

files = synth_repo_files_dataset(40, 60, seed=42, repos_per_block=8)
edges, n_vertices, _ = build_link_edges(files)
edges = symmetrize(edges)
deg = degree_table(edges, "src")
offsets = partition_offsets(deg, n_vertices, num_partitions=4)
assert offsets[0] == 0 and offsets[-1] == n_vertices, offsets
assert np.all(np.diff(offsets) >= 0), offsets

# route edges, build per-partition pull-CSC, check edge conservation
e = edges.to_pandas()
src = e["src"].to_numpy()
dst = e["dst"].to_numpy()
parts = part_of(src, offsets)
tot = 0
for p in range(4):
    m = parts == p
    cr = build_compressed(dst[m], src[m])  # pull-CSC: rows keyed by dst
    tot += cr.n_edges
    # every index (src) must be locally owned
    if cr.n_edges:
        assert (cr.indices >= offsets[p]).all() and (cr.indices < offsets[p + 1]).all()
    pos, present = rows_of(cr, cr.row_vertex[:5])
    assert present.all()
    ei, rr = expand_rows(cr, pos)
    assert len(ei) == int((cr.indptr[1:] - cr.indptr[:-1])[:5].sum())
print(f"OK n_vertices={n_vertices} edges={len(e)} routed={tot} offsets={offsets.tolist()}")
assert tot == len(e)
ray.shutdown()
