"""Toolkit algorithms re-expressed as VertexPrograms (reference: the five
apps in /root/reference/toolkits/ + the north-rule additions LP and
triangle counting)."""

from .bc import BCBackwardProgram, BCForwardProgram, betweenness
from .bfs import BFSProgram, bfs
from .cc import CCProgram, connected_components
from .coloring import ColoringProgram, greedy_coloring
from .dagpaths import DagPathsProgram, dag_path_counts
from .eigen import EigenProgram, eigen_l1, eigenvector_centrality
from .harmonic import (HarmonicProgram, closeness_from_seeds,
                       harmonic_centrality)
from .hits import hits, normalized_scores
from .katz import KatzProgram, katz_centrality
from .kcore import (CorenessProgram, KCoreProgram, OnionProgram,
                    coreness, kcore, onion_layers)
from .labelprop import LabelPropProgram, label_propagation
from .mis import MISProgram, maximal_independent_set
from .pagerank import (PageRankProgram, PPRProgram,
                       WarmPageRankProgram, WeightedPageRankProgram,
                       pagerank, pagerank_warm,
                       personalized_pagerank, weighted_pagerank)
from .salsa import SalsaAuthStep, SalsaHubStep, salsa
from .scc import (SCCBackwardProgram, SCCForwardProgram,
                  strongly_connected_components)
from .sssp import SSSPProgram, sssp
from .widest import WidestPathProgram, widest_path
from .wl import WLProgram, wl_color_counts, wl_refine
from .toposort import LayerProgram, dag_layers
from .triangles import clustering_coefficients, triangle_count

__all__ = [
    "BCBackwardProgram", "BCForwardProgram", "betweenness",
    "BFSProgram", "bfs",
    "CCProgram", "connected_components",
    "ColoringProgram", "greedy_coloring",
    "DagPathsProgram", "dag_path_counts",
    "EigenProgram", "eigen_l1", "eigenvector_centrality",
    "HarmonicProgram", "closeness_from_seeds", "harmonic_centrality",
    "hits", "normalized_scores",
    "KatzProgram", "katz_centrality",
    "WLProgram", "wl_color_counts", "wl_refine",
    "CorenessProgram", "KCoreProgram", "coreness", "kcore",
    "OnionProgram", "onion_layers",
    "LabelPropProgram", "label_propagation",
    "MISProgram", "maximal_independent_set",
    "PageRankProgram", "PPRProgram", "WarmPageRankProgram",
    "WeightedPageRankProgram", "pagerank", "pagerank_warm",
    "personalized_pagerank", "weighted_pagerank",
    "SalsaAuthStep", "SalsaHubStep", "salsa",
    "SCCBackwardProgram", "SCCForwardProgram",
    "strongly_connected_components",
    "SSSPProgram", "sssp",
    "WidestPathProgram", "widest_path",
    "LayerProgram", "dag_layers",
    "triangle_count", "clustering_coefficients",
]
