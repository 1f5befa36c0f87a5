"""Graph algorithms built on the GraphBLAS surface.

These are the acceptance workloads of BASELINE.json, ported from the
reference notebooks (Level BFS: Example B.1; parent BFS; SSSP: Intro
notebook; PageRank: Pagerank Demo; connected components: FastSV notebook;
triangle counting: Louvain notebook) — expressed with the same masked
semiring operations, which on this backend compile into fused TPU kernels.
"""

from .bfs import bfs_level, bfs_parent
from .sssp import sssp
from .pagerank import pagerank
from .components import connected_components
from .triangles import triangle_count

__all__ = [
    "bfs_level",
    "bfs_parent",
    "sssp",
    "pagerank",
    "connected_components",
    "triangle_count",
]
