"""Network layer: strain graphs as edge arrays.

Replaces the reference's graph-tool/cugraph dual backend
(PopPUNK/network.py) with a single array-native design: a graph is
(n_vertices, edges[int64 E x 2], optional weights) — components, summary
statistics and cluster naming operate on these arrays via scipy.sparse /
numpy on the host and via label-propagation kernels on device
(ops/device_sweep.py) inside the refine sweep.
"""

from .graph import Graph  # noqa: F401
from .components import connected_components  # noqa: F401
from .summary import network_summary, print_network_summary  # noqa: F401
from .clusters import print_clusters  # noqa: F401
