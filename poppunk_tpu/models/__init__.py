"""Model layer: 2-D (core, accessory) mixture/boundary/kNN fits.

Counterpart of the reference's PopPUNK/models.py ClusterFit hierarchy:
BGMMFit, DBSCANFit, RefineFit (+ threshold mode), LineageFit, with
save/load artefact formats kept compatible. Fits and assignment run on
device via jit/vmap; the reference's thread/process pools for chunked
assignment (models.py:411-464) are replaced by batched device execution.
"""

from .base import ClusterFit, load_cluster_fit  # noqa: F401
from .bgmm import BGMMFit  # noqa: F401
from .dbscan import DBSCANFit  # noqa: F401
from .refine import RefineFit  # noqa: F401
from .lineage import LineageFit  # noqa: F401
