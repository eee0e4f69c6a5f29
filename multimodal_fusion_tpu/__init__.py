"""multimodal_fusion_tpu — TPU-native multimodal fusion framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
zz9tf/multimodal-fusion (computational-pathology multimodal fusion of
WSI patch embeddings, TMA marker embeddings and tabular clinical data
for survival prediction).

Subpackages
-----------
- ``channels``   : channel-spec parser (HDF5 path shorthand).
- ``io``         : HDF5/NPZ storage layer + synthetic fixture generator.
- ``data``       : datasets producing padded/bucketed device-ready batches.
- ``ops``        : XLA/Pallas compute kernels (similarity, kmeans, knn, losses).
- ``models``     : fusion model zoo (CLAM/MIL/SVD-gate/hypergraph/VAE/...).
- ``train``      : trainers (survival k-fold, alignment, VAE) + optim/metrics.
- ``hypergraph`` : offline hypergraph construction pipeline.
- ``parallel``   : mesh/sharding utilities (DP over ICI).
- ``cli``        : command-line entry points mirroring the reference CLIs.
"""

__version__ = "0.1.0"

from multimodal_fusion_tpu.channels import (  # noqa: F401
    TMA_MARKERS,
    parse_channels,
    get_available_channels,
)
