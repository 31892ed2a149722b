"""
xugrid_tpu: a TPU-native framework for 1D network and 2D unstructured-grid
(UGRID conventions) data.

Capability-parity rebuild of Deltares/xugrid on JAX/XLA/Pallas:
topologies are padded dense int arrays; the spatial index is a flat BVH
with batched jitted queries; regridders build sparse weights on device and
apply them as fused segment-sum kernels; partitioning maps onto device
sharding with collective halo exchange.
"""

__version__ = "0.1.0"

from xugrid_tpu.constants import FILL_VALUE
