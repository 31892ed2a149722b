"""Spatial index subsystem: flat BVH + batched jitted queries."""

from xugrid_tpu.spatial.bvh import BVH, build_bvh
from xugrid_tpu.spatial.celltree import CellTree2d, EdgeCellTree2d

__all__ = ["BVH", "build_bvh", "CellTree2d", "EdgeCellTree2d"]
