from xugrid_tpu.ops.earcut import earcut_triangulate

__all__ = ["earcut_triangulate"]
