"""Phase-level timing of the 10M-face BVH build (host side only)."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import quad_mesh  # noqa: E402

SIDE = int(os.environ.get("SIDE", "3163"))

rng = np.random.default_rng(42)
t0 = time.perf_counter()
verts, faces = quad_mesh(SIDE, SIDE)
jitter = rng.uniform(-0.15, 0.15, verts.shape)
edge = (
    (verts[:, 0] == 0) | (verts[:, 1] == 0)
    | (verts[:, 0] == SIDE) | (verts[:, 1] == SIDE)
)
jitter[edge] = 0.0
verts = verts + jitter
print(f"mesh gen: {time.perf_counter()-t0:.1f}s ({len(faces)} faces)")

from xugrid_tpu.spatial.bvh import (  # noqa: E402
    build_bvh,
    face_bounding_boxes,
    kd_order,
)

t0 = time.perf_counter()
bboxes = face_bounding_boxes(faces, verts[:, 0], verts[:, 1])
print(f"face_bounding_boxes: {time.perf_counter()-t0:.1f}s")

centers = 0.5 * (bboxes[:, :2] + bboxes[:, 2:])
n_leaves = 1 << max(0, (-(-len(bboxes) // 8) - 1)).bit_length()
t0 = time.perf_counter()
order = kd_order(centers, n_leaves.bit_length() - 1, n_leaves * 8)
print(f"kd_order: {time.perf_counter()-t0:.1f}s")

t0 = time.perf_counter()
bvh = build_bvh(bboxes)
print(f"build_bvh total (incl. second kd_order): {time.perf_counter()-t0:.1f}s")
