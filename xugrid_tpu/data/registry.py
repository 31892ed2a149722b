"""
Sample-data registry: the reference fetches its datasets with pooch
(xugrid/data/sample_data.py:9-16, cache dir overridable via
XUGRID_DATA_DIR).  This environment has no network egress, so the
registry resolves the same filenames against local directories and —
only when explicitly allowed — attempts the same GitHub download.
Loaders fall back to the synthetic stand-ins when a file is absent or
unreadable, so every workload runs offline; with the real files placed
in XUGRID_DATA_DIR the real datasets are used.
"""

from __future__ import annotations

import os
import warnings

BASE_URL = "https://github.com/deltares/xugrid/raw/main/data/"

#: filenames of the reference's published sample datasets.
FILES = (
    "xoxo_vertices.txt",
    "xoxo_triangles.txt",
    "ADH_SanDiego.nc",
    "elevation_nl.nc",
    "provinces-nl.geojson",
    "hydamo_objects.csv",
    "hydamo_points.csv",
    "hydamo_profiles.csv",
)


def data_dirs():
    """Candidate directories, highest priority first."""
    dirs = []
    env = os.environ.get("XUGRID_DATA_DIR")
    if env:
        dirs.append(env)
    cache = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    dirs.append(os.path.join(cache, "xugrid"))
    return dirs


def fetch(filename: str):
    """Path to a local copy of a registered sample file, or None.

    Set XUGRID_TPU_ALLOW_DOWNLOAD=1 to attempt the reference's GitHub
    download into the cache dir (fails silently without network)."""
    if filename not in FILES:
        raise ValueError(f"Unknown sample file: {filename}")
    for d in data_dirs():
        path = os.path.join(d, filename)
        if os.path.exists(path):
            return path
    if os.environ.get("XUGRID_TPU_ALLOW_DOWNLOAD") == "1":
        target_dir = data_dirs()[-1]
        target = os.path.join(target_dir, filename)
        try:  # pragma: no cover - requires network
            import urllib.request

            os.makedirs(target_dir, exist_ok=True)
            urllib.request.urlretrieve(BASE_URL + filename, target)
            return target
        except Exception as exc:
            warnings.warn(f"Download of {filename} failed: {exc}")
    return None
