"""
CRS handling: CF grid-mapping attributes ⇄ pyproj.CRS, with a placeholder
when pyproj is unavailable.  Semantics track the reference
(xugrid/ugrid/crs.py:1-115): candidates from CF attrs, WKT, and EPSG
entries, with conflicts resolved via EPSG round-trips.
"""

from __future__ import annotations


class CrsPlaceholder:
    """Stands in for pyproj.CRS when pyproj is not installed."""

    def __init__(self, attrs: dict):
        self._attrs = dict(attrs)

    def __eq__(self, other):
        if isinstance(other, CrsPlaceholder):
            return self._attrs == other._attrs
        return False

    def __hash__(self):
        return hash(tuple(sorted(map(str, self._attrs.items()))))

    def __repr__(self):
        return f"CrsPlaceholder({self._attrs})"


def crs_from_attrs(ds_attrs: dict):
    """
    Build a CRS object from grid-mapping attributes.

    Tries, in order: CF grid mapping attributes, WKT (crs_wkt/spatial_ref),
    and an EPSG identifier.  Prefers a candidate that round-trips to a valid
    EPSG code; raises ValueError when attributes resolve to conflicting
    EPSG codes.  Returns CrsPlaceholder when pyproj is missing or nothing
    resolves.
    """
    try:
        import pyproj
    except ImportError:
        return CrsPlaceholder(ds_attrs)

    attrs = {k.lower(): v for k, v in ds_attrs.items()}
    candidates: dict = {}

    if attrs.get("grid_mapping_name") is not None:
        try:
            candidates["grid_mapping"] = pyproj.CRS.from_cf(attrs)
        except pyproj.exceptions.CRSError:
            pass
    else:
        wkt = attrs.get("crs_wkt") or attrs.get("spatial_ref")
        if wkt is not None:
            try:
                candidates["wkt"] = pyproj.CRS.from_wkt(wkt)
            except pyproj.exceptions.CRSError:
                pass

    epsg_entry = attrs.get("epsg") or attrs.get("epsg_code")
    if epsg_entry is not None:
        try:
            candidates["epsg"] = pyproj.CRS.from_user_input(epsg_entry)
        except (ValueError, pyproj.exceptions.CRSError):
            pass

    if not candidates:
        return CrsPlaceholder(ds_attrs)

    crses = list(candidates.values())
    first = crses[0]
    if all(first.equals(crs) for crs in crses[1:]):
        return first

    epsg_ids = {
        label: epsg
        for label, crs in candidates.items()
        if (epsg := crs.to_epsg()) is not None
    }
    if len(set(epsg_ids.values())) > 1:
        msg = "\n".join(f"- {label}: EPSG={epsg}" for label, epsg in epsg_ids.items())
        raise ValueError(f"Contradictory CRS information in attributes:\n{msg}")
    for label, crs in candidates.items():
        if label in epsg_ids:
            return crs
    return first


def crs_to_attrs(crs) -> dict:
    if isinstance(crs, CrsPlaceholder):
        return crs._attrs
    attrs = crs.to_cf()
    attrs["spatial_ref"] = attrs["crs_wkt"]
    attrs["name"] = crs.name
    epsg = crs.to_epsg()
    if epsg is not None:
        attrs["epsg"] = epsg
    return attrs
