"""Polygon/WKT spatial filtering.

Reference surface: ``SpatialRecursivePrefixTreeFieldType`` /
``LatLonPointSpatialField`` with JTS WKT shapes — ``fq={!field
f=loc}Intersects(POLYGON((...)))``. The reference delegates geometry to
JTS; here the two pieces a filter needs are implemented directly:

- a WKT parser for ``POLYGON ((lon lat, ...))`` (single outer ring; the
  planar, non-geodesic interpretation JTS uses by default);
- a vectorized even-odd ray-casting point-in-polygon test: ONE pass per
  polygon edge over the whole batch's coordinate arrays (numpy), so a
  P-vertex polygon costs P vectorized ops per batch — no per-point Python.

Boundary convention: edges crossing strictly below the point toggle
parity (the classic even-odd rule); points exactly on a horizontal edge
follow the half-open rule, which keeps the test consistent with the
convex half-plane oracle on generic (non-degenerate) fixtures.
"""

from __future__ import annotations

import re

import numpy as np


class WktError(ValueError):
    pass


def parse_wkt_polygon(wkt: str) -> np.ndarray:
    """``POLYGON ((x y, x y, ...))`` -> (n, 2) float64 vertex array (the
    closing vertex, if repeated, is dropped). Only the outer ring of a
    simple polygon is supported — the subset the filter entries use."""
    m = re.match(r"^\s*POLYGON\s*\(\(\s*(.*?)\s*\)\)\s*$", wkt, re.IGNORECASE | re.DOTALL)
    if not m:
        raise WktError(f"not a simple POLYGON WKT: {wkt[:40]!r}")
    pts = []
    for pair in m.group(1).split(","):
        bits = pair.split()
        if len(bits) != 2:
            raise WktError(f"bad coordinate pair {pair!r}")
        pts.append((float(bits[0]), float(bits[1])))
    if len(pts) >= 2 and pts[0] == pts[-1]:
        pts = pts[:-1]
    if len(pts) < 3:
        raise WktError("polygon needs >= 3 distinct vertices")
    return np.asarray(pts, dtype=np.float64)


def points_in_polygon(x: np.ndarray, y: np.ndarray, poly: np.ndarray) -> np.ndarray:
    """Even-odd ray casting, vectorized over the point arrays: for each
    edge (one loop iteration per VERTEX, numpy ops per POINT), toggle
    parity where the edge straddles the point's y and the intersection of
    the edge with the horizontal ray lies right of the point."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    inside = np.zeros(len(x), dtype=bool)
    n = len(poly)
    for i in range(n):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % n]
        straddle = (y1 > y) != (y2 > y)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = x1 + (y - y1) * (x2 - x1) / (y2 - y1)
        inside ^= straddle & (x < xint)
    return inside


def convex_halfplane_mask(x: np.ndarray, y: np.ndarray, poly: np.ndarray) -> np.ndarray:
    """Strict-interior test for a CONVEX counter-clockwise polygon: the
    point lies left of every edge. This is the form the SQL oracle can
    state as an AND of sign tests — used to cross-check ray casting."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    ok = np.ones(len(x), dtype=bool)
    n = len(poly)
    for i in range(n):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % n]
        ok &= (x2 - x1) * (y - y1) - (y2 - y1) * (x - x1) > 0
    return ok
