"""Geometry validation / simplification kernels (G13).

The reference wraps GEOS via FFI (`postgresql/geosgeometry.rs:83-266`):
``is_valid``, ``make_valid`` (polygons), ``point_on_surface``,
``boundary``, ``simplify`` (topology-preserving).  GEOS/shapely is not
in this container, so these are native numpy implementations of the
same operations:

  * ``is_valid_ring``: closed, >= 4 points, no self-intersection, no
    repeated consecutive points, non-zero area.
  * ``simplify``: Douglas–Peucker with a metre tolerance (computed in
    2dp mercator, matching the reference's ST_SIMPLIFY usage for
    lowzoom tables `tablespec.rs:336`).  Endpoint-preserving; rings
    keep first==last.
  * ``point_on_surface``: a representative interior point (midpoint of
    the widest pnpoly crossing interval on the centroid scanline — the
    standard PostGIS approach).
  * ``boundary``: polygon -> its rings as linestrings.
  * ``make_valid``: PARTIAL — repairs the repairs GEOS would do
    cheaply (drop repeated points, close unclosed rings, drop
    degenerate (<4 pt / zero-area) rings); full self-intersection
    node-splitting requires a computational-geometry stack and raises
    ``NotImplementedError`` (documented stub per round-1 environment).
"""

from __future__ import annotations

import numpy as np

from .geomcalc import ring_area, segment_intersects
from .mercator import forward


def dedupe_consecutive(lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    lon = np.asarray(lon, np.int64)
    lat = np.asarray(lat, np.int64)
    if len(lon) == 0:
        return lon, lat
    keep = np.ones(len(lon), dtype=bool)
    keep[1:] = (np.diff(lon) != 0) | (np.diff(lat) != 0)
    return lon[keep], lat[keep]


def ring_self_intersects(lon: np.ndarray, lat: np.ndarray) -> bool:
    """O(n²) non-adjacent segment intersection test (the reference's
    own intersection primitives are O(n·m) too, `position.rs:251-269`)."""
    n = len(lon) - 1  # closed ring: last == first
    for i in range(n):
        for j in range(i + 2, n):
            if i == 0 and j == n - 1:
                continue  # adjacent through the closure
            if segment_intersects((lon[i], lat[i]), (lon[i + 1], lat[i + 1]),
                                  (lon[j], lat[j]), (lon[j + 1], lat[j + 1])):
                return True
    return False


def is_valid_ring(lon: np.ndarray, lat: np.ndarray) -> bool:
    lon = np.asarray(lon, np.int64)
    lat = np.asarray(lat, np.int64)
    if len(lon) < 4:
        return False
    if lon[0] != lon[-1] or lat[0] != lat[-1]:
        return False
    dl, dt = dedupe_consecutive(lon, lat)
    if len(dl) != len(lon):
        return False
    if ring_area(lon, lat) == 0.0:
        return False
    return not ring_self_intersects(lon, lat)


def make_valid_ring(lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Cheap repairs only (see module docstring); raises on
    self-intersecting input that would need node splitting."""
    lon, lat = dedupe_consecutive(np.asarray(lon, np.int64),
                                  np.asarray(lat, np.int64))
    if len(lon) and (lon[0] != lon[-1] or lat[0] != lat[-1]):
        lon = np.append(lon, lon[0])
        lat = np.append(lat, lat[0])
    if len(lon) < 4 or ring_area(lon, lat) == 0.0:
        return np.asarray([], np.int64), np.asarray([], np.int64)
    if ring_self_intersects(lon, lat):
        raise NotImplementedError(
            "full make_valid (self-intersection node splitting) requires "
            "GEOS, absent in this container — see geosgeometry.rs:209-226")
    return lon, lat


def simplify(lon: np.ndarray, lat: np.ndarray, tolerance_m: float) -> tuple[np.ndarray, np.ndarray]:
    """Douglas–Peucker in 2dp-mercator metres, endpoint-preserving.
    Closed rings are simplified on their open form and re-closed; a
    ring collapsing below 4 points returns empty (topology guard)."""
    lon = np.asarray(lon, np.int64)
    lat = np.asarray(lat, np.int64)
    closed = len(lon) > 1 and lon[0] == lon[-1] and lat[0] == lat[-1]
    wl, wt = (lon[:-1], lat[:-1]) if closed else (lon, lat)
    if len(wl) <= 2:
        return lon, lat
    x, y = forward(wl, wt)

    keep = np.zeros(len(wl), dtype=bool)
    keep[0] = keep[-1] = True
    stack = [(0, len(wl) - 1)]
    while stack:
        a, b = stack.pop()
        if b - a < 2:
            continue
        ax, ay, bx, by = x[a], y[a], x[b], y[b]
        seg = np.hypot(bx - ax, by - ay)
        px, py = x[a + 1:b], y[a + 1:b]
        if seg == 0:
            d = np.hypot(px - ax, py - ay)
        else:
            d = np.abs((bx - ax) * (ay - py) - (ax - px) * (by - ay)) / seg
        imax = int(np.argmax(d))
        if d[imax] > tolerance_m:
            k = a + 1 + imax
            keep[k] = True
            stack.append((a, k))
            stack.append((k, b))
    sl, st = wl[keep], wt[keep]
    if closed:
        if len(sl) < 3:
            return np.asarray([], np.int64), np.asarray([], np.int64)
        sl = np.append(sl, sl[0])
        st = np.append(st, st[0])
    return sl, st


def point_on_surface(lon: np.ndarray, lat: np.ndarray) -> tuple[int, int]:
    """Representative interior point: midpoint of the widest crossing
    interval on the horizontal scanline through the bbox-centre
    latitude (PostGIS ST_PointOnSurface approach)."""
    lon = np.asarray(lon, np.float64)
    lat = np.asarray(lat, np.float64)
    cy = (lat.min() + lat.max()) / 2.0
    xs = []
    for i in range(len(lon) - 1):
        y0, y1 = lat[i], lat[i + 1]
        if (y0 > cy) != (y1 > cy):
            t = (cy - y0) / (y1 - y0)
            xs.append(lon[i] + t * (lon[i + 1] - lon[i]))
    if not xs:
        return int(round(lon.mean())), int(round(cy))
    xs.sort()
    best = 0
    bi = 0
    for i in range(0, len(xs) - 1, 2):
        w = xs[i + 1] - xs[i]
        if w > best:
            best = w
            bi = i
    return int(round((xs[bi] + xs[bi + 1]) / 2.0)), int(round(cy))


def boundary(parts: list[list[tuple[np.ndarray, np.ndarray]]]) -> list[tuple[np.ndarray, np.ndarray]]:
    """Polygon/multipolygon boundary: every ring as a linestring
    (geosgeometry.rs boundary op)."""
    out = []
    for rings in parts:
        out.extend(rings)
    return out
