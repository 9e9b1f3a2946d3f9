"""G13 validity/simplify kernels (no Spark needed)."""

import numpy as np
import pytest

from osmquadtree_geometry_spark.kernels import validity as V
from osmquadtree_geometry_spark.kernels.geomcalc import line_length, point_in_poly, ring_area

SQ_LON = np.asarray([0, 10000000, 10000000, 0, 0])
SQ_LAT = np.asarray([0, 0, 10000000, 10000000, 0])


def test_is_valid_ring():
    assert V.is_valid_ring(SQ_LON, SQ_LAT)
    # unclosed
    assert not V.is_valid_ring(SQ_LON[:-1], SQ_LAT[:-1])
    # bowtie self-intersection
    bow_lon = np.asarray([0, 10, 0, 10, 0])
    bow_lat = np.asarray([0, 10, 10, 0, 0])
    assert not V.is_valid_ring(bow_lon, bow_lat)
    # repeated point
    rep_lon = np.asarray([0, 10, 10, 10, 0, 0])
    rep_lat = np.asarray([0, 0, 0, 10, 10, 0])
    assert not V.is_valid_ring(rep_lon, rep_lat)


def test_make_valid_repairs():
    # repeated point + unclosed -> repaired
    lon = np.asarray([0, 10000000, 10000000, 10000000, 0])
    lat = np.asarray([0, 0, 0, 10000000, 10000000])
    rl, rt = V.make_valid_ring(lon, lat)
    assert V.is_valid_ring(rl, rt)
    # asymmetric self-intersecting ring (non-zero area) ->
    # NotImplementedError (documented GEOS stub); the symmetric bowtie
    # short-circuits at the zero-area guard instead
    with pytest.raises(NotImplementedError):
        V.make_valid_ring(np.asarray([0, 10, 12, 0, 0]),
                          np.asarray([0, 8, 0, 10, 0]))
    rl, rt = V.make_valid_ring(np.asarray([0, 10, 0, 10, 0]),
                               np.asarray([0, 10, 10, 0, 0]))
    assert len(rl) == 0  # zero-area bowtie -> dropped
    # degenerate -> empty
    rl, rt = V.make_valid_ring(np.asarray([0, 10, 0]), np.asarray([0, 0, 0]))
    assert len(rl) == 0


def test_simplify_line():
    # nearly-collinear middle point gets dropped at tolerance
    lon = np.asarray([0, 5000000, 10000000])
    lat = np.asarray([0, 100, 0])  # 100 fixed-point ~ 1cm
    sl, st = V.simplify(lon, lat, tolerance_m=10.0)
    assert len(sl) == 2
    # below tolerance it stays
    sl, st = V.simplify(lon, lat, tolerance_m=0.001)
    assert len(sl) == 3
    # endpoints always preserved
    assert sl[0] == 0 and sl[-1] == 10000000


def test_simplify_ring_stays_closed():
    # octagon-ish ring with a tiny jitter vertex
    ang = np.linspace(0, 2 * np.pi, 9)
    lon = (np.cos(ang) * 1e6).astype(np.int64)
    lat = (np.sin(ang) * 1e6).astype(np.int64)
    lon[-1], lat[-1] = lon[0], lat[0]
    sl, st = V.simplify(lon, lat, tolerance_m=1.0)
    assert sl[0] == sl[-1] and st[0] == st[-1]
    assert len(sl) >= 4
    # area roughly preserved at small tolerance
    assert abs(ring_area(sl, st)) == pytest.approx(abs(ring_area(lon, lat)), rel=0.05)


def test_point_on_surface():
    x, y = V.point_on_surface(SQ_LON, SQ_LAT)
    assert point_in_poly(SQ_LON, SQ_LAT, x, y)
    # concave C-shape: centroid would fall outside; pos must be inside
    c_lon = np.asarray([0, 40, 40, 10, 10, 40, 40, 0, 0]) * 1000000
    c_lat = np.asarray([0, 0, 10, 10, 30, 30, 40, 40, 0]) * 1000000
    x, y = V.point_on_surface(c_lon, c_lat)
    assert point_in_poly(c_lon, c_lat, x, y)


def test_boundary():
    rings = V.boundary([[(SQ_LON, SQ_LAT), (SQ_LON // 2, SQ_LAT // 2)]])
    assert len(rings) == 2
    assert line_length(*rings[0]) > 0
