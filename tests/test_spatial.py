"""Spatial query layer tests: pnpoly join, kNN, raster↔vector, clip."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osmquadtree_geometry_spark.kernels import geomcalc, quadtree as qtk
from osmquadtree_geometry_spark.spatial import joins


@pytest.fixture(scope="module")
def geo(spark, docs_path):
    from osmquadtree_geometry_spark.pipeline import run_pipeline
    res = run_pipeline(spark, docs_path, with_tiles=False)
    out = {
        "points": res.points.cache(),
        "lines": res.linestrings.cache(),
        "polys": res.simple_polygons.cache(),
        "media": res.decoded["media"].cache(),
    }
    for v in out.values():
        v.count()
    return out


def test_point_in_polygon_join(spark, geo):
    got = joins.point_in_polygon_join(geo["points"], geo["polys"],
                                      cell_depth=10).collect()
    pairs = {(r.point_id, r.polygon_id) for r in got}
    # brute-force oracle over the same data
    pts = geo["points"].select("id", "lon", "lat").collect()
    polys = geo["polys"].select("id", "lonlats").collect()
    expected = set()
    for pl in polys:
        rlon = np.asarray([p.lon for p in pl.lonlats], np.int64)
        rlat = np.asarray([p.lat for p in pl.lonlats], np.int64)
        for pt in pts:
            if geomcalc.point_in_poly(rlon, rlat, pt.lon, pt.lat):
                expected.add((pt.id, pl.id))
    assert pairs == expected
    assert len(expected) > 0  # fixtures do contain points inside polygons


def test_knn_join(spark, geo):
    pts = geo["points"]
    got = joins.knn_join(pts, pts, k=3, cell_depth=6, max_rings=2)
    rows = got.collect()
    assert rows, "kNN returned nothing"
    # per-query: at most k, sorted distances, no self matches
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
        assert r.query_id != r.target_id
    for q, rr in by_q.items():
        assert len(rr) <= 3
    # oracle for one dense query: scene_points doc 0 node 1 (cluster of 6)
    sample = [r for r in rows if r.query_id == 1]
    if sample:
        all_pts = {r.id: (r.lon, r.lat) for r in pts.select("id", "lon", "lat").collect()}
        qlon, qlat = all_pts[1]
        import math
        def merc_dist(a, b):
            ax = round(a[0] * 1e-7 * 20037508.342789244 / 180.0, 2)
            ay = round(math.log(math.tan(math.pi/4 + math.radians(a[1]*1e-7)/2))/math.pi*20037508.342789244, 2)
            bx = round(b[0] * 1e-7 * 20037508.342789244 / 180.0, 2)
            by = round(math.log(math.tan(math.pi/4 + math.radians(b[1]*1e-7)/2))/math.pi*20037508.342789244, 2)
            return math.hypot(ax - bx, ay - by)
        dists = sorted((merc_dist((qlon, qlat), v), k)
                       for k, v in all_pts.items() if k != 1)
        got_ids = [r.target_id for r in sorted(sample, key=lambda r: (r.dist, r.target_id))]
        exp_ids = [k for _, k in dists[:3]]
        assert got_ids == exp_ids


def test_raster_vector_join(spark, geo):
    got = joins.raster_vector_join(geo["media"], geo["points"])
    rows = got.collect()
    assert rows, "raster-vector join empty"
    # every pair really overlaps (ancestor either way)
    for r in rows[:50]:
        # recompute tile cell
        z, x, y = (int(v) for v in r.tile.split("/"))
        tc = int(qtk.from_tile(np.asarray([x]), np.asarray([y]), z)[0])
        a = qtk.is_parent(np.asarray([tc]), np.asarray([r.quadtree]))[0]
        b = qtk.is_parent(np.asarray([r.quadtree]), np.asarray([tc]))[0]
        assert a or b
    # scene_media_join (doc 9): fountain node 9001 overlaps its z14 tile
    assert any(r.feature_id == 9001 for r in rows)


def test_clip_lines_to_tiles(spark, geo):
    # scene_tile_boundary (doc 7): trunk way 7010 spans > one z12 tile
    lines = geo["lines"].where(F.col("id") == 7010)
    parts = joins.clip_lines_to_tiles(lines, tile_depth=12).collect()
    assert len(parts) >= 2, "long line should split across z12 tiles"
    orig = lines.first()
    total_len = geomcalc.line_length(
        np.asarray([p.lon for p in orig.lonlats]),
        np.asarray([p.lat for p in orig.lonlats]))
    clip_len = 0.0
    for r in parts:
        clip_len += geomcalc.line_length(
            np.asarray([p.lon for p in r.lonlats]),
            np.asarray([p.lat for p in r.lonlats]))
        # every part stays inside its tile bbox
        b = qtk.tile_bounds(np.asarray([r.cell]))
        for p in r.lonlats:
            assert b[0][0] - 1 <= p.lon <= b[2][0] + 1
            assert b[1][0] - 1 <= p.lat <= b[3][0] + 1
    assert clip_len == pytest.approx(total_len, rel=0.001)
