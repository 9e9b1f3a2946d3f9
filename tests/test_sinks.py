"""Sinks: GeoJSON, sorted tiled write, table routing, DDL generation."""

import json
import os

import pytest
from pyspark.sql import functions as F

from osmquadtree_geometry_spark import sinks


@pytest.fixture(scope="module")
def res(spark, docs_path):
    from osmquadtree_geometry_spark.config.minzoom import MinZoomSpec
    from osmquadtree_geometry_spark.pipeline import run_pipeline
    r = run_pipeline(spark, docs_path, minzoom=MinZoomSpec.default())
    r.points.cache().count()
    r.simple_polygons.cache().count()
    return r


def test_geojson_points(res):
    rows = sinks.geojson_features(res.points, "point").collect()
    f = json.loads(rows[0].feature)
    assert f["type"] == "Feature"
    assert f["geometry"]["type"] == "Point"
    lon, lat = f["geometry"]["coordinates"]
    assert -180 <= lon <= 180 and -90 <= lat <= 90


def test_geojson_flat_file(res, tmp_path):
    out = tmp_path / "points.geojson"
    sinks.write_geojson_flat(res.points.limit(20), "point", str(out))
    fc = json.loads(out.read_text())
    assert fc["type"] == "FeatureCollection"
    assert len(fc["features"]) == 20


def test_geojson_reversed_polygon(res):
    rows = {r.id: json.loads(r.feature) for r in
            sinks.geojson_features(res.simple_polygons, "simple_polygon")
            .collect()}
    # doc 1 way 1013 is reversed=true; its emitted ring must equal the
    # stored lonlats reversed
    row = res.simple_polygons.where(F.col("id") == 1013).first()
    coords = rows[1013]["geometry"]["coordinates"][0]
    exp = [[round(p.lon * 1e-7, 7), round(p.lat * 1e-7, 7)]
           for p in reversed(row.lonlats)]
    assert coords == exp


def test_sorted_write(res, tmp_path, spark):
    out = str(tmp_path / "tiles")
    sinks.write_sorted_tiles(res.points, out)
    back = spark.read.parquet(out)
    assert back.count() == res.points.count()
    # within each file partition, (tile, id) is sorted
    import glob
    import pyarrow.parquet as pq
    for f in glob.glob(os.path.join(out, "*.parquet")):
        t = pq.read_table(f, columns=["tile", "id"]).to_pandas()
        keys = list(zip(t["tile"], t["id"]))
        assert keys == sorted(keys)


def test_route_tables_extended_alloc_matrix(res):
    """Pin the reference alloc matrix (`postgresqloptions.rs:103-129`
    extended_alloc): every feature lands in exactly the reference's
    table set."""
    routed = sinks.route_tables(res.points, res.linestrings,
                                res.simple_polygons,
                                res.complicated_polygons, extended=True)
    assert set(routed) == {"planet_osm_point", "planet_osm_line",
                           "planet_osm_polygon", "planet_osm_highway",
                           "planet_osm_building", "planet_osm_boundary"}
    got = {}
    for t, df in routed.items():
        if "z_order" in df.columns:
            got[t] = {(r.id, r.z_order, tuple(sorted(r.tags.items())))
                      for r in df.select("id", "z_order", "tags").collect()}
        else:  # points carry no z_order
            got[t] = {(r.id, None, tuple(sorted(r.tags.items())))
                      for r in df.select("id", "tags").collect()}

    # linestrings: Some(z_order) -> highway ONLY, else line ONLY
    for r in res.linestrings.select("id", "z_order", "tags").collect():
        key = (r.id, r.z_order, tuple(sorted(r.tags.items())))
        if r.z_order is not None:
            assert key in got["planet_osm_highway"]
            assert key not in got["planet_osm_line"]
        else:
            assert key in got["planet_osm_line"]
            assert key not in got["planet_osm_highway"]
    # simple polygons: building != 'no' -> building ONLY, else polygon
    for r in res.simple_polygons.select("id", "z_order", "tags").collect():
        key = (r.id, r.z_order, tuple(sorted(r.tags.items())))
        if r.tags.get("building", "no") != "no":
            assert key in got["planet_osm_building"]
            assert key not in got["planet_osm_polygon"]
        else:
            assert key in got["planet_osm_polygon"]
    # complicated polygons: id flipped; boundary -> polygon AND boundary
    for r in res.complicated_polygons.select("id", "z_order", "tags").collect():
        key = (-r.id, r.z_order, tuple(sorted(r.tags.items())))
        if r.tags.get("building", "no") != "no":
            assert key in got["planet_osm_building"]
        elif r.tags.get("type") == "boundary":
            assert key in got["planet_osm_polygon"]
            assert key in got["planet_osm_boundary"]
        else:
            assert key in got["planet_osm_polygon"]
            assert key not in got["planet_osm_boundary"]
    # the fixture exercises the highway split (boundary relations are
    # covered by the synthetic matrix test below)
    assert got["planet_osm_highway"]


def test_route_tables_synthetic_matrix(spark):
    """Every row of the reference alloc matrix on hand-built rows,
    including the cases the scene fixtures don't produce (building:
    'no', type=boundary double-write)."""
    schema = ("doc_id string, id long, tags map<string,string>, "
              "z_order long, layer long, minzoom long, quadtree long, "
              "area double")
    def mk(rows):
        return spark.createDataFrame(
            [("d", i, t, z, None, None, 18, 1.0) for i, t, z in rows], schema)
    pts = mk([(1, {"amenity": "pub"}, None)])
    lines = mk([(2, {"highway": "primary"}, 330),
                (3, {"waterway": "stream"}, None)])
    sps = mk([(4, {"building": "yes"}, None),
              (5, {"building": "no", "landuse": "grass"}, None),
              (6, {"landuse": "grass"}, None)])
    cps = mk([(7, {"building": "house", "type": "multipolygon"}, None),
              (8, {"type": "boundary", "boundary": "administrative"}, None),
              (9, {"type": "multipolygon", "natural": "water"}, None)])
    routed = sinks.route_tables(pts, lines, sps, cps, extended=True)
    ids = {t: {r.id for r in df.select("id").collect()}
           for t, df in routed.items()}
    assert ids["planet_osm_point"] == {1}
    assert ids["planet_osm_highway"] == {2}      # Some(z_order) -> highway only
    assert ids["planet_osm_line"] == {3}
    assert ids["planet_osm_building"] == {4, -7}  # building != 'no'
    # building:'no' stays a plain polygon; boundary double-writes
    assert ids["planet_osm_polygon"] == {5, 6, -8, -9}
    assert ids["planet_osm_boundary"] == {-8}


def test_pack_tag_columns(res):
    """G15: style-driven dedicated text columns + hstore-style
    catch-all map (`prepcopy.rs:238-290`, `tablespec.rs:625-702`)."""
    from osmquadtree_geometry_spark.config.style import GeometryStyle
    style = GeometryStyle()
    cols = sinks.table_tag_columns(style)
    assert "name" in cols["point"] and "name" in cols["line"]
    # parent-tag keys appended to point, relation targets to line only
    for pk in style.parent_tags:
        assert pk in cols["point"] and pk not in cols["polygon"]
    for rs in style.relation_tag_spec:
        assert rs.target_key in cols["line"]
        assert rs.target_key not in cols["polygon"]
    packed = sinks.pack_tag_columns(res.points, cols["point"])
    rows = {r.osm_id: r for r in packed.collect()}
    orig = {r.id: r.tags for r in res.points.select("id", "tags").collect()}
    colset = set(cols["point"])
    for oid, r in rows.items():
        tags = orig[oid]
        for k, v in tags.items():
            if k in colset:
                assert getattr(r, k) == v      # dedicated column
                assert k not in r.tags         # not duplicated in hstore
            else:
                assert r.tags[k] == v          # catch-all map
    assert "osm_id" in packed.columns and "quadtree" in packed.columns


def test_geojson_multipolygon(res):
    rows = {r.id: json.loads(r.feature) for r in
            sinks.geojson_features(res.complicated_polygons,
                                   "complicated_polygon").collect()}
    assert rows
    found_hole = False
    for rid, f in rows.items():
        assert f["geometry"]["type"] == "MultiPolygon"
        parts = f["geometry"]["coordinates"]
        row = res.complicated_polygons.where(F.col("id") == rid).first()
        assert len(parts) == len(row.parts)
        for part, src in zip(parts, row.parts):
            assert len(part) == 1 + len(src.interiors)  # exterior + holes
            for ring in part:
                assert ring[0] == ring[-1]  # closed
            found_hole = found_hole or len(part) > 1
    assert found_hole  # donut scenes exercise interior rings


def test_geojson_tile_blocks(res, tmp_path):
    blocks = {r.tile: r for r in
              sinks.geojson_tile_blocks(res.points, "point").collect()}
    assert len(blocks) > 1
    total = sum(r.n_features for r in blocks.values())
    assert total == res.points.count()
    for r in list(blocks.values())[:5]:
        fc = json.loads(r.collection)
        assert fc["type"] == "FeatureCollection"
        assert len(fc["features"]) == r.n_features
        ids = [f["id"] for f in fc["features"]]
        assert ids == sorted(ids)
    # distributed per-tile writer: one directory per tile
    out = str(tmp_path / "gj_tiles")
    sinks.write_geojson_tiles(res.points, "point", out)
    dirs = [d for d in os.listdir(out) if d.startswith("tile=")]
    assert len(dirs) == len(blocks)


def test_pgcopy_roundtrip(spark, res, tmp_path):
    """Binary COPY encoding (S9/S10, `prepcopy.rs:40-77,695-745`):
    encode the packed point table to .copy files, parse the payload
    back with the independent decoder, compare values."""
    import glob
    from osmquadtree_geometry_spark import pgcopy
    from osmquadtree_geometry_spark.config.style import GeometryStyle
    packed = sinks.pack_tag_columns(
        res.points, sinks.table_tag_columns(GeometryStyle())["point"])
    cols = pgcopy.copy_columns_for(packed)
    out = str(tmp_path / "copy")
    pgcopy.write_pgcopy(packed, out)
    rows = []
    for f in sorted(glob.glob(os.path.join(out, "part-*.copy"))):
        rows += pgcopy.parse_copy_payload(open(f, "rb").read(), cols)
    exp = {r.osm_id: r.asDict() for r in packed.collect()}
    assert len(rows) == len(exp)
    names = [c for c, _ in cols]
    for vals in rows:
        d = dict(zip(names, vals))
        e = exp[d["osm_id"]]
        assert d["tags"] == dict(e["tags"])      # hstore catch-all
        assert d["quadtree"] == e["quadtree"]
        for k in names:
            if k in ("tags",):
                continue
            assert d[k] == e[k], (k, d[k], e[k])
    assert "FORMAT binary" in pgcopy.copy_sql("planet_osm_point", cols)


def test_pgcopy_all_types(spark):
    """Every typed encoder (int8/float8/bool/text/bytea/hstore) incl.
    NULLs round-trips through the wire format."""
    from osmquadtree_geometry_spark import pgcopy
    df = spark.createDataFrame(
        [(1, 2.5, True, "héllo", bytearray(b"\x01\x02\xff"),
          {"a": "1", "b": "x"}),
         (2, None, None, None, None, None)],
        "i long, f double, b boolean, s string, w binary, "
        "t map<string,string>")
    cols = pgcopy.copy_columns_for(df)
    enc = pgcopy.encode_copy_rows(df, cols).collect()
    payload = pgcopy.HEADER + b"".join(r.copy_row for r in enc) + pgcopy.TRAILER
    rows = sorted(pgcopy.parse_copy_payload(payload, cols))
    assert rows[0] == [1, 2.5, True, "héllo", b"\x01\x02\xff",
                       {"a": "1", "b": "x"}]
    assert rows[1] == [2, None, None, None, None, None]


def test_ddl():
    stmts = sinks.generate_ddl("planet_osm_point",
                               ["amenity", "highway", "name"],
                               lowzoom=[6, 10])
    sql = "\n".join(stmts)
    assert "CREATE TABLE public.planet_osm_point" in sql
    assert "USING gist (way)" in sql and "USING gin (tags)" in sql
    assert "planet_osm_point_z6" in sql and "minzoom <= 10" in sql
    v = sinks.union_compat_view(["planet_osm_point", "planet_osm_line"])
    assert "UNION ALL" in v


def test_executed_spark_ddl(res, spark, tmp_path):
    """S11 live round-trip (round-2 verdict Missing #3): write two
    geometry tables to parquet, EXECUTE the Spark view bank over
    them, and query the lowzoom + union views back from the catalog."""
    pp = str(tmp_path / "pts")
    lp = str(tmp_path / "lines")
    res.points.write.parquet(pp)
    res.linestrings.write.parquet(lp)
    n_p = res.points.count()
    n_l = res.linestrings.count()
    stmts = sinks.execute_spark_ddl(
        spark, {"osm_point": pp, "osm_line": lp}, lowzoom=[10])
    assert any("osm_point_z10" in s for s in stmts)
    assert spark.table("osm_point").count() == n_p
    # lowzoom view filters by minzoom
    z10 = spark.sql("SELECT * FROM osm_line_z10")
    assert z10.count() == res.linestrings.where(
        F.col("minzoom") <= 10).count()
    # union view spans both tables with the compat column set
    u = spark.table("planet_osm_all")
    assert u.columns == ["id", "tags", "quadtree"]
    assert u.count() == n_p + n_l


def test_repair_polygons_for_sink(res, spark):
    """prepcopy.rs:511-543 parity: invalid polygons are node-split
    into valid MultiPolygon WKB before the sink; valid ones pass
    through as one part."""
    import struct as st
    from osmquadtree_geometry_spark.operators.validity import (
        repair_polygons_for_sink, with_validity)
    v = with_validity(res.simple_polygons).select("id", "is_valid")
    out = repair_polygons_for_sink(res.simple_polygons)
    j = {r.id: r for r in out.join(v, "id").collect()}
    assert j  # fixture has polygons
    n_rep = 0
    for r in j.values():
        assert r.was_repaired == (not r.is_valid)
        n_rep += int(r.was_repaired)
        assert r.n_parts >= 1
        # WKB sanity: little-endian; 1-part collapses to Polygon(3),
        # multi-part stays MultiPolygon(6) — both SRID-flagged
        assert r.wkb[:1] == b"\x01"
        gtype = st.unpack("<I", r.wkb[1:5])[0]
        assert gtype == ((6 if r.n_parts > 1 else 3) + (32 << 24))
    # the invalid-polygon scenes guarantee repairs actually happen
    assert n_rep > 0
    # bowties split into two parts
    assert any(r.was_repaired and r.n_parts == 2 for r in j.values())


def test_read_geometry_filters(res, spark, tmp_path):
    """read_geometry_blocks parity (pack_geometry.rs:593-632): bbox /
    poly / max_minzoom filters over the written tiles, checked
    against a driver-side brute-force over the same rows."""
    import numpy as np
    from osmquadtree_geometry_spark.kernels import geomcalc
    from osmquadtree_geometry_spark.kernels import quadtree as qtk
    from osmquadtree_geometry_spark.sources import read_geometry
    out = str(tmp_path / "geom_tiles")
    sinks.write_sorted_tiles(res.points.select(
        "id", "lon", "lat", "minzoom", "quadtree", "tile"), out)
    allr = res.points.select("id", "lon", "lat", "minzoom", "tile").collect()
    # bbox around the first feature point, padded
    r0 = allr[0]
    bbox = (r0.lon - 10**6, r0.lat - 10**6, r0.lon + 10**6, r0.lat + 10**6)
    got = {r.id for r in read_geometry(spark, out, bbox=bbox).collect()}
    exp = {r.id for r in allr
           if bbox[0] <= r.lon <= bbox[2] and bbox[1] <= r.lat <= bbox[3]}
    assert got == exp and got
    # polygon filter: triangle inside the bbox
    plon = np.asarray([bbox[0], bbox[2], r0.lon, bbox[0]], np.int64)
    plat = np.asarray([bbox[1], bbox[1], bbox[3], bbox[1]], np.int64)
    gotp = {r.id for r in read_geometry(spark, out,
                                        poly=(plon, plat)).collect()}
    expp = {r.id for r in allr if geomcalc.point_in_poly(
        plon, plat, r.lon, r.lat)}
    assert gotp == expp
    assert gotp <= got
    # depth pruning: every surviving tile is at depth <= 6 and the
    # feature minzoom respects the cap
    shallow = read_geometry(spark, out, max_minzoom=6).collect()
    for r in shallow:
        if r.tile >= 0:
            assert int(qtk.depth(np.asarray([r.tile]))[0]) <= 6
        assert r.minzoom is None or r.minzoom <= 6


def test_geojson_flat_no_collect_byte_identical(res, tmp_path):
    """Round-3 verdict Next #7: the streamed part-file writer must be
    byte-identical to the old in-memory construction."""
    out = tmp_path / "lines.geojson"
    sinks.write_geojson_flat(res.linestrings, "linestring", str(out))
    feats = [r.feature for r in
             sinks.geojson_features(res.linestrings, "linestring")
             .orderBy("id").collect()]
    exp = ('{"type": "FeatureCollection", "features": [\n'
           + ",\n".join(feats) + "\n]}\n")
    assert out.read_text() == exp
