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


def test_route_tables(res):
    routed = sinks.route_tables(res.points, res.linestrings,
                                res.simple_polygons,
                                res.complicated_polygons, extended=True)
    assert set(routed) == {"planet_osm_point", "planet_osm_line",
                           "planet_osm_polygon", "planet_osm_roads",
                           "planet_osm_building"}
    # multipolygon ids are negated in the polygon table (flip_id)
    poly_ids = {r.id for r in routed["planet_osm_polygon"]
                .select("id").collect()}
    build_ids = {r.id for r in routed["planet_osm_building"]
                 .select("id").collect()}
    cp_ids = {r.id for r in res.complicated_polygons.select("id").collect()}
    assert any(-i in (poly_ids | build_ids) for i in cp_ids)
    # roads = z_order >= 200 lines only
    for r in routed["planet_osm_roads"].select("z_order").collect():
        assert r.z_order >= 200


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
