"""Output sinks — SURVEY §2.1 rows S5-S11 re-expressed Spark-first.

  * GeoJSON writers (S6, `process_geometry.rs:343-388`): features as
    JSON strings built JVM-side (``to_json``), written one
    FeatureCollection per run (flat) or grouped per tile.
  * Sorted tiled parquet (S8, `tempfile.rs:196-332`): global
    tile-range repartition + in-partition sort; Spark's external
    shuffle/sort replaces the reference's size-tiered temp files.
  * Table routing + DDL/view generation (S9-S11,
    `postgresql/tablespec.rs:81-391`): osm2pgsql-style point / line /
    polygon / roads routing, CREATE TABLE / VIEW statements emitted as
    SQL strings (a Postgres sink would execute them; Spark SQL can
    `CREATE OR REPLACE VIEW` directly against the written tables).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _props_json(tags: str = "tags") -> str:
    return f"to_json({tags})"


def geojson_features(df: DataFrame, geom_type: str) -> DataFrame:
    """(id, feature json string) rows; geometry per type.
    Coordinate arrays are [lon, lat] in degrees (1e-7 fixed-point /
    1e7), matching the reference's GeoJSON emitters
    (`pointgeometry.rs:89-129`)."""
    deg = "round(%s * 1e-7, 7)"
    if geom_type == "point":
        geometry = (f"named_struct('type', 'Point', 'coordinates', "
                    f"array({deg % 'lon'}, {deg % 'lat'}))")
    elif geom_type == "linestring":
        geometry = (f"named_struct('type', 'LineString', 'coordinates', "
                    f"transform(lonlats, p -> array({deg % 'p.lon'}, {deg % 'p.lat'})))")
    elif geom_type == "simple_polygon":
        # reversed polygons emit their coordinate list reversed
        # (simplepolygongeometry.rs:12-27)
        coords = ("case when reversed then reverse(lonlats) else lonlats end")
        geometry = (f"named_struct('type', 'Polygon', 'coordinates', "
                    f"array(transform({coords}, p -> array({deg % 'p.lon'}, {deg % 'p.lat'}))))")
    else:
        raise ValueError(geom_type)
    feature = (f"named_struct("
               f"'type', 'Feature', 'id', id, "
               f"'properties', {_props_json()}, "
               f"'geometry', {geometry})")
    return df.select("id", F.expr(f"to_json({feature})").alias("feature"))


def write_geojson_flat(df: DataFrame, geom_type: str, out_path: str) -> None:
    """One FeatureCollection file (coalesced — for export-sized data,
    like the reference's single-file writer)."""
    feats = geojson_features(df, geom_type).orderBy("id")
    rows = [r.feature for r in feats.collect()]
    import json
    with open(out_path, "w") as f:
        f.write('{"type": "FeatureCollection", "features": [\n')
        f.write(",\n".join(rows))
        f.write("\n]}\n")


def write_sorted_tiles(df: DataFrame, out_path: str) -> None:
    """S8: tile-range partitioned, (tile, id)-sorted parquet."""
    (df.repartitionByRange("tile", "id")
       .sortWithinPartitions("tile", "id")
       .write.mode("overwrite").parquet(out_path))


# ---------------------------------------------------------------------------
# osm2pgsql-style table routing (S9/G16, postgresqloptions.rs:65-129)
# ---------------------------------------------------------------------------

def route_tables(points: DataFrame, lines: DataFrame,
                 simple_polygons: DataFrame,
                 complicated_polygons: DataFrame,
                 extended: bool = False) -> dict[str, DataFrame]:
    """Allocate features to output tables.  Base alloc: point / line /
    polygon (simple + complicated unioned on common columns).
    Extended alloc adds highway/roads split (z_order ways) and a
    building split (`postgresqloptions.rs:87-129`)."""
    common = ["doc_id", "id", "tags", "z_order", "layer", "minzoom",
              "quadtree", "area"]
    sp = simple_polygons.withColumn("area_signed", F.col("area")).select(
        *[c for c in common if c != "area"], "area")
    cp = complicated_polygons.select(
        *[c for c in common if c != "area"],
        # multipolygon ids are NEGATED in the postgres output
        # (prepcopy.rs:620, flip_id)
        "area").withColumn("id", -F.col("id"))
    polygons = sp.unionByName(cp)
    out = {"planet_osm_point": points,
           "planet_osm_line": lines,
           "planet_osm_polygon": polygons}
    if extended:
        roads = lines.where(F.col("z_order").isNotNull()
                            & (F.col("z_order") >= 200))
        buildings = polygons.where(F.expr("tags['building'] is not null"))
        out["planet_osm_roads"] = roads
        out["planet_osm_building"] = buildings
        out["planet_osm_polygon"] = polygons.where(
            F.expr("tags['building'] is null"))
    return out


def generate_ddl(table: str, tag_columns: list[str],
                 geom_type: str = "geometry", lowzoom: list[int] | None = None,
                 schema: str = "public") -> list[str]:
    """DDL/index/view statement bank (S11, `tablespec.rs:81-391`):
    CREATE TABLE with style-driven tag columns + hstore-like catch-all,
    gist/gin indexes, json view, and lowzoom filtered views with
    simplification hooks."""
    cols = ", ".join([f'"{c}" text' for c in tag_columns])
    stmts = [
        f'DROP TABLE IF EXISTS {schema}.{table} CASCADE',
        f'CREATE TABLE {schema}.{table} (osm_id bigint, {cols}, '
        f'tags hstore, layer bigint, z_order bigint, minzoom bigint, '
        f'quadtree bigint, way {geom_type})',
        f'CREATE INDEX {table}_way_idx ON {schema}.{table} USING gist (way)',
        f'CREATE INDEX {table}_tags_idx ON {schema}.{table} USING gin (tags)',
        f'CREATE VIEW {schema}.{table}_json AS SELECT osm_id, '
        f'hstore_to_json(tags) AS tags, way FROM {schema}.{table}',
    ]
    for z in (lowzoom or []):
        stmts.append(
            f'CREATE VIEW {schema}.{table}_z{z} AS SELECT * FROM '
            f'{schema}.{table} WHERE minzoom <= {z}')
    return stmts


def union_compat_view(tables: list[str], view: str = "planet_osm_all",
                      schema: str = "public") -> str:
    """UNION ALL compat view (T4, `tablespec.rs:279-284`)."""
    union = " UNION ALL ".join(
        f"SELECT osm_id, tags, way FROM {schema}.{t}" for t in tables)
    return f"CREATE VIEW {schema}.{view} AS {union}"
