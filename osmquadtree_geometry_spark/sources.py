"""Query the produced geometry output — the reference's
``read_geometry_blocks`` entry point (`pack_geometry.rs:593-632`):
parse filter -> GeometryFilter (Null/Bbox/Poly, `:498-519`) ->
``get_file_locs_max_depth`` prunes tiles by bbox AND tree depth <=
max_minzoom (`:612`) -> per-block decode with a per-feature predicate
(`:530-585`).

Spark-first equivalent: all three pruning layers are declarative —

  * tile pruning: ``tile`` membership in the bbox's ancestor/self
    cover set, a literal IN-list (partition/row-group pruning via
    min/max stats on the (tile, id)-sorted layout of
    ``write_sorted_tiles``);
  * depth pruning: ``depth(tile) <= max_minzoom`` as arithmetic SQL
    plus the per-feature ``minzoom`` filter;
  * feature predicate: bbox bounds pushed to the parquet scan
    (PushedFilters); the Poly filter adds a vectorized pnpoly refine
    over the bbox survivors (exact, `position.rs:284-326`).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .kernels import geomcalc
from .kernels import quadtree as qtk
from .kernels.quadtree import sql_qt_depth


def _bbox_tiles(bbox: tuple[int, int, int, int], max_depth: int) -> list[int]:
    """All tiles (any depth <= max_depth) that can hold a feature
    overlapping the bbox: the bbox's cover cells per depth plus their
    ancestors — mirrors get_file_locs' tree walk as a flat IN-list."""
    minlon, minlat, maxlon, maxlat = (int(v) for v in bbox)
    out: set[int] = {-1}
    for d in range(0, max_depth + 1):
        qa = qtk.calculate_point(np.asarray([minlon]), np.asarray([minlat]), d)
        qb = qtk.calculate_point(np.asarray([maxlon]), np.asarray([maxlat]), d)
        ax, ay, _ = qtk.xyz(qa)
        bx, by, _ = qtk.xyz(qb)
        x0, x1 = min(ax[0], bx[0]), max(ax[0], bx[0])
        y0, y1 = min(ay[0], by[0]), max(ay[0], by[0])
        xs, ys = np.meshgrid(np.arange(x0, x1 + 1), np.arange(y0, y1 + 1))
        out.update(qtk.from_tile(xs.ravel(), ys.ravel(), d).tolist())
    return sorted(out)


def parse_poly_file(path: str) -> list[tuple[np.ndarray, np.ndarray]]:
    """Parse an osmosis-format ``.poly`` file into closed int-1e-7
    rings — the reference accepts the same files for its Poly filter
    (`pack_geometry.rs:498-519` via osmquadtree's ``read_filter``).

    Format: first line file name; each section = a name line, then
    "lon lat" float-degree pairs, terminated by ``END``; the file ends
    with a final ``END``.  Hole sections (name prefixed ``!``) are
    rejected explicitly rather than silently mis-filtered."""
    rings: list[tuple[np.ndarray, np.ndarray]] = []
    with open(path) as f:
        lines = [ln.strip() for ln in f]
    i = 1  # skip the file-name header line
    while i < len(lines):
        name = lines[i]
        if name == "END" or name == "":
            i += 1
            continue
        if name.startswith("!"):
            raise ValueError(
                f"{path}: hole section {name!r} not supported")
        i += 1
        lon, lat = [], []
        while i < len(lines) and lines[i] != "END":
            if lines[i]:
                a, b = lines[i].split()[:2]
                lon.append(int(round(float(a) * 1e7)))
                lat.append(int(round(float(b) * 1e7)))
            i += 1
        i += 1  # consume section END
        if len(lon) >= 3:
            if (lon[0], lat[0]) != (lon[-1], lat[-1]):
                lon.append(lon[0])
                lat.append(lat[0])
            rings.append((np.asarray(lon, np.int64),
                          np.asarray(lat, np.int64)))
    if not rings:
        raise ValueError(f"{path}: no polygon sections found")
    return rings


def read_feature_tables(spark: SparkSession, out_dir: str):
    """Open a :func:`osmquadtree_geometry_spark.sinks.
    write_feature_tables` layout as a ``PipelineResult`` of parquet
    scans — every downstream query (spatial joins, GeoJSON emitters,
    counts) runs against the WRITTEN layout with filter/column
    pushdown instead of re-executing the live pipeline, mirroring the
    reference's read_geometry_blocks over its produced geometry file
    (`pack_geometry.rs:593-632`).

    The per-type linestrings/simple_polygons views are geom_type
    filters over the fused ``way_features`` scan (predicate reaches
    the parquet reader)."""
    import os

    from .operators.makegeoms import split_way_features
    from .pipeline import PipelineResult

    from .tableio import read_table, table_exists

    def rd(name: str) -> DataFrame | None:
        p = os.path.join(out_dir, name)
        return read_table(spark, p) if table_exists(spark, p) else None

    wf = rd("way_features")
    if wf is not None:
        lines, spolys = split_way_features(wf)
    else:
        lines, spolys = rd("linestrings"), rd("simple_polygons")
    media = rd("media")
    spatial = {name: t for name in ("points_cells", "poly_cover")
               if (t := rd(name)) is not None}
    meta_path = os.path.join(out_dir, "spatial_index_meta.json")
    if os.path.exists(meta_path):
        import json
        with open(meta_path) as fh:
            spatial["meta"] = json.load(fh)
    return PipelineResult(
        points=rd("points"), linestrings=lines, simple_polygons=spolys,
        complicated_polygons=rd("complicated_polygons"),
        errors=rd("errors"),
        decoded={"media": media} if media is not None else {},
        way_features=wf, spatial_index=spatial)


def read_geometry(spark: SparkSession, path: str,
                  bbox: tuple[int, int, int, int] | None = None,
                  poly: tuple[np.ndarray, np.ndarray] | None = None,
                  max_minzoom: int | None = None,
                  tile_depth: int = 8) -> DataFrame:
    """``read_geometry_blocks`` equivalent over a
    ``write_sorted_tiles`` output with (lon, lat) point features.
    ``poly`` implies its bbox as the coarse filter; the exact pnpoly
    refine runs only on bbox survivors (Arrow-batched)."""
    from .tableio import read_table
    df = read_table(spark, path)
    if max_minzoom is not None:
        df = df.where(F.expr(sql_qt_depth("tile")) <= max_minzoom)
        if "minzoom" in df.columns:
            df = df.where(F.col("minzoom") <= max_minzoom)
    if poly is not None and bbox is None:
        plon, plat = poly
        bbox = (int(np.min(plon)), int(np.min(plat)),
                int(np.max(plon)), int(np.max(plat)))
    if bbox is not None:
        tiles = _bbox_tiles(bbox, tile_depth)
        df = df.where(F.col("tile").isin(tiles))
        df = df.where((F.col("lon") >= bbox[0]) & (F.col("lon") <= bbox[2])
                      & (F.col("lat") >= bbox[1]) & (F.col("lat") <= bbox[3]))
    if poly is not None:
        plon = np.asarray(poly[0], np.int64)
        plat = np.asarray(poly[1], np.int64)

        @F.pandas_udf(T.BooleanType())
        def inside(lon: pd.Series, lat: pd.Series) -> pd.Series:
            return pd.Series(geomcalc.points_in_ring(
                plon, plat, lon.to_numpy(np.int64), lat.to_numpy(np.int64)))

        df = df.where(inside("lon", "lat"))
    return df
