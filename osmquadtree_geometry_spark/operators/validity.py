"""G13 as DataFrame stages: validity flags, topology-guarded
simplification for lowzoom derived tables (T5,
`tablespec.rs:312-391` + `geosgeometry.rs:228-244`), representative
points.

All Arrow-batched over the lonlats array column (numpy kernels)."""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernels import validity as V


def _iter_lonlat(col):
    lon = np.fromiter((p["lon"] for p in col), np.int64)
    lat = np.fromiter((p["lat"] for p in col), np.int64)
    return lon, lat


def with_validity(polygons: DataFrame) -> DataFrame:
    """Adds ``is_valid`` for simple polygons (ring test)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["is_valid"] = [
                bool(V.is_valid_ring(*_iter_lonlat(ll))) for ll in pdf["lonlats"]]
            yield pdf

    # NB: StructType.add mutates the DataFrame's cached schema —
    # always build a fresh StructType
    from pyspark.sql import types as T
    schema = T.StructType(list(polygons.schema.fields)
                          + [T.StructField("is_valid", T.BooleanType())])
    return polygons.mapInPandas(run, schema)


def simplify_lines(lines: DataFrame, tolerance_m: float) -> DataFrame:
    """Simplified copy of a linestring table (lowzoom path); keeps the
    original columns, replaces lonlats, adds n_points_before/after."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ll = []
            nb, na = [], []
            for ll in pdf["lonlats"]:
                lon, lat = _iter_lonlat(ll)
                sl, st = V.simplify(lon, lat, tolerance_m)
                nb.append(len(lon))
                na.append(len(sl))
                out_ll.append([{"lon": int(a), "lat": int(b)}
                               for a, b in zip(sl, st)])
            pdf = pdf.copy()
            pdf["lonlats"] = out_ll
            pdf["n_points_before"] = nb
            pdf["n_points_after"] = na
            yield pdf

    from pyspark.sql import types as T
    schema = T.StructType(list(lines.schema.fields)
                          + [T.StructField("n_points_before", T.IntegerType()),
                             T.StructField("n_points_after", T.IntegerType())])
    return lines.mapInPandas(run, schema)


def lowzoom_table(lines: DataFrame, zoom: int,
                  tolerance_m: float | None = None) -> DataFrame:
    """T5: minzoom-filtered derived table with optional simplification
    (tolerance defaults to the zoom's pixel resolution, as the
    reference's lowzoom views use ST_SIMPLIFY at tile resolution)."""
    from ..kernels.mercator import EARTH_WIDTH
    if tolerance_m is None:
        tolerance_m = EARTH_WIDTH * 2.0 / (2 ** zoom) / 256.0
    filtered = lines.where(F.col("minzoom") <= zoom)
    return simplify_lines(filtered, tolerance_m)


def with_point_on_surface(polygons: DataFrame) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            xs, ys = [], []
            for ll in pdf["lonlats"]:
                x, y = V.point_on_surface(*_iter_lonlat(ll))
                xs.append(x)
                ys.append(y)
            pdf = pdf.copy()
            pdf["pos_lon"] = xs
            pdf["pos_lat"] = ys
            yield pdf

    from pyspark.sql import types as T
    schema = T.StructType(list(polygons.schema.fields)
                          + [T.StructField("pos_lon", T.IntegerType()),
                             T.StructField("pos_lat", T.IntegerType())])
    return polygons.mapInPandas(run, schema)
