"""G14 — FindMinZoom as a Spark stage.

Reference: `/root/reference/src/minzoom.rs:141-238`.  Lookup is a
compiled map-literal SQL expression (no shuffle, no broadcast join —
the spec is a few hundred entries); matched features get
``quadtree = quadtree.round(minzoom)`` via the arithmetic
``sql_round_qt`` expression; with ``max_minzoom`` set, unmatched /
too-deep features are dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config.minzoom import MinZoomSpec
from ..kernels.quadtree import sql_round_qt


def _apply(df: DataFrame, mz_expr: str, drop_unmatched: bool) -> DataFrame:
    out = (df.withColumn("minzoom", F.expr(mz_expr))
           .withColumn("quadtree",
                       F.when(F.col("minzoom").isNotNull(),
                              F.expr(sql_round_qt("quadtree", "minzoom")))
                       .otherwise(F.col("quadtree"))))
    if drop_unmatched:
        out = out.where(F.col("minzoom").isNotNull())
    return out


def find_minzoom_fused(way_features: DataFrame,
                       spec: MinZoomSpec) -> DataFrame:
    """G14 over the FUSED way_features table: one pass, one
    geom_type CASE — instead of two filtered branches each re-running
    the upstream subtree (round-2 verdict Next #7 pass fusion)."""
    mz = (f"CASE WHEN geom_type = 'linestring' "
          f"THEN {spec.sql_line_minzoom('tags')} "
          f"ELSE {spec.sql_polygon_minzoom('tags', 'area')} END")
    return _apply(way_features, mz, spec.max_minzoom is not None)


def find_minzoom(points: DataFrame, lines: DataFrame,
                 simple_polygons: DataFrame, complicated_polygons: DataFrame,
                 spec: MinZoomSpec) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    drop = spec.max_minzoom is not None
    return (
        _apply(points, spec.sql_point_minzoom("tags"), drop),
        _apply(lines, spec.sql_line_minzoom("tags"), drop),
        _apply(simple_polygons, spec.sql_polygon_minzoom("tags", "area"), drop),
        _apply(complicated_polygons, spec.sql_polygon_minzoom("tags", "area"), drop),
    )
