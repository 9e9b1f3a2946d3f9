"""J6 / S5 / S8 — tile dictionary, ancestor allocation, sorted tiled
output.

Reference semantics:
  * ``StoreBlocks`` (`process_geometry.rs:41-155`): each feature goes
    to the DEEPEST registered ancestor of its quadtree; no ancestor ->
    the "rem" bucket (tile = EMPTY = -1); blocks sorted by id.
  * sorted-PBF writer (`tempfile.rs:196-332`): global regroup by tile
    then sort — in Spark this is ``repartitionByRange(tile)`` +
    ``sortWithinPartitions`` and the external shuffle replaces the
    temp-file spill machinery.

Allocation strategies (both JVM-side):
  * small dictionary (<= ~10k tiles): a literal map + coalesce over
    the 19 possible ancestor depths — zero shuffle, codegen'd;
  * large dictionary: explode the feature's ancestor chain (19 rows)
    and broadcast-join the tile dict, keeping max depth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..kernels.quadtree import sql_qt_depth, sql_round_qt


def tile_dictionary(features: DataFrame, group_depth: int = 8,
                    qt_col: str = "quadtree") -> list[int]:
    """Registered tile set: distinct feature cells rounded to
    ``group_depth`` (the reference gets this from the input block
    structure; we derive it from the data)."""
    d = (features
         .select(F.expr(sql_round_qt(qt_col, str(group_depth))).alias("tile"))
         .where(F.col("tile") >= 0).distinct())
    return sorted(r.tile for r in d.collect())


def allocate_tiles(df: DataFrame, tiles: list[int],
                   qt_col: str = "quadtree") -> DataFrame:
    """Adds ``tile``: deepest registered ancestor of ``qt_col``, -1
    when none ('rem' bucket)."""
    if len(tiles) <= 10000:
        # one map lookup per DISTINCT depth present in the dictionary
        # (usually 1) — keeps the generated code inside the JVM's
        # 64KB method limit instead of 19 coalesce arms
        depths = sorted({t & 31 for t in tiles if t >= 0}, reverse=True)
        m = f"map({', '.join(f'{t}L, {t}L' for t in tiles)})" if tiles else "map(-1L, -1L)"
        lookups = [f"{m}[{sql_round_qt(qt_col, str(d))}]" for d in depths]
        expr = f"coalesce({', '.join(lookups + ['-1L'])})"
        return df.withColumn("tile", F.expr(expr))
    spark = df.sparkSession
    tdf = spark.createDataFrame([(t,) for t in tiles], "tile long")
    anc = df.withColumn(
        "anc",
        F.expr(f"transform(sequence({sql_qt_depth(qt_col)}, 0, -1), "
               f"d -> {sql_round_qt(qt_col, 'd')})"))
    e = anc.select("*", F.explode("anc").alias("tile")).drop("anc")
    j = e.join(F.broadcast(tdf), "tile")
    key = [c for c in ("doc_id", "id") if c in df.columns]
    best = (j.groupBy(*key)
            .agg(F.expr(f"max_by(tile, {sql_qt_depth('tile')})").alias("tile")))
    return df.join(best, key, "left").fillna({"tile": -1})


def write_sorted_tiles(df: DataFrame, out_path: str,
                       tile_col: str = "tile") -> None:
    """S8: globally tile-sorted output, id-sorted within tile
    (format-neutral via the tableio seam)."""
    from ..tableio import write_table
    write_table(df.repartitionByRange(tile_col, "id")
                .sortWithinPartitions(tile_col, "id"), out_path)
