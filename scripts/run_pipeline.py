#!/usr/bin/env python
"""spark-submit entry point for the geometry pipeline.

    spark-submit --py-files osmquadtree_geometry_spark_pkg.zip \
        scripts/run_pipeline.py --docs <docs.parquet> --out <workdir> \
        [--resume] [--max-minzoom N]

Runs the full checkpointed pipeline (north rule: resumable
mid-tiling with per-partition lineage), writes the four geometry
tables + errors + lineage under --out, and prints a JSON summary.
Build the zip with:  cd <repo> && \
    python -c "import shutil; shutil.make_archive('osmquadtree_geometry_spark_pkg','zip','.','osmquadtree_geometry_spark')"
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--max-minzoom", type=int, default=None)
    ap.add_argument("--force", action="store_true",
                    help="recompute all stages, ignore checkpoints")
    ap.add_argument("--tile-depth", type=int, default=8)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    spark = SparkSession.builder.appName("osmquadtree-geometry-spark").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from osmquadtree_geometry_spark.config.minzoom import MinZoomSpec
    from osmquadtree_geometry_spark.pipeline import (
        feature_counts, run_pipeline_checkpointed)

    res, resumed = run_pipeline_checkpointed(
        spark, args.docs, args.out,
        minzoom=MinZoomSpec.default(max_minzoom=args.max_minzoom),
        tile_group_depth=args.tile_depth, force=args.force)

    counts = {r.geom_type: r.n for r in feature_counts(res).collect()}
    counts["errors"] = res.errors.count()
    print(json.dumps({
        "counts": counts,
        "stages_resumed": sum(resumed.values()),
        "stages_computed": sum(1 for v in resumed.values() if not v),
        "out": args.out,
    }))


if __name__ == "__main__":
    main()
