#!/usr/bin/env python
"""Round-6: dump .explain('formatted') for the optimization-touched
queries to plans/r06/<query>_<suffix>.txt.

Usage: python scripts/dump_plans.py <suffix> <out_dir>
Run from the round-5 worktree with suffix=before and from the current
tree with suffix=after; sf = /root/testdata/sf1.0 (plan shapes are
sf-independent)."""
from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = "/root/testdata/sf1.0"


def main():
    suffix = sys.argv[1]
    out_dir = sys.argv[2]
    os.makedirs(out_dir, exist_ok=True)
    from osmquadtree_geometry_spark.session import get_spark
    spark = get_spark("plans", master="local[8]", shuffle_partitions=8)

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "spark_entry", os.path.join(REPO, "__spark_entry__.py"))
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)

    def dump(name, df):
        p = os.path.join(out_dir, f"{name}_{suffix}.txt")
        s = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
        with open(p, "w") as f:
            f.write(s)
        print(f"wrote {p} ({len(s)} chars)")

    qs = entry.QUERIES
    for name in ["decode_nodes", "decode_ways", "decode_relations",
                 "span_roundtrip", "node_quadtree", "minhash_signatures",
                 "minhash_lsh_pairs", "simhash", "simhash_pairs",
                 "jaccard_lsh", "corpus_prep", "quality_score",
                 "language_id", "fingerprint", "token_counts",
                 "embedding_topk", "ivf_ann", "lsh_ann",
                 "embedding_near_dup"]:
        try:
            dump(name, qs[name](spark, SF_DIR))
        except Exception as e:
            print(f"SKIP {name}: {e}")

    # headline: the full pipeline counts union (what bench.py times)
    from osmquadtree_geometry_spark.pipeline import run_pipeline
    from osmquadtree_geometry_spark.config.minzoom import MinZoomSpec
    from osmquadtree_geometry_spark.datagen import fixture_docs_path
    from pyspark.sql import functions as F
    res = run_pipeline(spark, fixture_docs_path(SF_DIR),
                       minzoom=MinZoomSpec.default(), persist=False)

    def c(df, name):
        return df.groupBy().agg(F.count("*").alias("n")).select(
            F.lit(name).alias("t"), "n")
    wf = (res.way_features.groupBy().agg(
        F.sum(F.when(F.col("geom_type") == "linestring", 1)
              .otherwise(0)).alias("nl"),
        F.sum(F.when(F.col("geom_type") == "simple_polygon", 1)
              .otherwise(0)).alias("np"))
        .selectExpr("stack(2, 'linestrings', coalesce(nl, 0L), "
                    "'simple_polygons', coalesce(np, 0L)) as (t, n)"))
    allc = (c(res.points, "points")
            .unionByName(wf)
            .unionByName(c(res.complicated_polygons, "complicated_polygons"))
            .unionByName(c(res.errors, "errors")))
    dump("geometry_pipeline_counts", allc)

    # layout-backed spatial queries (pays one layout write)
    try:
        dump("pip_join", qs["pip_join"](spark, SF_DIR))
        dump("knn_join", qs["knn_join"](spark, SF_DIR))
    except Exception as e:
        print(f"SKIP spatial: {e}")


if __name__ == "__main__":
    main()
