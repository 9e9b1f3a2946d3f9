#!/usr/bin/env python
"""Round-6: where does run_pipeline's plan CONSTRUCTION time go?"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    from osmquadtree_geometry_spark.session import get_spark
    from osmquadtree_geometry_spark.datagen import fixture_docs_path
    from osmquadtree_geometry_spark.config.minzoom import MinZoomSpec
    from osmquadtree_geometry_spark.config.style import GeometryStyle
    from pyspark.sql import functions as F

    spark = get_spark("profile2", master=f"local[{CPUS}]",
                      shuffle_partitions=max(CPUS, 8))
    docs_path = fixture_docs_path(SF_DIR)
    style = GeometryStyle()
    minzoom = MinZoomSpec.default()

    T = [time.monotonic()]

    def lap(tag):
        t = time.monotonic()
        print(f"{tag}: {t - T[0]:.2f}s")
        T[0] = t

    for rep in range(2):
        print(f"--- rep {rep} ---")
        T[0] = time.monotonic()
        from osmquadtree_geometry_spark.decode import decode_all, read_docs
        t = decode_all(read_docs(spark, docs_path))
        lap("decode_all construction")
        from osmquadtree_geometry_spark.operators.waynodes import (
            collect_way_nodes)
        nodes, ways, relations = t["nodes"], t["ways"], t["relations"]
        ways_ll, err_w = collect_way_nodes(ways, nodes)
        lap("collect_way_nodes construction")
        from osmquadtree_geometry_spark.operators.parenttags import (
            add_parent_tags)
        nodes = add_parent_tags(nodes, ways_ll, style)
        lap("add_parent_tags construction")
        from osmquadtree_geometry_spark.operators.relationtags import (
            add_relation_tags)
        ways_ll = add_relation_tags(ways_ll, relations, style)
        lap("add_relation_tags construction")
        from osmquadtree_geometry_spark.operators.multipolygons import (
            process_multipolygons)
        cpolys, err_r = process_multipolygons(relations, ways_ll, style)
        lap("process_multipolygons construction")
        from osmquadtree_geometry_spark.operators.makegeoms import (
            make_points, make_way_features)
        points = make_points(nodes, style)
        lap("make_points construction")
        way_feats = make_way_features(ways_ll, style)
        lap("make_way_features construction")
        from osmquadtree_geometry_spark.operators.minzoom import (
            _apply as _apply_mz, find_minzoom_fused)
        points = _apply_mz(points, minzoom.sql_point_minzoom("tags"), False)
        lap("minzoom points construction")
        cpolys = _apply_mz(cpolys,
                           minzoom.sql_polygon_minzoom("tags", "area"), False)
        lap("minzoom cpolys construction")
        way_feats = find_minzoom_fused(way_feats, minzoom)
        lap("minzoom way_feats construction")
        from osmquadtree_geometry_spark.operators.tiles import (
            allocate_tiles, tile_dictionary)
        from osmquadtree_geometry_spark.decode import decode_node_locations
        dict_src = decode_node_locations(t["spans"])
        tiles = tile_dictionary(dict_src, 8)
        lap("tile_dictionary (ACTION + collect)")
        points = allocate_tiles(points, tiles)
        way_feats = allocate_tiles(way_feats, tiles)
        cpolys = allocate_tiles(cpolys, tiles)
        lap("allocate_tiles x3 construction")


if __name__ == "__main__":
    main()
