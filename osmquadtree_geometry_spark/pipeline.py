"""End-to-end geometry pipeline: docs -> decode -> enrichment joins ->
geometry construction -> minzoom -> tile allocation.

Operator order matches the reference chain
(`process_geometry.rs:418-524`, SURVEY §0):

  decode -> CollectWayNodes (J1) -> AddParentTag (J3) ->
  AddRelationTags (J4) -> ProcessMultiPolygons (J2) ->
  MakeGeometries (G10) -> FindMinZoom (G14) -> tile alloc (J6)

Optional stages elide exactly like the reference
(`process_geometry.rs:444-459`): no parent_tags spec -> no J3, no
relation_tag_spec -> no J4, style.multipolygons=false -> no J2,
minzoom=None -> no G14.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config.minzoom import MinZoomSpec
from .config.style import GeometryStyle
from .decode import decode_all, read_docs
from .operators.makegeoms import make_points, make_ways
from .operators.minzoom import find_minzoom
from .operators.multipolygons import process_multipolygons
from .operators.parenttags import add_parent_tags
from .operators.relationtags import add_relation_tags
from .operators.tiles import allocate_tiles, tile_dictionary
from .operators.waynodes import collect_way_nodes

EMPTY_ERRORS = "elem_type string, elem_id long, message string"


@dataclass
class PipelineResult:
    points: DataFrame
    linestrings: DataFrame
    simple_polygons: DataFrame
    complicated_polygons: DataFrame
    errors: DataFrame
    decoded: dict = field(default_factory=dict)


def run_pipeline(spark: SparkSession, docs_path: str,
                 style: GeometryStyle | None = None,
                 minzoom: MinZoomSpec | None = None,
                 with_tiles: bool = True,
                 tile_group_depth: int = 8,
                 persist: bool = True,
                 end_date: int | None = None) -> PipelineResult:
    style = style or GeometryStyle()
    docs = read_docs(spark, docs_path)
    t = decode_all(docs)
    if persist:
        # one parse of the span stream feeds 8+ downstream groupBys
        t["spans"] = t["spans"].persist()
        # the fused tag table (ONE shuffle for node/way/rel tags) is
        # read by three branches — persist so the shuffle runs once
        # (cache matches by logical plan, so the nodes/ways/relations
        # built in decode_all hit it)
        t["tags_all"] = t["tags_all"].persist()
    nodes, ways, relations = t["nodes"], t["ways"], t["relations"]
    if persist:
        # the decoded tables feed several downstream branches (points +
        # way join + relation joins + tile dictionary); persisting here
        # prevents each output from re-running the decode shuffles
        nodes = nodes.persist()
        ways = ways.persist()
        relations = relations.persist()
        t["nodes"], t["ways"], t["relations"] = nodes, ways, relations

    ways_ll, err_w = collect_way_nodes(ways, nodes)
    if persist:
        ways_ll = ways_ll.persist()

    if style.parent_tags:
        nodes = add_parent_tags(nodes, ways_ll, style)
    if style.relation_tag_spec:
        ways_ll = add_relation_tags(ways_ll, relations, style)
        if persist:
            # enriched ways feed both multipolygon assembly and
            # line/polygon classification
            ways_ll = ways_ll.persist()

    if style.multipolygons:
        cpolys, err_r = process_multipolygons(relations, ways_ll, style)
    else:
        cpolys = spark.createDataFrame(
            [], "doc_id string, id long, tags map<string,string>, "
                "parts array<struct<exterior:array<struct<lon:int,lat:int>>,"
                "interiors:array<array<struct<lon:int,lat:int>>>,area:double>>, "
                "area double, z_order long, layer long, minzoom long, "
                "quadtree long, wkb binary")
        err_r = spark.createDataFrame([], EMPTY_ERRORS)

    points = make_points(nodes, style)
    lines, spolys = make_ways(ways_ll, style)

    if minzoom is not None:
        points, lines, spolys, cpolys = find_minzoom(
            points, lines, spolys, cpolys, minzoom)

    if with_tiles:
        # registered tile set from ALL node locations (the reference's
        # tile set comes from the input block structure, i.e. the full
        # data distribution — not just emitted features)
        tiles = tile_dictionary(t["nodes"], tile_group_depth)
        points = allocate_tiles(points, tiles)
        lines = allocate_tiles(lines, tiles)
        spolys = allocate_tiles(spolys, tiles)
        cpolys = allocate_tiles(cpolys, tiles)

    if end_date is not None:
        # block-level snapshot timestamp carried on every feature
        # (`geometry_block.rs:39,190-193` PrimitiveBlock.end_date —
        # the reference's historical-extract marker)
        def stamp(df: DataFrame) -> DataFrame:
            return df.withColumn("end_date",
                                 F.lit(int(end_date)).cast("long"))
        points, lines, spolys, cpolys = (
            stamp(points), stamp(lines), stamp(spolys), stamp(cpolys))

    return PipelineResult(
        points=points, linestrings=lines, simple_polygons=spolys,
        complicated_polygons=cpolys,
        errors=err_w.unionByName(err_r), decoded=t)


def feature_counts(res: PipelineResult) -> DataFrame:
    """CollectWorkingTiles-style counters (`process_geometry.rs:157-216`)."""
    def c(df: DataFrame, name: str) -> DataFrame:
        return df.groupBy().agg(F.count("*").alias("n")).select(
            F.lit(name).alias("geom_type"), "n")
    return (c(res.points, "points")
            .unionByName(c(res.linestrings, "linestrings"))
            .unionByName(c(res.simple_polygons, "simple_polygons"))
            .unionByName(c(res.complicated_polygons, "complicated_polygons")))


def run_pipeline_checkpointed(spark: SparkSession, docs_path: str,
                              workdir: str,
                              style: GeometryStyle | None = None,
                              minzoom: MinZoomSpec | None = None,
                              tile_group_depth: int = 8,
                              force: bool = False) -> tuple[PipelineResult, dict]:
    """North-rule resumable pipeline: every stage materializes through
    the LineageStore with per-partition row metrics; a re-run (same
    input fingerprint) skips completed stages and resumes mid-tiling.

    Returns (result, resumed_flags) where resumed_flags[stage] is True
    when the stage was served from its checkpoint."""
    from .lineage import LineageStore, fingerprint_input, run_stage

    style = style or GeometryStyle()
    store = LineageStore(spark, workdir)
    fp = fingerprint_input(docs_path)
    resumed: dict[str, bool] = {}

    def stage(name, build):
        out, was = run_stage(store, name, fp, build, force=force)
        resumed[name] = was
        return out

    docs = read_docs(spark, docs_path)
    t = decode_all(docs)
    nodes = stage("decode_nodes", lambda: t["nodes"])
    ways = stage("decode_ways", lambda: t["ways"])
    relations = stage("decode_relations", lambda: t["relations"])
    media = stage("decode_media", lambda: t["media"])

    ways_ll = stage("waynodes", lambda: collect_way_nodes(ways, nodes)[0])
    err_w = stage("waynodes_errors", lambda: collect_way_nodes(ways, nodes)[1])

    nodes2 = (stage("parent_tags", lambda: add_parent_tags(nodes, ways_ll, style))
              if style.parent_tags else nodes)
    ways2 = (stage("relation_tags", lambda: add_relation_tags(ways_ll, relations, style))
             if style.relation_tag_spec else ways_ll)

    if style.multipolygons:
        cpolys = stage("multipolygons",
                       lambda: process_multipolygons(relations, ways2, style)[0])
        err_r = stage("multipolygon_errors",
                      lambda: process_multipolygons(relations, ways2, style)[1])
    else:
        cpolys = spark.createDataFrame([], "doc_id string, id long")
        err_r = spark.createDataFrame([], EMPTY_ERRORS)

    points = stage("points", lambda: make_points(nodes2, style))
    lines = stage("lines", lambda: make_ways(ways2, style)[0])
    spolys = stage("simple_polygons", lambda: make_ways(ways2, style)[1])

    if minzoom is not None:
        p0, l0, s0, c0 = points, lines, spolys, cpolys  # snapshot: the
        # lambdas must see pre-minzoom inputs even after rebinding

        def mz(i):
            return lambda: find_minzoom(p0, l0, s0, c0, minzoom)[i]
        points = stage("minzoom_points", mz(0))
        lines = stage("minzoom_lines", mz(1))
        spolys = stage("minzoom_simple_polygons", mz(2))
        cpolys = stage("minzoom_complicated_polygons", mz(3))

    tiles = tile_dictionary(nodes, tile_group_depth)
    points = stage("tiles_points", lambda: allocate_tiles(points, tiles))
    lines = stage("tiles_lines", lambda: allocate_tiles(lines, tiles))
    spolys = stage("tiles_simple_polygons", lambda: allocate_tiles(spolys, tiles))
    cpolys = stage("tiles_complicated_polygons", lambda: allocate_tiles(cpolys, tiles))

    res = PipelineResult(points=points, linestrings=lines,
                         simple_polygons=spolys, complicated_polygons=cpolys,
                         errors=err_w.unionByName(err_r),
                         decoded={"nodes": nodes, "ways": ways,
                                  "relations": relations, "media": media})
    return res, resumed
