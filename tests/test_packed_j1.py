"""Parity of the packed J1 collect buffer (SPARK_GRAFT_PACK_J1=1):
bit-packing lon/lat into one bigint inside the per-way shuffle must be
invisible in the output, including negative / extreme coordinates and
the missing-node error branch."""

from pyspark.sql import functions as F

from osmquadtree_geometry_spark.operators.waynodes import collect_way_nodes

WAYS = "doc_id string, id long, refs array<bigint>, tags map<string,string>"
NODES = "id long, lon int, lat int"


def _scene(spark):
    ways = spark.createDataFrame(
        [("d0", 10, [1, 2, 3, 4], {"highway": "residential"}),
         ("d0", 11, [4, 3, 1], {}),
         ("d0", 12, [1, 99, 2], {})],        # ref 99 missing
        WAYS)
    nodes = spark.createDataFrame(
        [(1, -1795000000, -890000000),       # extreme SW
         (2, 1795000000, 890000000),         # extreme NE
         (3, -1, 1),                         # sign boundary
         (4, 0, -2147483648)],               # int32 min lat
        NODES)
    return ways, nodes


def _rows(ok, err):
    okr = sorted(
        ((r.id, tuple((p.lon, p.lat) for p in r.lonlats))
         for r in ok.collect()))
    errr = sorted((r.elem_id, r.message) for r in err.collect())
    return okr, errr


def test_packed_collect_parity(spark, monkeypatch):
    ways, nodes = _scene(spark)
    monkeypatch.setenv("SPARK_GRAFT_PACK_J1", "0")
    base = _rows(*collect_way_nodes(ways, nodes))
    monkeypatch.setenv("SPARK_GRAFT_PACK_J1", "1")
    packed = _rows(*collect_way_nodes(ways, nodes))
    assert packed == base
    ok_rows = dict(base[0])
    assert ok_rows[10] == ((-1795000000, -890000000),
                           (1795000000, 890000000),
                           (-1, 1), (0, -2147483648))
    assert base[1] == [(12, "missing node 99")]


def test_half_null_location_routes_to_errors(spark, monkeypatch):
    """A corrupt node row with exactly one of lon/lat NULL must hit the
    error branch identically in both collect variants (the packed
    bigint nulls out when either half is null)."""
    ways = spark.createDataFrame([("d0", 20, [1, 2], {})], WAYS)
    nodes = spark.createDataFrame([(1, 5, 6), (2, 7, None)], NODES)
    for flag in ("0", "1"):
        monkeypatch.setenv("SPARK_GRAFT_PACK_J1", flag)
        ok, err = collect_way_nodes(ways, nodes)
        assert ok.count() == 0, flag
        assert [(r.elem_id, r.message) for r in err.collect()] == \
            [(20, "missing node 2")], flag
