"""Format-neutral table IO seam (round-4 verdict Next #4): parquet is
the sandbox stand-in for the north rule's Iceberg tables; the seam is
what an Iceberg deployment swaps via SPARK_GRAFT_TABLE_FORMAT."""

import pytest

from osmquadtree_geometry_spark import tableio


def test_tableio_parquet_roundtrip(spark, tmp_path):
    df = spark.range(5)
    p = str(tmp_path / "t")
    assert not tableio.table_exists(spark, p)
    tableio.write_table(df, p)
    assert tableio.table_exists(spark, p)
    assert tableio.read_table(spark, p).count() == 5
    tableio.write_table(df, p, mode="append")
    assert tableio.read_table(spark, p).count() == 10
    tableio.write_table(df, p, mode="overwrite")
    assert tableio.read_table(spark, p).count() == 5


def test_tableio_format_selection(monkeypatch):
    assert tableio.table_format() == "parquet"
    monkeypatch.setenv(tableio.TABLE_FORMAT_ENV, "iceberg")
    assert tableio.table_format() == "iceberg"
    assert tableio.table_format("parquet") == "parquet"  # arg wins
    with pytest.raises(ValueError):
        tableio.table_format("delta")
