import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")


@pytest.fixture(scope="session")
def spark():
    from osmquadtree_geometry_spark.session import get_spark
    s = get_spark("tests", master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def docs_path(tmp_path_factory):
    from osmquadtree_geometry_spark.datagen import generate_docs_parquet
    out = tmp_path_factory.mktemp("docs") / "docs.parquet"
    return generate_docs_parquet(str(out), 33)  # 3 instances of each scene


@pytest.fixture(scope="session")
def decoded(spark, docs_path):
    from osmquadtree_geometry_spark.decode import decode_all, read_docs
    d = decode_all(read_docs(spark, docs_path))
    out = {k: v.cache() for k, v in d.items()}
    for v in out.values():
        v.count()
    return out
