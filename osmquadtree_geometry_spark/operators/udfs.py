"""Arrow-batched pandas UDF wrappers around the numpy kernels.

Used where the equivalent SQL expression would blow past the JVM's
64KB generated-method limit (the 18-level morton interleave inlines
its tile-coordinate subexpressions ~36x after Catalyst's
CollapseProject).  Arrow transfer of a couple of numeric columns is
cheap; the kernels are fully vectorized.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..kernels import quadtree as qtk


@F.pandas_udf(T.LongType())
def qt_point_udf(lon: pd.Series, lat: pd.Series) -> pd.Series:
    import numpy as np
    return pd.Series(qtk.calculate_point(
        np.asarray(lon, dtype=np.int64), np.asarray(lat, dtype=np.int64)))
