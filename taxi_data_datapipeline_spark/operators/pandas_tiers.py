"""Vectorized pandas UDAFs (the GROUPED_AGG pandas_udf tier).

Deliberately NO ``from __future__ import annotations`` here: pandas_udf
infers the GROUPED_AGG variant from the ``Series -> scalar`` type hints,
and stringified annotations only resolve if ``pd`` is importable from
the defining module's namespace — so these live in their own module
with a top-level pandas import.

Engine convention: aggregate INTEGERS (fold-order independent), never
doubles — which is what makes this Python tier bit-identical to the SQL
oracle.
"""

import pandas as pd

from pyspark.sql.functions import pandas_udf


@pandas_udf("long")
def cents_sum(v: pd.Series) -> int:
    return int(v.sum())


@pandas_udf("long")
def cents_count(v: pd.Series) -> int:
    return int(v.count())


@pandas_udf("long")
def fare_bucket(cents: pd.Series) -> pd.Series:
    # SCALAR tier: vectorized int64 arithmetic, order-free and exact.
    # floordiv FLOORS while SQL integer division TRUNCATES — identical
    # only because event cents are non-negative by construction (ROUND_
    # NOTES landmine 19); a signed-domain caller must truncate instead.
    return cents.floordiv(500)
