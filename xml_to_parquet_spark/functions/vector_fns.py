"""Vector math over array<float> embedding columns — built-in higher-order
functions only (zip_with/aggregate run in the JVM inside codegen; a Pandas
UDF here would pay an Arrow round-trip per batch for a dot product).

All math is promoted to double before accumulation so results match the
DuckDB oracle (which computes list_cosine_similarity in double).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a, b) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a, b) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
