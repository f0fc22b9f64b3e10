"""Oracle/engine type-contract meta-test (VERDICT r2 #8).

Rounds 1 and 2 each shipped one driver-red row caused by a *representation*
mismatch: DuckDB promoting sum(BIGINT) to HUGEINT, which pandas materializes
as float64 ("364.0") while Spark emits int64 ("364") — values identical,
value-hash different. This test catches that class statically for every
oracle-backed query: run the oracle through DuckDB at sf0.001 and assert
each output column's pandas dtype family matches the Spark result schema's
type family (int64↔LongType etc.), without executing the Spark side.

One relaxation: a Spark integer column may legitimately surface as float64
in pandas when it contains NULLs (pandas has no nullable int in this path),
so int-vs-float is allowed ONLY when the oracle column actually has nulls.
"""

from __future__ import annotations

import duckdb
import pandas.api.types as pt
import pytest
from pyspark.sql import types as T

from xml_to_parquet_spark.registry import load_all
from xml_to_parquet_spark.tables import TABLE_NAMES

SF_DIR = "/root/testdata/sf0.001"

_INT_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_FLOAT_TYPES = (T.FloatType, T.DoubleType)


def _spark_family(dt: T.DataType) -> str:
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, _INT_TYPES):
        return "int"
    if isinstance(dt, _FLOAT_TYPES):
        return "float"
    return "other"


def _pandas_family(dtype) -> str:
    if pt.is_bool_dtype(dtype):
        return "bool"
    if pt.is_integer_dtype(dtype):
        return "int"
    if pt.is_float_dtype(dtype):
        return "float"
    return "other"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _oracle_queries():
    return [(n, qd) for n, qd in load_all().items() if qd.oracle is not None]


@pytest.mark.parametrize(
    "name,qd", _oracle_queries(), ids=[n for n, _ in _oracle_queries()]
)
def test_oracle_dtype_matches_spark_schema(name, qd, duck, spark):
    sdf = qd.fn(spark, SF_DIR)  # schema comes from analysis, no execution
    odf = duck.execute(qd.oracle).df()
    spark_types = {f.name.lower(): f.dataType for f in sdf.schema.fields}
    for col in odf.columns:
        sdt = spark_types.get(col.lower())
        assert sdt is not None, f"{name}: oracle column {col} missing from Spark schema"
        sfam, ofam = _spark_family(sdt), _pandas_family(odf[col].dtype)
        if sfam == "other" or ofam == "other":
            continue
        if sfam == "int" and ofam == "float" and odf[col].isna().any():
            continue  # nullable int legitimately becomes float64 in pandas
        assert sfam == ofam, (
            f"{name}.{col}: spark {sdt.simpleString()} ({sfam}) vs oracle "
            f"pandas {odf[col].dtype} ({ofam}) — representation mismatch "
            "(HUGEINT promotion? missing emit-cast?)"
        )
