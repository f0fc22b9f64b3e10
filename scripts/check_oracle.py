"""Local mirror of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() twin on DuckDB, compare row count + columns +
order-insensitive values.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

import __spark_entry__ as entrymod
from xml_to_parquet_spark import get_spark
from xml_to_parquet_spark.tables import TABLE_NAMES


def _norm_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, float):
        # Driver-faithful: an integral float stays "364.0", NOT "364" — the
        # driver's value hash distinguishes int64 364 from float64 364.0
        # (this masking let a DuckDB HUGEINT->float64 promotion slip through
        # in rounds 1 and 2).
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def _canon(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_norm_cell(r[c]) for c in cols) for _, r in df.iterrows()]
    return sorted(rows)


def _dtype_family(dtype) -> str:
    import pandas.api.types as pt

    if pt.is_bool_dtype(dtype):
        return "bool"
    if pt.is_integer_dtype(dtype):
        return "int"
    if pt.is_float_dtype(dtype):
        return "float"
    if pt.is_datetime64_any_dtype(dtype):
        return "datetime"
    return "other"


def _dtype_mismatches(sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    """Per-column dtype-family diff (int vs float vs datetime) between the
    Spark and oracle pandas frames — the class of representational bug the
    value hash fails on even when values are numerically identical."""
    olower = {c.lower(): c for c in odf.columns}
    bad = []
    for c in sdf.columns:
        oc = olower.get(c.lower())
        if oc is None:
            continue
        fs, fo = _dtype_family(sdf[c].dtype), _dtype_family(odf[oc].dtype)
        if fs != fo:
            bad.append(f"{c}: spark={sdf[c].dtype}({fs}) duck={odf[oc].dtype}({fo})")
    return bad


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("check_oracle")
    # XTPS_CONFS="k=v;k=v" applies runtime confs after session build —
    # e.g. XTPS_CONFS="spark.sql.adaptive.enabled=false" sweeps the whole
    # registry without AQE (r16: environment-invariance checking)
    for kv in filter(None, os.environ.get("XTPS_CONFS", "").split(";")):
        k, _, v = kv.partition("=")
        spark.conf.set(k.strip(), v.strip())
        print(f"conf  {k.strip()}={v.strip()}")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"rows  {name}: {len(sdf)} rows (no oracle)")
            continue
        try:
            odf = con.execute(sql).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        if sorted(map(str.lower, sdf.columns)) != sorted(map(str.lower, odf.columns)):
            failures.append(name)
            print(f"FAIL  {name}: columns spark={sorted(sdf.columns)} duck={sorted(odf.columns)}")
            continue
        if len(sdf) != len(odf):
            failures.append(name)
            print(f"FAIL  {name}: rows spark={len(sdf)} duck={len(odf)}")
            continue
        dbad = _dtype_mismatches(sdf, odf)
        if dbad:
            failures.append(name)
            print(f"FAIL  {name}: dtype family mismatch: {'; '.join(dbad)}")
            continue
        sc, oc = _canon(sdf), _canon(odf.rename(columns=dict(zip(odf.columns, odf.columns))))
        if sc != oc:
            failures.append(name)
            bad = next(i for i, (x, y) in enumerate(zip(sc, oc)) if x != y)
            print(f"FAIL  {name}: values differ, first at sorted-row {bad}:")
            print(f"      spark: {sc[bad]}")
            print(f"      duck : {oc[bad]}")
            continue
        print(f"ok    {name}: {len(sdf)} rows")
    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
