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
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)  # full precision — stricter than any plausible driver hash
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def _canon(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_norm_cell(r[c]) for c in cols) for _, r in df.iterrows()]
    return sorted(rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("check_oracle")
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
