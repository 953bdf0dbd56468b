"""Stricter local stand-in for the driver's value-hash: collect Spark and
DuckDB results into pandas, sort columns by name and rows by repr, then
compare the *typed* representation of every cell (so int64 vs float64 or
date vs datetime mismatches FAIL here exactly as they do in the driver's
canonicalizer, which selfcheck.py's round-based compare masks).

Usage: python tools/strictcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")


def canon(df):
    """Driver-style canonical form: columns sorted by name, rows sorted,
    every cell rendered as (typename, repr)."""
    df = df[sorted(df.columns)]
    rows = []
    for r in df.itertuples(index=False):
        rows.append(tuple((type(v).__name__, repr(v)) for v in r))
    rows.sort()
    return rows


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .appName("strictcheck")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        if sql is None:
            continue
        try:
            sdf = fn(spark, sf_dir)
            # Driver-gate convention (VERDICT r4 #1): no bare array/map
            # top-level columns in any oracle-checked output — the
            # driver's pandas canonicalizer sorts rows and dies on
            # unhashable list/dict cells. Serialize (array_join /
            # to_json) before returning.
            from pyspark.sql import types as T

            bad_cols = [
                f.name
                for f in sdf.schema.fields
                if isinstance(f.dataType, (T.ArrayType, T.MapType))
            ]
            if bad_cols:
                print(
                    f"FAIL  {name}: array/map top-level column(s) "
                    f"{bad_cols} in a driver-checked output — serialize "
                    f"with array_join/to_json"
                )
                n_fail += 1
                continue
            spd = sdf.toPandas()
            opd = con.execute(sql).df()
        except Exception as ex:
            print(f"FAIL  {name}: {type(ex).__name__}: {str(ex)[:200]}")
            n_fail += 1
            continue
        try:
            a, b = canon(spd), canon(opd)
        except Exception as ex:
            print(f"FAIL  {name}: canonicalize: {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        if a == b:
            print(f"pass  {name}: {len(a)} rows (typed-equal)")
            n_pass += 1
        else:
            diffs = [(x, y) for x, y in zip(a, b) if x != y][:2]
            print(f"FAIL  {name}: typed values differ; first: {diffs}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
