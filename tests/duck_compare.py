"""Local twin of the driver's DuckDB-oracle comparison.

Runs a Spark query and its oracle SQL on the same parquet tables, then
compares row count, column names, and an order-insensitive multiset of
stringified rows (columns sorted by name) — the same shape of check the
driver records in CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import datetime as dt
import math

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _cell(v) -> str:
    if v is None:
        return "␀"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(round(v, 6))
    if isinstance(v, (dt.datetime, dt.date)):
        return v.isoformat().replace("+00:00", "")
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_cell(x) for x in v) + "]"
    return str(v)


def _rows_multiset(columns: list[str], rows: list[tuple]) -> list[str]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted("|".join(_cell(r[i]) for i in order) for r in rows)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> dict:
    spark_rows = [tuple(r) for r in spark_df.collect()]
    spark_cols = spark_df.columns
    rel = con.sql(sql)
    duck_cols = list(rel.columns)
    duck_rows = [tuple(r) for r in rel.fetchall()]

    result = {
        "rowcount_match": len(spark_rows) == len(duck_rows),
        "schema_match": sorted(spark_cols) == sorted(duck_cols),
        "spark_rows": len(spark_rows),
        "duck_rows": len(duck_rows),
        "spark_cols": sorted(spark_cols),
        "duck_cols": sorted(duck_cols),
    }
    if result["rowcount_match"] and result["schema_match"]:
        a = _rows_multiset(spark_cols, spark_rows)
        b = _rows_multiset(duck_cols, duck_rows)
        result["values_match"] = a == b
        if not result["values_match"]:
            sa, sb = set(a), set(b)
            result["spark_only"] = sorted(sa - sb)[:5]
            result["duck_only"] = sorted(sb - sa)[:5]
    else:
        result["values_match"] = False
    return result
