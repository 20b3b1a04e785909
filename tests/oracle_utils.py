"""Local replica of the driver's Spark-vs-DuckDB differential check.

Compares row count, sorted column names, and order-insensitive values
(rows sorted after stringifying) so a failure here predicts a failure
in CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import datetime
import math

import duckdb

TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    if v is None:
        return "<NULL>"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def compare(spark_df, con, sql: str, name: str = "?") -> None:
    spark_cols = sorted(spark_df.columns)
    spark_rows = [tuple(_norm(row[c]) for c in spark_cols) for row in spark_df.collect()]

    res = con.execute(sql)
    duck_cols_raw = [d[0] for d in res.description]
    duck_rows_raw = res.fetchall()
    order = sorted(range(len(duck_cols_raw)), key=lambda i: duck_cols_raw[i])
    duck_cols = sorted(duck_cols_raw)
    duck_rows = [tuple(_norm(r[i]) for i in order) for r in duck_rows_raw]

    assert spark_cols == duck_cols, (
        f"[{name}] column mismatch:\n spark={spark_cols}\n duck ={duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"[{name}] row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s_sorted = sorted(spark_rows)
    d_sorted = sorted(duck_rows)
    if s_sorted != d_sorted:
        diffs = [
            (i, a, b) for i, (a, b) in enumerate(zip(s_sorted, d_sorted)) if a != b
        ][:5]
        raise AssertionError(
            f"[{name}] value mismatch ({len(diffs)}+ differing rows shown):\n"
            + "\n".join(f"  row {i}:\n    spark={a}\n    duck ={b}" for i, a, b in diffs)
            + f"\n  cols={spark_cols}"
        )
