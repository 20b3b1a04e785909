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


def _audit_pandas_types(spark_df, con, sql: str, name: str) -> None:
    """Catch engine-type divergence the fetchall path hides.

    The driver canonicalizes through pandas, where DuckDB wide types
    (HUGEINT from sum() windows, DECIMAL) may surface as float64 or
    object while Spark hands back int64 — numerically equal values
    that hash differently.  fetchall() converts HUGEINT to Python int
    losslessly, so a fetchall-based compare passes while the driver
    fails.  Flag any oracle column whose DuckDB type is HUGEINT or
    DECIMAL when the Spark schema says integral.  ``DESCRIBE`` is a
    metadata-only plan inspection — the oracle (already executed once
    by compare()) is NOT re-run."""
    spark_int_cols = {
        f.name for f in spark_df.schema.fields
        if f.dataType.typeName() in ("byte", "short", "integer", "long")
    }
    duck_types = {
        r[0]: r[1] for r in con.execute(f"DESCRIBE {sql}").fetchall()
    }
    bad = [
        c for c, t in duck_types.items()
        if c in spark_int_cols
        and (t.upper().startswith(("HUGEINT", "UHUGEINT", "DECIMAL")))
    ]
    if bad:
        raise AssertionError(
            f"[{name}] oracle type divergence: columns {bad} are integral in "
            f"Spark but {[duck_types[c] for c in bad]} in DuckDB — the "
            f"driver's pandas conversion may float-coerce them; CAST to "
            f"BIGINT in the oracle SQL."
        )


def _cell_multiset_diff(spark_rows, duck_rows, cols) -> str:
    """Per-column multiset diff: names exactly which cells differ,
    robust to the row misalignment a sorted positional zip can show."""
    from collections import Counter

    out = []
    for j, c in enumerate(cols):
        s = Counter(r[j] for r in spark_rows)
        d = Counter(r[j] for r in duck_rows)
        only_s = s - d
        only_d = d - s
        if only_s or only_d:
            out.append(
                f"  col {c}: {sum(only_s.values())} spark-only / "
                f"{sum(only_d.values())} duck-only cells; "
                f"spark-only sample={list(only_s)[:4]} "
                f"duck-only sample={list(only_d)[:4]}"
            )
    return "\n".join(out) if out else "  (no per-column multiset diff: row composition differs)"


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
            + f"\n cell multiset diff by column:\n"
            + _cell_multiset_diff(s_sorted, d_sorted, spark_cols)
            + f"\n  cols={spark_cols}"
        )
    _audit_pandas_types(spark_df, con, sql, name)
