"""Oracle-differential test: every registered query with an oracle must
match DuckDB exactly at the test scale factor — the same gate the
driver applies at sf0.01."""

from __future__ import annotations

import pytest

from tests.oracle_utils import compare, duckdb_connect

import __spark_entry__ as entrymod


def _specs():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    return [(name, qs[name], oracles.get(name)) for name in sorted(qs)]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb_connect(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", [n for n, _, _ in _specs()])
def test_query_matches_oracle(name, spark, sf_dir, duck):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    df = qs[name](spark, sf_dir)
    if name in oracles:
        compare(df, duck, oracles[name], name=name)
    else:
        # rows-only check, mirroring the driver's weaker path
        assert df.count() >= 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert len(df.schema.fields) > 0
