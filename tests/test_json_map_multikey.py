"""Multi-key fixture for the json_as_map projection.

The testdata's events.props carries exactly one key ("k"), so the
driver's differential check never exercises the key-order-safe oracle
on richer payloads.  This fixture drives the SAME production
expressions (plans/json_ops.map_project) over multi-key, out-of-order,
k-less, empty, and null payloads, differentially against DuckDB's
json functions on the identical rows.
"""

from __future__ import annotations

import duckdb

from etl_pipe_spark.plans.json_ops import map_project

PAYLOADS = [
    (1, '{"k": 1, "alpha": "x", "beta": "y"}'),   # multi-key, k first
    (2, '{"zeta": "9", "k": 7}'),                 # k not first (order-safety)
    (3, '{"beta": "b", "alpha": "a"}'),           # keys out of sorted order, no k
    (4, "{}"),                                    # empty object
    (5, None),                                    # null payload
    (6, '{"k": null}'),                           # k present but null-valued
    (7, '{"a": "1", "b": "2", "c": "3", "k": "8", "z": "26"}'),
]

_ORACLE = """
SELECT event_id,
       CAST(list_sort(json_keys(props)) AS JSON) AS prop_keys,
       CAST(coalesce(len(json_keys(props)), -1) AS INT) AS n_keys,
       props ->> 'k' AS k_value,
       list_contains(json_keys(props), 'k') AS has_k
FROM payloads
"""


def test_map_project_multikey_matches_duckdb(spark):
    ev = spark.createDataFrame(PAYLOADS, ["event_id", "props"])
    got = {
        r["event_id"]: (r["prop_keys"], r["n_keys"], r["k_value"], r["has_k"])
        for r in map_project(ev).collect()
    }

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE payloads AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({i}, {'NULL' if p is None else repr(p)})" for i, p in PAYLOADS
        )
        + ") t(event_id, props)"
    )
    want = {}
    for eid, keys, n, kv, has_k in con.execute(_ORACLE).fetchall():
        want[eid] = (keys, n, kv, has_k)

    for eid, (keys, n, kv, has_k) in want.items():
        g_keys, g_n, g_kv, g_has = got[eid]
        if n == -1:  # null payload: engines agree on all-NULL row
            assert g_keys is None and g_n is None and g_kv is None and g_has is None
            continue
        assert g_keys == keys.replace(", ", ","), f"event {eid} keys"
        assert g_n == n, f"event {eid} n_keys"
        assert g_kv == kv, f"event {eid} k_value"
        assert g_has == has_k, f"event {eid} has_k"
