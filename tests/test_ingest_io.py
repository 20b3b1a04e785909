"""Text-format ingestion: corrupt-record quarantine and the coercion
ladder on damage the oracle round trips never produce.

The registered queries (plans/ingest_plans.py) prove the CLEAN round
trip against DuckDB; these tests feed structurally broken JSONL lines
and value-level CSV junk and pin the degrade-don't-die contract:
bad lines land in the dead-letter frame verbatim, junk cells become
NULL, and good rows are untouched either way.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_pipe_spark.sources.text_formats import (
    CORRUPT_COL, coerce_columns, quarantine, read_csv, read_jsonl)


def test_jsonl_corrupt_lines_quarantined(spark, tmp_path):
    path = str(tmp_path / "docs.jsonl")
    lines = [
        '{"doc_id": 1, "lang": "en", "text": "hello\\nworld"}',
        'this is not json at all',
        '{"doc_id": 2, "lang": "de", "text": "guten tag"}',
        '{"doc_id": 3, "lang":',  # truncated mid-object
    ]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("lang", T.StringType()),
        T.StructField("text", T.StringType()),
    ])
    good, bad = quarantine(read_jsonl(spark, path, schema))
    got = {r["doc_id"]: r for r in good.collect()}
    assert set(got) == {1, 2}
    # the escaped newline round-trips back to a real newline
    assert got[1]["text"] == "hello\nworld"
    dead = sorted(r[CORRUPT_COL] for r in bad.collect())
    assert dead == ["this is not json at all", '{"doc_id": 3, "lang":']


def test_jsonl_type_mismatch_is_corrupt_not_silent(spark, tmp_path):
    # a parseable line whose field violates the schema type must be
    # surfaced, not silently nulled: PERMISSIVE nulls the FIELD but
    # keeps the raw line in the corrupt column for audit
    path = str(tmp_path / "typed.jsonl")
    with open(path, "w") as f:
        f.write('{"doc_id": "not-a-number", "lang": "en"}\n')
        f.write('{"doc_id": 7, "lang": "fr"}\n')
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("lang", T.StringType()),
    ])
    df = read_jsonl(spark, path, schema)
    rows = {r["lang"]: r for r in df.collect()}
    assert rows["fr"][CORRUPT_COL] is None and rows["fr"]["doc_id"] == 7
    assert rows["en"]["doc_id"] is None
    assert rows["en"][CORRUPT_COL] is not None


def test_csv_junk_values_coerce_to_null(spark, tmp_path):
    path = str(tmp_path / "drop.csv")
    with open(path, "w") as f:
        f.write("k,flag,price,qty\n")
        f.write("1,yes,12.50,42\n")
        f.write("2,no,N/A,3.7\n")        # junk price; "3.7" int-truncates
        f.write("3,2,oops,not-an-int\n")  # numeric-string bool; junk int
    schema = T.StructType([T.StructField(c, T.StringType())
                           for c in ("k", "flag", "price", "qty")])
    good, bad = quarantine(read_csv(spark, path, schema))
    # value junk is NOT structural damage (collect, not count: a
    # corrupt-only pruned scan is illegal — see quarantine docstring)
    assert len(bad.collect()) == 0
    typed = coerce_columns(good, {
        "k": "int", "flag": "bool", "price": "numeric", "qty": "int"})
    rows = {r["k"]: r for r in typed.collect()}
    assert rows[1]["flag"] is True and rows[1]["price"] == 12.5
    assert rows[1]["qty"] == 42
    assert rows[2]["flag"] is False and rows[2]["price"] is None
    assert rows[2]["qty"] == 3  # int("3.7") truncates, reference parity
    assert rows[3]["flag"] is True  # numeric branch: bool(2) -> True
    assert rows[3]["price"] is None and rows[3]["qty"] is None

    # decimal branch must ALSO degrade junk to NULL under ANSI mode
    # (try_cast, not cast — a plain cast raises on "oops")
    dec = coerce_columns(good, {"price": "decimal(18,4)"})
    drows = {r["k"]: r for r in dec.collect()}
    assert str(drows["1"]["price"]) == "12.5000"
    assert drows["2"]["price"] is None and drows["3"]["price"] is None

    # a typo'd spec key is an error, not a silent no-op
    with pytest.raises(ValueError, match="absent"):
        coerce_columns(good, {"pricee": "numeric"})


def test_csv_structural_damage_quarantined(spark, tmp_path):
    # wrong column count is structural: the row must reach the
    # dead-letter frame, not silently shift values across columns
    path = str(tmp_path / "broken.csv")
    with open(path, "w") as f:
        f.write("a,b,c\n")
        f.write("1,x,9\n")
        f.write("2,y\n")  # missing column
    schema = T.StructType([T.StructField(c, T.StringType())
                           for c in ("a", "b", "c")])
    good, bad = quarantine(read_csv(spark, path, schema))
    assert [r["a"] for r in good.collect()] == ["1"]
    assert len(bad.collect()) == 1


@pytest.mark.parametrize("name", ["jsonl_roundtrip_ingest",
                                  "csv_ingest_coerced"])
def test_registered_roundtrips_nonempty(spark, sf_dir, name):
    from etl_pipe_spark.plans.catalog import REGISTRY, _load_all
    _load_all()
    df = REGISTRY[name].fn(spark, sf_dir)
    assert df.count() > 0
    # scratch tree really lands under the per-process per-SF dir
    from etl_pipe_spark.plans.ingest_plans import _IO_ROOT
    tag = os.path.basename(os.path.normpath(sf_dir))
    assert os.path.isdir(os.path.join(_IO_ROOT, tag))


def test_csv_temporal_coercion(spark, tmp_path):
    path = str(tmp_path / "temporal.csv")
    with open(path, "w") as f:
        f.write("k,seen_at,day\n")
        f.write("1,2024-03-01 12:30:00,2024-03-01\n")
        f.write("2,not a time,2024-13-99\n")  # junk -> NULL, no error
    schema = T.StructType([T.StructField(c, T.StringType())
                           for c in ("k", "seen_at", "day")])
    good, _ = quarantine(read_csv(spark, path, schema))
    typed = coerce_columns(good, {"seen_at": "timestamp", "day": "date"})
    rows = {r["k"]: r for r in typed.collect()}
    assert str(rows["1"]["seen_at"]) == "2024-03-01 12:30:00"
    assert str(rows["1"]["day"]) == "2024-03-01"
    assert rows["2"]["seen_at"] is None and rows["2"]["day"] is None


def test_orc_timestamp_roundtrip_local(spark, tmp_path):
    """Raw ORC *timestamp* round trip, same-JVM (writer and reader share
    one ``user.timezone`` so the ORC tz adjustment cancels).  The
    registered orc_roundtrip_ingest query deliberately avoids ORC
    timestamps (DATE + unix_micros legs — see its docstring for the r6
    driver red this dodges); this local pin keeps the timestamp path
    itself covered."""
    import datetime

    path = str(tmp_path / "ts_orc")
    stamps = [
        datetime.datetime(1998, 10, 3, 0, 0, 0),
        datetime.datetime(2020, 2, 29, 23, 59, 59, 123456),
        datetime.datetime(1970, 1, 1, 0, 0, 1),
        None,
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(stamps)], "id long, ts timestamp_ntz"
    )
    df.write.mode("overwrite").orc(path)
    back = {
        r["id"]: r["ts"]
        for r in spark.read.schema(df.schema).orc(path).collect()
    }
    assert back == dict(enumerate(stamps))
