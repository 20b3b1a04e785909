"""Text-format ingestion under the differential harness: JSONL and
CSV round trips through the explicit-schema readers, the corrupt-
record quarantine, and the safe-coercion ladder
(sources/text_formats.py).

Each query writes a deterministic derivation of a parquet truth
table to its format, reads it back through the PRODUCTION ingest
path, and returns a projection the DuckDB oracle recomputes directly
from parquet — so a hash match proves the full write→parse→coerce
round trip is faithful, not merely that the query ran.  The JSONL
and CSV queries exercise sources/text_formats.py (PERMISSIVE parse,
quarantine, coercion ladder); the ORC query exercises Spark's native
columnar reader directly — ORC needs no text-layer quarantine, its
failure mode is scan-level, not line-level.

Scale shape: the written shards are line-delimited (splittable), the
read pins an explicit schema (no inference pass), and every coercion
is a native ``when``/``try_cast`` ladder — zero Python in the row
path.  Malformed-input behavior (quarantine, junk→NULL) is pinned by
tests/test_ingest_io.py, which feeds damage that the round trip here
deliberately never produces.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from ..functions.parity import dsum
from ..sources.catalog import load_table
from ..sources.text_formats import (
    coerce_columns, quarantine, read_csv, read_jsonl)
from .catalog import register

# Per-PROCESS scratch root: a fixed /tmp path would race concurrent
# runs (one process's overwrite deleting part files under another's
# still-lazy returned DataFrame) and accumulate forever.  mkdtemp is
# unique per process; within the process the path is stable, so the
# returned DataFrame can be re-evaluated (count, then hash) safely.
_IO_ROOT = tempfile.mkdtemp(prefix="etl_pipe_io-")
atexit.register(shutil.rmtree, _IO_ROOT, ignore_errors=True)


def _io_dir(sf_dir: str, name: str) -> str:
    """Deterministic-within-process per-SF scratch dir (overwritten
    every call, so a stale tree from a prior invocation can never
    leak into the result)."""
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return os.path.join(_IO_ROOT, tag, name)


_JSONL_ORACLE = """
SELECT doc_id, lang, source, n_chars,
       CAST(length(text) AS BIGINT) AS text_len
FROM documents
WHERE doc_id IS NOT NULL
ORDER BY doc_id
"""


@register("jsonl_roundtrip_ingest", oracle=_JSONL_ORACLE)
def jsonl_roundtrip_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents → JSONL shards → explicit-schema PERMISSIVE read →
    quarantine → projection.

    The text column carries arbitrary corpus bytes (newlines included
    — the JSON writer escapes them, which is exactly why JSONL stays
    line-splittable where raw text dumps would not).  The oracle
    recomputes the projection from parquet, so the hash certifies the
    escape/parse round trip character-for-character via the length
    check and the hashed lang/source/n_chars columns.
    """
    path = _io_dir(sf_dir, "documents_jsonl")
    src = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars", "text")
    src.coalesce(4).write.mode("overwrite").json(path)

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField("text", T.StringType()),
    ])
    good, _bad = quarantine(read_jsonl(spark, path, schema))
    # key-present contract: a "good" document must carry its id.  Also
    # keeps the scan legal under aggressive pruning (a count() over
    # the corrupt-null filter alone would be a corrupt-only scan,
    # which Spark rejects — see quarantine's docstring).
    good = good.filter(F.col("doc_id").isNotNull())
    return good.select(
        "doc_id", "lang", "source", "n_chars",
        F.length("text").cast("long").alias("text_len"),
    ).orderBy("doc_id")


_CSV_ORACLE = """
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       COUNT(*) AS n_priced,
       CAST(round(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
         AS sum_price,
       MAX(o_orderkey) AS max_key
FROM orders
GROUP BY o_orderstatus
ORDER BY o_orderstatus
"""


@register("csv_ingest_coerced", oracle=_CSV_ORACLE)
def csv_ingest_coerced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders → CSV drop → all-string schema read → safe-coercion
    ladder → exact grouped rollup.

    The CSV is read with an ALL-STRING schema (the untrusted-drop
    recipe: the parser only rejects structural damage; value-level
    junk reaches the coercion ladder as strings and degrades to NULL
    instead of killing the job).  Prices travel as decimal(18,4)
    strings and are summed as exact decimals after coercion, so the
    rollup is bit-deterministic under any partitioning and must equal
    DuckDB's direct-from-parquet computation.
    """
    path = _io_dir(sf_dir, "orders_csv")
    src = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").cast("string").alias("o_orderkey"),
        F.col("o_custkey").cast("string").alias("o_custkey"),
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(18,4)").cast("string")
        .alias("o_totalprice"),
    )
    src.coalesce(4).write.mode("overwrite").option("header", "true").csv(path)

    all_str = T.StructType([
        T.StructField(c, T.StringType())
        for c in ("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    ])
    good, _bad = quarantine(read_csv(spark, path, all_str))
    typed = coerce_columns(good, {
        "o_orderkey": "int",
        "o_custkey": "int",
        "o_totalprice": "decimal(18,4)",
    })
    return (
        typed.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.count("o_totalprice").alias("n_priced"),
            dsum(F.col("o_totalprice")).alias("sum_price"),
            F.max("o_orderkey").alias("max_key"),
        )
        .orderBy("o_orderstatus")
    )


_ORC_ORACLE = """
SELECT o_orderkey, o_orderstatus,
       CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS DOUBLE) AS price,
       CAST(o_orderdate AS DATE) AS o_orderdate,
       epoch_us(o_orderdate) AS o_orderdate_us
FROM orders
WHERE o_orderstatus = 'F' AND o_orderkey % 5 = 0
ORDER BY o_orderkey
"""


@register("orc_roundtrip_ingest", oracle=_ORC_ORACLE)
def orc_roundtrip_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders → ORC files → read back → projection, vs parquet truth.

    Completes the source-format matrix (parquet / JSONL / CSV / ORC /
    JDBC): ORC is the other splittable columnar format Spark ships a
    vectorized reader for, with the same pushdown/pruning contract as
    parquet.  The status equality is a searchable argument and must
    reach the ORC scan as a pushed filter (pinned in
    tests/test_physical_plans.py); the modulo term is row sampling
    evaluated above the scan.  The hash certifies type fidelity
    through the round trip for ints, strings, exact decimals, and the
    order date.

    The date rides the ORC leg TIMEZONE-FREE, twice: as ``DATE``
    (epoch days) and as ``bigint`` ``unix_micros`` (the r6 driver
    red: Spark's ORC timestamp writer/reader adjusts raw values by
    the JVM **default** timezone — ``user.timezone``, which
    ``spark.sql.session.timeZone`` does NOT control — so a driver JVM
    in a non-UTC zone shifts every stored timestamp by its offset
    while counts and schema stay green.  DATE and BIGINT have no such
    adjustment in the ORC spec, making the hashed output stable in
    any host timezone).  The raw ORC *timestamp* round trip stays
    covered by the local pin test
    tests/test_ingest_io.py::test_orc_timestamp_roundtrip_local,
    where writer and reader share one JVM and the adjustment cancels.

    The DECIMAL rides the ORC leg (type-fidelity through the file is
    the point), but the *hashed output surface* is re-cast to DOUBLE —
    the r7 driver red: the driver canonicalizes through pandas, where
    DuckDB DECIMAL lands as float64 while a Spark DecimalType column
    lands as ``Decimal`` objects, so the stringified hashes diverge
    even when values are equal.  Every other oracle already follows
    the cast-to-double convention (e.g. ``_CSV_ORACLE``); this was the
    registry's only raw-DECIMAL output column.
    """
    path = _io_dir(sf_dir, "orders_orc")
    src = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus",
        F.col("o_totalprice").cast("decimal(18,4)").alias("price"),
        F.col("o_orderdate").cast("date").alias("o_orderdate"),
        # ntz -> timestamp uses spark.sql.session.timeZone, which
        # pin_conf pins to UTC (session.py) — controlled, unlike the
        # JVM-default zone the ORC timestamp codec would consult
        F.unix_micros(F.col("o_orderdate").cast("timestamp"))
        .alias("o_orderdate_us"),
    )
    src.coalesce(4).write.mode("overwrite").orc(path)
    return (
        spark.read.schema(src.schema).orc(path)
        .filter((F.col("o_orderstatus") == "F")
                & (F.col("o_orderkey") % 5 == 0))
        .withColumn("price", F.col("price").cast("double"))
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# Schema evolution: mergeSchema read across writer generations
# ---------------------------------------------------------------------------

_EVOLVE_Q_MOD = 997  # integer quality score the v2 writer adds

_EVOLVE_ORACLE = f"""
WITH unioned AS (
  SELECT doc_id, lang, n_chars,
         CASE WHEN doc_id % 2 = 1 THEN n_chars % {_EVOLVE_Q_MOD} END
           AS quality_fp
  FROM documents
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(quality_fp) AS BIGINT) AS n_scored,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(coalesce(sum(quality_fp), 0) AS BIGINT) AS sum_quality
FROM unioned
GROUP BY lang
ORDER BY lang
"""


@register("schema_evolution_merge", oracle=_EVOLVE_ORACLE)
def schema_evolution_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two writer generations, one mergeSchema read — the lakehouse
    evolution path: the v1 writer never heard of the ``quality_fp``
    column, the v2 writer emits it, and the reader must surface the
    union schema with NULLs where the old files are silent.

    The split is deterministic (even doc_ids through the v1 writer,
    odd through v2 with an integer quality score), so the DuckDB twin
    recomputes the merged result straight from the truth table — a
    hash match proves the evolved read is faithful: no dropped column,
    no misaligned NULLs, no type widening surprises.

    Scale: ``mergeSchema=true`` unions footers at PLANNING time (one
    pass over file metadata, no data read) — the per-file reads then
    project the union schema natively; cost is the footer listing, not
    a data rewrite.  Production evolves tables exactly this way until
    a compaction (operators/layout.py) rewrites old generations.
    """
    out_dir = _io_dir(sf_dir, "evolve")
    base = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.col("n_chars").cast("bigint").alias("n_chars")
    )
    base.filter(F.col("doc_id") % 2 == 0).write.mode("overwrite").parquet(
        os.path.join(out_dir, "gen=v1")
    )
    (
        base.filter(F.col("doc_id") % 2 == 1)
        .withColumn(
            "quality_fp",
            (F.col("n_chars") % _EVOLVE_Q_MOD).cast("bigint"),
        )
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "gen=v2"))
    )
    merged = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(out_dir, "gen=v1"), os.path.join(out_dir, "gen=v2")
    )
    return (
        merged.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.count("quality_fp").cast("bigint").alias("n_scored"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
            F.coalesce(F.sum("quality_fp"), F.lit(0)).cast("bigint")
            .alias("sum_quality"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Whole-file binary ingest: the multimodal landing-zone read path
# ---------------------------------------------------------------------------

_BF_SHARDS = 8

_BINARYFILE_ORACLE = f"""
SELECT CAST(doc_id % {_BF_SHARDS} AS BIGINT) AS shard,
       CAST(sum(length(text) + 1) AS BIGINT) AS n_bytes,
       md5(string_agg(text, chr(10) ORDER BY doc_id) || chr(10)) AS content_md5
FROM documents
GROUP BY doc_id % {_BF_SHARDS}
ORDER BY shard
"""


@register("binaryfile_ingest", oracle=_BINARYFILE_ORACLE)
def binaryfile_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-file binary read: write text shards, re-ingest as bytes.

    Completes the source matrix with Spark's ``binaryFile`` format —
    the landing-zone read path for opaque media blobs (images/audio:
    operators/multimodal.py consumes exactly this shape).  Documents
    are sharded by ``doc_id % {_BF_SHARDS}``, each shard written as
    ONE text file (repartition on the shard column puts a shard in one
    task; the partitionBy(shard) writer then emits a single file per
    value), then the directory is re-read as whole files: one row per
    file with the raw ``content`` bytes and the discovered ``shard``
    partition column.

    The hash certifies BYTE fidelity end to end: Spark md5s the raw
    file content, while DuckDB reconstructs each file's exact bytes
    from the parquet truth table (newline-terminated lines in doc_id
    order — the writer's sortWithinPartitions) and md5s the same
    string; the corpus is ASCII so char-length + 1 per line equals the
    byte length Spark reports.  A one-byte divergence anywhere in the
    write→read path flips the hash.

    Scale: binaryFile rows must fit an executor (the format's
    contract); real media lakes keep per-file sizes bounded at write
    time exactly like this shard writer.  The scan parallelizes per
    file, the md5/length projection is JVM-side, and the oracle-side
    ORDER BY shard is {_BF_SHARDS} rows.
    """
    path = _io_dir(sf_dir, "docs_binaryfile")
    docs = load_table(spark, sf_dir, "documents")
    (
        docs.select(
            (F.col("doc_id") % _BF_SHARDS).cast("long").alias("shard"),
            "doc_id",
            F.col("text").alias("value"),
        )
        .repartition(_BF_SHARDS, "shard")
        # sort by (shard, doc_id), not doc_id alone: hash partitioning
        # can co-locate two shard values in one task, and the
        # partitionBy writer inserts its own sort on `shard` — doc_id
        # order inside each shard would then survive only if that sort
        # happens to be stable, an implementation detail.  The explicit
        # composite sort satisfies the writer's requirement (no extra
        # sort inserted) and makes within-shard line order a contract.
        .sortWithinPartitions("shard", "doc_id")
        .select("shard", "value")
        .write.mode("overwrite")
        .partitionBy("shard")
        .text(path)
    )
    # One output row per FILE (no aggregation): if the writer ever
    # produced two files for a shard, the row count itself would
    # diverge from the oracle's one-row-per-shard — the single-file
    # property is part of what the differential certifies.
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.txt")
        .load(path)
        .select(
            F.col("shard").cast("long").alias("shard"),
            F.length("content").cast("long").alias("n_bytes"),
            F.md5("content").alias("content_md5"),
        )
        .orderBy("shard")
    )
