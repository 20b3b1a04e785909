"""Physical layout operators: the Spark replacement for the reference's
7 serving-side indexes (reference setup_target.py:104-240; SURVEY §4
"Index-backed serving").

On a cluster, scan pruning comes from layout, not b-trees:

* date partitioning on fact tables -> partition pruning on time
  predicates (the reference's idx_timeline_time equivalent);
* bucketing on join/merge keys -> co-located joins without a shuffle
  (the reference's unique-key indexes feeding ON CONFLICT);
* sorted-within-files writes -> parquet min/max row-group skipping
  (the partial index WHERE is_current_version analogue is simply a
  partition column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def write_date_partitioned(
    df: DataFrame, path: str, ts_col: str, granularity: str = "month",
    mode: str = "overwrite",
) -> None:
    """Date-partitioned fact write: time predicates prune directories.

    Month granularity keeps partition counts sane at 100 TB (day-level
    on a multi-year fact creates small-file pressure; AQE coalesce
    plus month partitions is the usual budget).
    """
    fmt = {"day": "yyyy-MM-dd", "month": "yyyy-MM", "year": "yyyy"}[granularity]
    (
        df.withColumn("__dt", F.date_format(F.col(ts_col), fmt))
        .repartition("__dt")
        .write.mode(mode)
        .partitionBy("__dt")
        .parquet(path)
    )


def read_date_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path).drop("__dt")


def write_bucketed_table(
    df: DataFrame, table_name: str, key: str, n_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    """Bucketed managed table: later equi-joins/merges on ``key``
    co-locate without a shuffle (both sides bucketed the same way)."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)


def _parse_byte_conf(raw: str, default: int) -> int:
    """Spark size confs come back as '134217728b' / '128m' / '64mb'
    style.  Two-letter suffixes MUST be tried before the bare 'b',
    or '64mb' strips to '64m' in the 'b' branch and fails to parse."""
    s = raw.strip().lower()
    for suffix, mult in (("kb", 1 << 10), ("mb", 1 << 20), ("gb", 1 << 30),
                         ("tb", 1 << 40), ("pb", 1 << 50),
                         ("b", 1), ("k", 1 << 10), ("m", 1 << 20),
                         ("g", 1 << 30), ("t", 1 << 40), ("p", 1 << 50)):
        if s.endswith(suffix):
            try:
                return int(float(s[: -len(suffix)]) * mult)
            except ValueError:
                return default
    try:
        return int(s)
    except ValueError:
        return default


def _planned_scan_width(spark: SparkSession, df: DataFrame) -> int:
    """Estimate the file scan's planned partition count WITHOUT the
    ``df.rdd`` conversion (which forces a full plan translation to RDD
    — measurable on a 100k-file table).  For file-backed frames this
    mirrors Spark's own FilePartition sizing: split budget =
    min(maxPartitionBytes, max(openCostInBytes, bytes/parallelism))
    over the relation's catalog size (driver-side metadata from the
    already-materialized file index — no job, no RDD translation).
    Non-file inputs (memory relations, post-shuffle frames) fall back
    to the RDD probe; the gate's call sites are all scan-rooted, so
    the fallback is the rare path, and the gate is only meaningful for
    scan-rooted frames anyway — a post-shuffle input reports its
    static shuffle width, which is exactly the "already wide" answer.
    Caveat that goes with the scan-rooted contract: the optimized
    plan's sizeInBytes is scaled down by column pruning, so a narrow
    projection over a wide table UNDER-estimates the true split count
    and may spread an already-wide scan (one redundant exchange, never
    a wrong result); call the gate on the raw loaded table, as every
    in-repo call site does.
    """
    try:
        files = df.inputFiles()
        total = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        files = []
    if not files:
        try:
            return df.rdd.getNumPartitions()
        except Exception:
            return 1  # un-plannable input: assume narrow, spread it
    max_pb = _parse_byte_conf(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728b"),
        128 << 20)
    open_cost = _parse_byte_conf(
        spark.conf.get("spark.sql.files.openCostInBytes", "4194304b"),
        4 << 20)
    parallelism = max(1, spark.sparkContext.defaultParallelism)
    padded = total + len(files) * open_cost
    split = min(max_pb, max(open_cost, padded // parallelism or 1))
    width = max(1, -(-padded // split))
    # A parquet SPLIT can never be finer than a ROW GROUP: a fat
    # single-row-group file (pyarrow's default writes up to 1M rows
    # per group) reports a healthy size-based width while every split
    # except one comes back empty — measured 10x wall time on a 260 MB
    # one-group corpus whose "33 planned splits" ran as one task.
    # Clamp by the actual group count when the footers are cheap to
    # stat (few local files; remote/non-parquet inputs skip).
    rg = _parquet_total_row_groups(files)
    if rg is not None:
        width = min(width, rg)
    return width


_ROW_GROUP_CACHE: dict[tuple[str, ...], int | None] = {}


def _parquet_total_row_groups(files: list[str], cap_files: int = 64) -> int | None:
    """Sum of row-group counts across the scan's parquet files, or
    None when the input isn't all-LOCAL-parquet or has too many files
    to stat cheaply.

    Scheme allowlist, not duck-typing: pyarrow can open s3://, gs://,
    and hdfs:// URIs when the matching filesystem package is present,
    so "rely on the open failing" would turn every spread gate into
    up to ``cap_files`` synchronous remote footer GETs on the driver —
    the per-file RPC storm this module's size estimator exists to
    avoid.  Results are memoized per file list (footers are immutable
    for a given listing; a rewritten table produces new file names)."""
    if not files or len(files) > cap_files:
        return None
    if not all(f.endswith(".parquet") for f in files):
        return None
    if not all(f.startswith(("/", "file:")) for f in files):
        return None  # object-store / remote input: skip the clamp
    key = tuple(files)
    if key in _ROW_GROUP_CACHE:
        return _ROW_GROUP_CACHE[key]
    try:
        import pyarrow.parquet as pq

        total = 0
        for f in files:
            local = f[7:] if f.startswith("file://") else f
            local = local[5:] if local.startswith("file:") else local
            total += pq.ParquetFile(local).metadata.num_row_groups
        result: int | None = max(1, total)
    except Exception:
        result = None
    if len(_ROW_GROUP_CACHE) > 256:  # bounded: a long session's tables
        _ROW_GROUP_CACHE.clear()
    _ROW_GROUP_CACHE[key] = result
    return result


def spread_for_compute(
    spark: SparkSession, df: DataFrame, min_ratio: float = 0.5
) -> DataFrame:
    """Round-robin ``df`` across the session's shuffle width — but only
    when the scan is narrower than the compute width.

    The small-input / heavy-expansion idiom: text pipelines (shingling,
    token explodes) multiply bytes 10-100x AFTER the scan, so a table
    that fits in one input split runs its entire expansion serially.
    One cheap exchange of the raw rows buys full-width CPU parallelism
    for every downstream narrow stage.  On a real multi-file 100 TB
    table the scan is already wide, so the exchange would be a full
    extra shuffle of the corpus that buys nothing: it is SKIPPED when
    the planned scan partition count is already >= ``min_ratio`` of
    the shuffle width.  The width estimate is file-listing/stats based
    (see _planned_scan_width) — no job and no RDD-plan translation.
    Two consumers of the same spread share the exchange
    (ReuseExchange).
    """
    width = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    planned = _planned_scan_width(spark, df)
    if planned >= max(1, int(width * min_ratio)):
        return df
    return df.repartition(width)


def compact(df: DataFrame, path: str, target_partitions: int) -> None:
    """Small-file compaction at a FIXED file count: rewrite a dataset
    via coalesce.  Prefer :func:`compact_to_size` — it sizes the file
    count from the actual bytes and can preserve clustering."""
    df.coalesce(target_partitions).write.mode("overwrite").parquet(path)


def _listed_total_bytes(spark: SparkSession, files: list[str]) -> int:
    """Sum file lengths from filesystem LISTINGS — one ``listStatus``
    RPC per distinct parent directory of ``files`` (not one
    ``getFileStatus`` per file, which would be a million RPCs against
    an object store; not a row scan, which would read the data).
    Zero-row files are counted: they still appear in ``inputFiles()``
    and carry footer bytes."""
    from collections import defaultdict

    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    by_dir: dict[str, set[str]] = defaultdict(set)
    for f in files:
        d, _, name = f.rpartition("/")
        by_dir[d].add(name)
    total = 0
    for d, names in by_dir.items():
        dp = jvm.org.apache.hadoop.fs.Path(d)
        fs = dp.getFileSystem(hconf)
        for st in fs.listStatus(dp):
            if st.getPath().getName() in names:
                total += st.getLen()
    return int(total)


def compact_to_size(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_bytes: int = 128 << 20,
    sort_cols: list[str] | None = None,
    partition_cols: list[str] | None = None,
) -> dict:
    """Size-targeted small-file compaction — the OPTIMIZE maintenance
    job every long-lived incremental sink needs (each micro-batch
    leaves a few small files; a year of 30 s cycles leaves a million).

    * The output file count comes from the dataset's ACTUAL bytes,
      summed from a real filesystem listing (one ``listStatus`` per
      source directory over the scan's ``inputFiles()`` — metadata
      RPCs only, the data is NOT read), so files land near
      ``target_bytes`` regardless of how skewed the input files are.
      An earlier revision summed the per-row ``_metadata.file_size``
      hidden column, which silently cost a full scan of every row
      plus a shuffle — exactly wrong for a maintenance job scheduled
      against 100 TB sinks.
    * ``sort_cols`` preserves CLUSTERING: plain ``coalesce`` glues
      arbitrary input files together, destroying the footer min/max
      locality a z-ordered or sorted write paid for — with
      ``sort_cols`` the rewrite range-partitions and re-sorts on the
      same keys, so pruning survives compaction (pinned against real
      footers in tests/test_layout_ops.py).
    * ``partition_cols`` preserves HIVE PARTITIONING: reading a
      partitioned tree promotes the directory columns to data
      columns, and an unpartitioned rewrite would flatten them —
      destroying directory pruning.  Pass the partition columns and
      the rewrite re-emits the same tree (``target_bytes`` then
      applies per partition on average, not per file).
    * Never in-place — ENFORCED: readers of ``src_path`` keep a
      consistent view and a mid-job crash cannot destroy the only
      copy; the caller swaps paths (or a sink snapshot pointer)
      after the rewrite.

    Returns {files_before, files_after, total_bytes} for the
    maintenance log (file counts via driver-side listings, no extra
    job).
    """
    import os as _os

    if _os.path.realpath(src_path) == _os.path.realpath(dst_path):
        raise ValueError(
            "compact_to_size is never-in-place: src and dst resolve to "
            f"the same location ({src_path!r})")
    src = spark.read.parquet(src_path)
    in_files = src.inputFiles()
    files_before = len(in_files)
    total_bytes = _listed_total_bytes(spark, in_files)
    n_out = max(1, -(-total_bytes // target_bytes))
    if sort_cols:
        out = src.repartitionByRange(n_out, *sort_cols) \
                 .sortWithinPartitions(*sort_cols)
    else:
        out = src.repartition(n_out)
    writer = out.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(dst_path)
    files_after = len(spark.read.parquet(dst_path).inputFiles())
    return {"files_before": files_before, "files_after": files_after,
            "total_bytes": total_bytes}
