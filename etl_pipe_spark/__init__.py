"""etl_pipe_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of the ClearSight 2.0 ETL reference
(Piyush30P/ETL-pipe): incremental watermark scans, denormalizing
joins, conditional aggregation, multi-branch UNION ALL event logs,
JSON flattening with lenient coercion, SCD-style current-version
tracking, and idempotent upsert/dedup sinks — plus the
LLM-data-pipeline extensions (dedup, similarity search, text
analysis, multimodal column plumbing).

Everything is expressed as lazy DataFrame transformations so Catalyst
handles predicate pushdown, column pruning, join strategy selection
and AQE; no row-at-a-time Python on the hot path.
"""

__version__ = "0.1.0"
