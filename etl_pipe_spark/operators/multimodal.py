"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for 100 TB media pipelines: image/audio/video ride as
``binary`` columns next to relational metadata; decode / feature
extraction runs as Arrow-batched ``mapInPandas`` so each task
processes whole record batches without JVM<->Python row churn, and
partitioning/pushdown still work on the metadata columns.

The actual codec step is STUBBED (no PIL/ffmpeg in this environment):
``decode_image``/``decode_audio`` raise NotImplementedError behind an
import-try, and ``extract_features`` computes deterministic
byte-level features (length, md5, magic sniff) so the Spark-side
plumbing — schema, batch iteration, binary Arrow transfer — is real
and oracle-testable.
"""

from __future__ import annotations

import hashlib
import sys
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

# Python workers unpickle mapInPandas functions by reference, which
# requires this package on the *worker's* sys.path — not guaranteed
# when the driver imported us via an explicit path (e.g. the test
# harness).  Registering the module for by-value pickling makes the
# shipped closure self-contained.
try:
    from pyspark import cloudpickle as _cp
except ImportError:  # pragma: no cover
    import cloudpickle as _cp
_cp.register_pickle_by_value(sys.modules[__name__])

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, content_md5 string, sniffed_format string, "
    "decode_status string"
)

_MAGIC = [
    (b"\x89PNG", "png"),
    (b"\xff\xd8\xff", "jpeg"),
    (b"RIFF", "riff"),
    (b"%PDF", "pdf"),
]


# This build ships no media codecs (PIL/soundfile/ffmpeg absent), so the
# decode step is a documented constant stub: deterministic, environment-
# independent (the oracle pins the literal), and cheap (no per-row import
# probing).  Wiring a real codec replaces decode_payload below.
DECODE_STATUS_STUB = "stub:no-codec"


def decode_payload(payload: bytes):
    """Codec entry point — intentionally unimplemented in this build.

    A real deployment dispatches on the sniffed format to PIL /
    soundfile / ffmpeg here; poison-pill media must be routed to a
    status column, never allowed to kill a 100 TB job.
    """
    raise NotImplementedError("no media codecs in this build; see DECODE_STATUS_STUB")


def _sniff(payload: bytes) -> str:
    for magic, name in _MAGIC:
        if payload[: len(magic)] == magic:
            return name
    return "raw"


def extract_features(binary_df: DataFrame, id_col: str = "doc_id",
                     payload_col: str = "payload") -> DataFrame:
    """Arrow-batched feature extraction over a binary column.

    One pandas batch in, one out — no per-row Python calls; this is
    the shape a real image-resize / frame-sample / embed step takes.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "content_md5": payloads.map(lambda b: hashlib.md5(b).hexdigest()),
                    "sniffed_format": payloads.map(_sniff),
                    "decode_status": DECODE_STATUS_STUB,
                }
            )

    return binary_df.mapInPandas(op, FEATURE_SCHEMA)


def documents_as_binary(docs: DataFrame) -> DataFrame:
    """Model the documents table as a multimodal source: payload is an
    opaque binary column (UTF-8 bytes here; JPEG/WAV in production)."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.col("lang").alias("lang"),
            F.col("source").alias("source"),
            F.col("n_chars").alias("n_chars"),
        ).alias("meta"),
    )
