"""LLM-training-data pipeline operators (SURVEY §2.12, driver north star):
dedup, text analysis, similarity search, multimodal plumbing.

Everything here is built for 100 TB shape: hash-bucketed candidate
generation instead of quadratic pair enumeration wherever the
semantics allow, broadcast for small query sets, and native
expressions (no row-at-a-time Python) on the hot paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..functions import text as TX
from ..functions import vectors as VX
from ..operators.multimodal import documents_as_binary, extract_features
from ..sources.catalog import load_table
from .catalog import register

# --------------------------------------------------------------------------
# Exact dedup (hash groupBy).
# --------------------------------------------------------------------------

_EXACT_DEDUP_ORACLE = """
SELECT lower(trim(text)) AS text_norm,
       min(doc_id) AS canonical_doc_id,
       count(*) AS n_copies
FROM documents
GROUP BY 1
"""


@register("dedup_exact", oracle=_EXACT_DEDUP_ORACLE)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via hash groupBy on normalized text.

    Deterministic canonical pick (min doc_id) instead of
    dropDuplicates' arbitrary row — at scale this is one shuffle on
    the (skew-resistant) text hash.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.lower(F.trim(F.col("text"))).alias("text_norm"))
        .agg(F.min("doc_id").alias("canonical_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


# --------------------------------------------------------------------------
# Token counting (whitespace + BPE-ish regex).
# --------------------------------------------------------------------------

_TOKEN_STATS_ORACLE = f"""
SELECT doc_id,
       len(string_split_regex(trim(text), '\\s+')) AS n_ws_tokens,
       len(regexp_extract_all(text, '{TX.TOKEN_RE}')) AS n_bpe_tokens,
       length(text) AS n_chars,
       length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS n_punct
FROM documents
"""


@register("text_token_stats", oracle=_TOKEN_STATS_ORACLE)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish regex tokens."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        TX.token_count(F.col("text")).cast("long").alias("n_ws_tokens"),
        F.size(TX.regex_tokens(F.col("text"))).cast("long").alias("n_bpe_tokens"),
        F.length("text").cast("long").alias("n_chars"),
        TX.punct_count(F.col("text")).cast("long").alias("n_punct"),
    )


# --------------------------------------------------------------------------
# Quality scoring (length / punctuation / stopword ratios).
# --------------------------------------------------------------------------

_SW_EN = ", ".join(f"'{w}'" for w in TX.STOPWORDS["en"])

_QUALITY_ORACLE = f"""
WITH t AS (
  SELECT doc_id, lang, text,
         string_split_regex(trim(lower(text)), '\\s+') AS toks
  FROM documents
)
SELECT doc_id, lang,
  len(toks) AS n_tokens,
  CAST(len(list_filter(toks, x -> x IN ({_SW_EN}))) AS BIGINT) AS n_stopwords,
  CAST(len(list_filter(toks, x -> x IN ({_SW_EN}))) AS DOUBLE) / CAST(len(toks) AS DOUBLE)
    AS stopword_ratio,
  CAST(length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
    / CAST(length(text) AS DOUBLE) AS punct_ratio,
  CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
    / CAST(len(toks) AS DOUBLE) AS mean_token_len
FROM t
"""


@register("doc_quality_score", oracle=_QUALITY_ORACLE)
def doc_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality signals per document (length/punct/stopword ratios)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = TX.ws_tokens(F.lower(F.col("text")))
    n_tokens = F.size(toks)
    n_stop = TX.stopword_hits(toks, TX.STOPWORDS["en"])
    return docs.select(
        "doc_id",
        "lang",
        n_tokens.cast("long").alias("n_tokens"),
        n_stop.cast("long").alias("n_stopwords"),
        (n_stop.cast("double") / n_tokens.cast("double")).alias("stopword_ratio"),
        (TX.punct_count(F.col("text")).cast("double") / F.length("text").cast("double"))
        .alias("punct_ratio"),
        TX.mean_token_len(toks).alias("mean_token_len"),
    )


# --------------------------------------------------------------------------
# Language ID (stopword-hit heuristic with deterministic tie-break).
# --------------------------------------------------------------------------

def _duck_lang_hits(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in TX.STOPWORDS[lang])
    return f"len(list_filter(toks, x -> x IN ({words})))"


_LANG_ORACLE = f"""
WITH t AS (
  SELECT doc_id, lang AS labeled_lang,
         string_split_regex(trim(lower(text)), '\\s+') AS toks
  FROM documents
), scored AS (
  SELECT doc_id, labeled_lang,
         {_duck_lang_hits('en')} AS hits_en,
         {_duck_lang_hits('de')} AS hits_de,
         {_duck_lang_hits('es')} AS hits_es,
         {_duck_lang_hits('fr')} AS hits_fr
  FROM t
)
SELECT doc_id, labeled_lang, hits_en, hits_de, hits_es, hits_fr,
  CASE
    WHEN hits_en = 0 AND hits_de = 0 AND hits_es = 0 AND hits_fr = 0 THEN 'unknown'
    WHEN hits_en >= hits_de AND hits_en >= hits_es AND hits_en >= hits_fr THEN 'en'
    WHEN hits_de >= hits_es AND hits_de >= hits_fr THEN 'de'
    WHEN hits_es >= hits_fr THEN 'es'
    ELSE 'fr'
  END AS predicted_lang
FROM scored
"""


@register("lang_id_stopwords", oracle=_LANG_ORACLE)
def lang_id_stopwords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: stopword hits per language, priority tie-break."""
    docs = load_table(spark, sf_dir, "documents")
    toks = TX.ws_tokens(F.lower(F.col("text")))
    scored = docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        *[
            TX.stopword_hits(toks, TX.STOPWORDS[lang]).cast("long").alias(f"hits_{lang}")
            for lang in TX.LANG_PRIORITY
        ],
    )
    h = {lang: F.col(f"hits_{lang}") for lang in TX.LANG_PRIORITY}
    predicted = (
        F.when((h["en"] == 0) & (h["de"] == 0) & (h["es"] == 0) & (h["fr"] == 0), "unknown")
        .when((h["en"] >= h["de"]) & (h["en"] >= h["es"]) & (h["en"] >= h["fr"]), "en")
        .when((h["de"] >= h["es"]) & (h["de"] >= h["fr"]), "de")
        .when(h["es"] >= h["fr"], "es")
        .otherwise("fr")
    )
    return scored.withColumn("predicted_lang", predicted)


# --------------------------------------------------------------------------
# Document fingerprinting (md5 + 60-bit integer).
# --------------------------------------------------------------------------

_FINGERPRINT_ORACLE = f"""
SELECT doc_id,
       md5(lower(trim(text))) AS content_md5,
       {TX.DUCK_HASH60.format(col='lower(trim(text))')} AS fingerprint60
FROM documents
"""


@register("doc_fingerprint", oracle=_FINGERPRINT_ORACLE)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprints: md5 text hash + engine-portable 60-bit int."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.lower(F.trim(F.col("text")))
    return docs.select(
        "doc_id",
        F.md5(norm).alias("content_md5"),
        TX.hash60(norm).alias("fingerprint60"),
    )


# --------------------------------------------------------------------------
# Similarity search: brute-force top-k cosine (baseline).
# --------------------------------------------------------------------------

_TOPK_COSINE_ORACLE = """
WITH e AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), q AS (
  SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 100 = 0
), scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_dot_product(q.qv, e.v)
           / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v))) AS cosine,
         row_number() OVER (
           PARTITION BY q.query_id
           ORDER BY list_dot_product(q.qv, e.v)
                  / (sqrt(list_dot_product(q.qv, q.qv)) * sqrt(list_dot_product(e.v, e.v))) DESC,
             e.vec_id) AS rnk
  FROM q CROSS JOIN e
  WHERE e.vec_id != q.query_id
)
SELECT query_id, neighbor_id, cosine, rnk FROM scored WHERE rnk <= 5
"""


@register("similarity_topk_cosine", oracle=_TOPK_COSINE_ORACLE)
def similarity_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: broadcast query set × candidate scan.

    Baseline for the incremental/approximate top-k strategies surveyed
    in PAPERS.md (EDBT 2020 incremental top-k similarity; SIGMOD 2020
    continuously adaptive similarity search) — those motivate the
    IVF/SRP variants as the adaptive scale paths.

    The baseline ANN path: the (small) query set broadcasts, the
    candidate side streams — one pass, no quadratic shuffle.  The
    bucketed variant (similarity_ann_bucketed) is the 100 TB path.
    """
    # per-vector norms precomputed before the join (pair-invariant, so
    # the O(queries x candidates) hot path folds only the cross-dot;
    # bit-identical — see embedding_neardup_pairs)
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", VX.as_double(F.col("embedding")).alias("v"))
        .withColumn("v_norm", VX.norm(F.col("v")))
    )
    q = emb.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("v_norm").alias("qv_norm"),
    )
    cos = VX.safe_div(VX.dot(F.col("qv"), F.col("v")),
                      F.col("qv_norm") * F.col("v_norm"))
    scored = (
        emb.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cosine"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return scored.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= 5)


# --------------------------------------------------------------------------
# Embedding near-duplicate pairs (same-label blocking + threshold).
# --------------------------------------------------------------------------

_NEARDUP_ORACLE = """
WITH e AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
)
SELECT a.vec_id AS left_id, b.vec_id AS right_id, a.label AS label,
       list_dot_product(a.v, b.v)
         / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) AS cosine
FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_dot_product(a.v, b.v)
        / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.35
"""


@register("embedding_neardup_pairs", oracle=_NEARDUP_ORACLE)
def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: blocked self-join + threshold.

    Blocking on label keeps the pair count linear per block — the
    same role LSH buckets play when no natural key exists.
    """
    # Norms are precomputed per VECTOR, not per pair: the cosine's two
    # sqrt(dot(v,v)) folds are pair-invariant, so evaluating them in
    # the pre-join projection turns 3 interpreted 64-element folds per
    # pair into 1 (the cross-dot) — bit-identical value, ~3x less fold
    # work on the O(pairs) hot path (measured 4.6 s -> 2.4 s at sf0.1).
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "label", VX.as_double(F.col("embedding")).alias("v"))
        .withColumn("v_norm", VX.norm(F.col("v")))
    )
    a = emb.alias("a")
    b = emb.alias("b")
    cos = VX.safe_div(VX.dot(F.col("a.v"), F.col("b.v")),
                      F.col("a.v_norm") * F.col("b.v_norm"))
    return (
        a.join(b, (F.col("a.label") == F.col("b.label")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(
            F.col("a.vec_id").alias("left_id"),
            F.col("b.vec_id").alias("right_id"),
            F.col("a.label").alias("label"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= 0.35)
    )


# --------------------------------------------------------------------------
# Multimodal: binary payload + Arrow-batched feature extraction.
# --------------------------------------------------------------------------

_MULTIMODAL_ORACLE = """
SELECT doc_id,
       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
       md5(text) AS content_md5,
       'raw' AS sniffed_format,
       'stub:no-codec' AS decode_status
FROM documents
"""


@register("multimodal_features", oracle=_MULTIMODAL_ORACLE)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column plumbing: documents as opaque payloads through an
    Arrow-batched mapInPandas feature extractor (decode step stubbed;
    see operators/multimodal.py)."""
    docs = load_table(spark, sf_dir, "documents")
    return extract_features(documents_as_binary(docs))


_FRAME_SAMPLE_ORACLE = """
SELECT doc_id,
       CAST(t.i AS INT) AS frame_idx,
       CAST(length(substr(text, CAST(t.i AS BIGINT) * 64 + 1, 64)) AS BIGINT)
         AS n_frame_chars,
       md5(substr(text, CAST(t.i AS BIGINT) * 64 + 1, 64)) AS frame_md5
FROM documents,
     UNNEST(range(0, CAST(ceil(length(text) / 64.0) AS BIGINT), 2)) AS t(i)
"""


@register("multimodal_frame_sample", oracle=_FRAME_SAMPLE_ORACLE)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over multimodal payloads (the 1 -> N shape):
    every 2nd 64-char "frame" of each document, digested — see
    operators/multimodal.sample_frames for why the fan-out happens
    inside the Arrow batch (shuffle carries sampled frames, never raw
    payloads).  Char-based framing keeps the digest engine-portable:
    both sides hash the UTF-8 bytes of the same code-point slice.
    """
    from ..operators.multimodal import sample_frames

    return sample_frames(load_table(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD 2003)
# --------------------------------------------------------------------------

WINNOW_K = 4   # tokens per k-gram
WINNOW_W = 4   # k-gram hashes per winnowing window

_WINNOW_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w
  FROM documents
), grams AS (
  SELECT doc_id, CAST(t.i AS BIGINT) AS pos,
         {TX.DUCK_HASH32.format(
             col=f"array_to_string(w[(t.i):(t.i + {WINNOW_K} - 1)], ' ')")} AS h
  FROM toks, unnest(range(1, len(w) - {WINNOW_K} + 2)) AS t(i)
  WHERE len(w) >= {WINNOW_K}
), counts AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams FROM grams GROUP BY doc_id
), spans AS (
  SELECT doc_id, CAST(t.j AS BIGINT) AS j
  FROM counts, unnest(range(1, greatest(n_grams - {WINNOW_W} + 1, 1) + 1)) AS t(j)
), win_min AS (
  SELECT s.doc_id, s.j, g.pos, g.h,
         row_number() OVER (PARTITION BY s.doc_id, s.j
                            ORDER BY g.h ASC, g.pos DESC) AS rn
  FROM spans s
  JOIN grams g ON g.doc_id = s.doc_id
             AND g.pos BETWEEN s.j AND s.j + {WINNOW_W} - 1
), sel AS (
  SELECT DISTINCT doc_id, pos, h FROM win_min WHERE rn = 1
)
SELECT c.doc_id,
       c.n_grams,
       CAST(count(s.pos) AS BIGINT) AS n_fp,
       CAST(coalesce(sum(s.h), 0) AS BIGINT) AS fp_sum,
       CAST(min(s.h) AS BIGINT) AS fp_min,
       CAST(max(s.h) AS BIGINT) AS fp_max
FROM counts c LEFT JOIN sel s USING (doc_id)
GROUP BY c.doc_id, c.n_grams
ORDER BY c.doc_id
"""


_WINNOW_SCHEMA = ("doc_id bigint, n_grams bigint, n_fp bigint, "
                  "fp_sum bigint, fp_min bigint, fp_max bigint")


def _winnow_batches(batches):
    """Arrow kernel for winnowing: per doc, k-gram md5 hashes then the
    rightmost minimal hash of every W-window via sliding_window_view +
    reversed argmin (numpy's first-min-on-the-reversed-axis IS the
    rightmost min of the original).

    The TOKEN arrays arrive (ragged list<string>, offsets/flatten keep
    the transfer buffer-level); grams and hashes are built here because
    the JVM expression route is the slow path for once: a measured
    stage profile at 250k docs / 12.35M grams put the interpreted
    `transform(sequence, slice+concat_ws)` shingle construction at
    88 s and the md5 transform at +11 s, versus ~4 s for tokenizing
    alone — hashlib.md5 over the same gram strings costs ~1 µs/gram
    here.  Hash parity with TX.hash32 / TX.DUCK_HASH32 is exact: the
    first 8 hex chars of md5 == the first 4 digest bytes big-endian.
    """
    import hashlib
    import numpy as np
    import pyarrow as pa
    from numpy.lib.stride_tricks import sliding_window_view

    w, k = WINNOW_W, WINNOW_K
    md5 = hashlib.md5
    for b in batches:
        if not len(b):
            continue
        ids = b.column(0).to_numpy(zero_copy_only=False).astype(np.int64)
        col = b.column(1)
        off = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        toks = col.flatten().to_pylist()  # one C-path conversion
        off = off - off[0]  # flatten() is slice-adjusted; offsets are not
        out = np.empty((len(b), 5), dtype=np.int64)
        keep = np.zeros(len(b), dtype=bool)
        for i in range(len(b)):
            t = toks[off[i]:off[i + 1]]
            n = len(t) - k + 1
            if n < 1:
                continue  # no grams: excluded, like the oracle's counts CTE
            keep[i] = True
            h = np.fromiter(
                (int.from_bytes(
                    md5(" ".join(t[j:j + k]).encode()).digest()[:4], "big")
                 for j in range(n)),
                dtype=np.int64, count=n)
            if n >= w:
                wins = sliding_window_view(h, w)
                ridx = (w - 1) - np.argmin(wins[:, ::-1], axis=1)
            else:  # the whole (short) gram list forms one window
                ridx = np.array([(n - 1) - int(np.argmin(h[::-1]))])
            sel = np.unique(np.arange(len(ridx)) + ridx)
            v = h[sel]
            out[i] = (n, len(sel), int(v.sum()), int(v.min()), int(v.max()))
        yield pa.RecordBatch.from_arrays(
            [pa.array(ids[keep], pa.int64())]
            + [pa.array(out[keep, j], pa.int64()) for j in range(5)],
            ["doc_id", "n_grams", "n_fp", "fp_sum", "fp_min", "fp_max"],
        )


@register("winnowing_fingerprints", oracle=_WINNOW_ORACLE)
def winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust winnowing (Schleimer-Wilkerson-Aiken 2003, the MOSS
    algorithm): per document, hash every {K}-token k-gram, slide a
    window of {W} consecutive hashes, and select the RIGHTMOST MINIMAL
    hash of each window — the guaranteed-coverage fingerprint set
    (every duplicated span of >= W+K-1 tokens shares at least one
    selected fingerprint between its copies, with expected density
    2/(W+1)).  The positional selection is what separates this from
    MinHash: fingerprints localize WHERE the shared span sits, the
    property plagiarism/overlap detectors need.

    Spark-first shape: still a pure map pass — the JVM side only
    tokenizes (codegen'd split/trim, the cheap stage), and gram
    construction + md5 + the sliding-window argmin run as ONE
    Arrow-vectorized kernel (_winnow_batches; the kernel docstring
    carries the measured stage profile that justifies leaving the
    expression route — interpreted HOF shingle construction was 88 of
    the 114 s at 250k docs).  Zero shuffles beyond the final orderBy;
    at 100 TB the kernel is embarrassingly parallel and the selected
    fingerprints are what a cross-doc overlap join would consume (the
    substring_dedup_windows collision-join shape, at ~2/(W+1) the
    rows).  The all-Catalyst twin below must produce identical
    integers (tests/test_extensions.py), and the DuckDB oracle checks
    the same through the exploded window/argmin formulation.

    Short documents: with fewer than W k-gram hashes the whole gram
    list forms ONE window (the standard boundary convention); under K
    tokens there are no grams and the doc is excluded (matching the
    oracle's grams-derived counts CTE).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select("doc_id",
                    TX.ws_tokens(F.lower(F.col("text"))).alias("__t"))
    )
    return toks.mapInArrow(_winnow_batches, schema=_WINNOW_SCHEMA) \
               .orderBy("doc_id")


def winnowing_fingerprints_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The all-Catalyst formulation (nested higher-order folds) kept as
    the kernel's differential twin: each window's argmin is a bounded
    W-element fold with `<=` so later equal hashes win (rightmost
    minimal), then the distinct selection reduces to the same integer
    aggregates.  Correct but interpreted per element — see the
    registered query's docstring for the measured gap.
    """
    docs = load_table(spark, sf_dir, "documents")
    grams = TX.shingles(F.col("text"), n=WINNOW_K)
    hs = F.transform(grams, TX.hash32)
    n = F.size(hs)
    m = F.greatest(n - F.lit(WINNOW_W) + 1, F.lit(1))
    first = lambda j: F.struct(F.element_at(hs, j).alias("h"), j.alias("p"))  # noqa: E731
    sel = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), m),
            # offsets 1..min(W-1, n-j): fold right neighbours onto the
            # window's first element (rightmost-minimal wins).  A
            # single-gram doc has NO right neighbours and must skip the
            # fold entirely — sequence(1, 0) is DESCENDING [1, 0] and
            # its o=1 step would index past the array (ANSI element_at
            # throws; the edge-docs test pins this).
            lambda j: F.when(n - j < 1, first(j)).otherwise(
                F.aggregate(
                    F.sequence(F.lit(1), F.least(F.lit(WINNOW_W - 1), n - j)),
                    first(j),
                    lambda acc, o: F.when(
                        F.element_at(hs, j + o) <= acc["h"],
                        F.struct(F.element_at(hs, j + o).alias("h"),
                                 (j + o).alias("p")),
                    ).otherwise(acc),
                )
            ),
        )
    )
    sel_h = F.transform(sel, lambda s: s["h"])
    return (
        docs.select("doc_id", n.alias("__n"), sel.alias("__sel"),
                    sel_h.alias("__h"))
        .filter(F.col("__n") >= 1)
        .select(
            "doc_id",
            F.col("__n").cast("bigint").alias("n_grams"),
            F.size("__sel").cast("bigint").alias("n_fp"),
            F.aggregate(F.col("__h"), F.lit(0).cast("bigint"),
                        lambda a, x: a + x).alias("fp_sum"),
            F.array_min("__h").cast("bigint").alias("fp_min"),
            F.array_max("__h").cast("bigint").alias("fp_max"),
        )
        .orderBy("doc_id")
    )
