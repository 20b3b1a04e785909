"""Round-6 corpus ops: ExactSubstr rolling-window dedup, per-domain
cap sampling, BPE pair statistics, and int8 scalar quantization.

DuckDB hash parity for all four is covered by
tests/test_oracle_parity.py (registered queries); these tests pin the
properties the oracle can't see — exactness vs sequential Python/numpy
references, first-occurrence-wins semantics on a crafted corpus, and
partition-count independence.
"""

from __future__ import annotations

import collections
import os

import numpy as np
from pyspark.sql import functions as F

from etl_pipe_spark.plans.corpus_plans2 import (
    DOMAIN_CAP,
    Q_LEVELS,
    WIN_WORDS,
    _CAP_MOD,
    _CAP_MULT,
    bpe_pair_stats,
    domain_cap_sampling,
    sq8_embedding_quantization,
    substring_dedup_windows,
)
from etl_pipe_spark.sources.catalog import load_table


# ---------------------------------------------------------------------------
# substring_dedup_windows
# ---------------------------------------------------------------------------

def _seq_substring_reference(rows):
    """Sequential ExactSubstr reference: (doc_id, text) -> per-doc
    (n_windows, dup_windows, removed_windows)."""
    occurrences = collections.defaultdict(list)
    per_doc = {}
    for doc_id, text in rows:
        words = text.split(" ")
        if len(words) < WIN_WORDS:
            continue
        n = len(words) - WIN_WORDS + 1
        per_doc[doc_id] = [n, 0, 0]
        for sid in range(n):
            win = " ".join(words[sid:sid + WIN_WORDS])
            occurrences[win].append((doc_id, sid))
    for win, occ in occurrences.items():
        if len(occ) < 2:
            continue
        keeper = min(occ)
        for pos in occ:
            doc = per_doc[pos[0]]
            doc[1] += 1
            if pos != keeper:
                doc[2] += 1
    return per_doc


def test_substring_dedup_matches_sequential_reference(spark, sf_dir):
    rows = [
        (r["doc_id"], r["text"])
        for r in load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    ]
    expected = _seq_substring_reference(rows)
    got = {
        r["doc_id"]: [r["n_windows"], r["dup_windows"], r["removed_windows"]]
        for r in substring_dedup_windows(spark, sf_dir).collect()
    }
    assert got == expected


def test_substring_dedup_first_occurrence_wins(spark, tmp_path):
    """Crafted corpus: doc 2 repeats doc 1's window verbatim, doc 3
    self-repeats a window; the earliest (doc_id, sid) keeps."""
    base = " ".join(f"w{i}" for i in range(WIN_WORDS))          # 8 unique words
    uniq2 = " ".join(f"x{i}" for i in range(WIN_WORDS))
    docs = [
        (1, base + " tail1 tail2 tail3"),                        # windows incl. base
        (2, base),                                               # exactly the dup window
        (3, uniq2 + " " + uniq2),                                # self-repeat
        (4, "short words only"),                                 # < WIN_WORDS: dropped
    ]
    d = str(tmp_path / "crafted")
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(docs, "doc_id long, text string").coalesce(1) \
        .write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = {r["doc_id"]: r.asDict() for r in substring_dedup_windows(spark, d).collect()}
    assert 4 not in out                          # too short to window
    # doc1's window at sid=0 is the keeper; doc2's single window is removed.
    assert out[2]["dup_windows"] == 1 and out[2]["removed_windows"] == 1
    assert out[1]["dup_windows"] == 1 and out[1]["removed_windows"] == 0
    # doc3: uniq2 appears at sid=0 and sid=WIN_WORDS+? — the repeated
    # window (x0..x7) occurs at sid 0 and sid WIN_WORDS+1-? exactly twice;
    # earliest sid keeps, later one removed.
    assert out[3]["dup_windows"] >= 2 and out[3]["removed_windows"] >= 1
    # Global invariant: every duplicate group loses all but one member.
    seq = _seq_substring_reference(docs[:3])
    assert {k: v for k, v in out.items()} == {k: dict(zip(
        ("doc_id", "n_windows", "dup_windows", "removed_windows"),
        (k, *v))) for k, v in seq.items()}


def test_substring_dedup_partition_count_independent(spark, sf_dir):
    a = substring_dedup_windows(spark, sf_dir).collect()
    # Same plan under a different shuffle-partition setting must agree.
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        b = substring_dedup_windows(spark, sf_dir).collect()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


# ---------------------------------------------------------------------------
# domain_cap_sampling
# ---------------------------------------------------------------------------

def test_domain_cap_respects_cap_and_hash_order(spark, sf_dir):
    out = domain_cap_sampling(spark, sf_dir).collect()
    per_src = collections.defaultdict(list)
    for r in out:
        per_src[r["source"]].append(r)
    docs = load_table(spark, sf_dir, "documents").select("source", "doc_id").collect()
    universe = collections.defaultdict(list)
    for r in docs:
        universe[r["source"]].append(r["doc_id"])
    for src, rows in per_src.items():
        assert len(rows) <= DOMAIN_CAP
        assert sorted(r["rnk"] for r in rows) == list(range(1, len(rows) + 1))
        # Selection = first CAP ids under the Knuth-hash total order.
        expect = sorted(
            universe[src], key=lambda i: ((i * _CAP_MULT) % _CAP_MOD, i)
        )[:DOMAIN_CAP]
        got = [r["doc_id"] for r in sorted(rows, key=lambda r: r["rnk"])]
        assert got == expect
    assert set(per_src) == set(universe)  # every domain contributes


# ---------------------------------------------------------------------------
# bpe_pair_stats
# ---------------------------------------------------------------------------

def test_bpe_pairs_match_sequential_counter(spark, sf_dir):
    texts = [r["text"] for r in load_table(spark, sf_dir, "documents").select("text").collect()]
    wc = collections.Counter(w for t in texts for w in t.split(" "))
    pc = collections.Counter()
    for w, c in wc.items():
        for i in range(len(w) - 1):
            pc[w[i:i + 2]] += c
    expect = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [(r["pair"], r["cnt"]) for r in bpe_pair_stats(spark, sf_dir).collect()]
    assert got == expect
    assert [r["rnk"] for r in bpe_pair_stats(spark, sf_dir).collect()] == list(
        range(1, len(got) + 1)
    )


# ---------------------------------------------------------------------------
# sq8_embedding_quantization
# ---------------------------------------------------------------------------

def test_sq8_codes_match_numpy_and_are_saturating(spark, sf_dir):
    rows = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    lo, hi = X.min(axis=0), X.max(axis=0)
    scale = (hi - lo) / Q_LEVELS
    with np.errstate(divide="ignore", invalid="ignore"):
        codes = np.floor((X - lo) / scale + 0.5)
    codes = np.where(hi == lo, 0.0, codes).astype(np.int64)
    assert codes.min() >= 0 and codes.max() <= Q_LEVELS
    expect = {
        int(i): (int(c.sum()), int((c == 0).sum()), int((c == Q_LEVELS).sum()))
        for i, c in zip(ids, codes)
    }
    got = {
        r["vec_id"]: (r["code_sum"], r["n_lo"], r["n_hi"])
        for r in sq8_embedding_quantization(spark, sf_dir).collect()
    }
    assert got == expect
    # Every dimension's min and max rows saturate somewhere in the corpus.
    assert sum(v[1] for v in got.values()) >= X.shape[1]
    assert sum(v[2] for v in got.values()) >= X.shape[1]


# ---------------------------------------------------------------------------
# sq8 search kernel (operators/sq8.py)
# ---------------------------------------------------------------------------

def test_sq8_codes_are_one_byte_per_dim_and_search_matches_numpy(spark, sf_dir):
    from etl_pipe_spark.functions import vectors as VX
    from etl_pipe_spark.operators import sq8 as SQ8
    from pyspark.sql import functions as FF

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", VX.as_double(FF.col("embedding")).alias("v"))
    lo, scale = SQ8.sq8_stats(emb)
    codes = SQ8.sq8_encode(emb, lo, scale)
    rows = codes.collect()
    dim = lo.shape[0]
    assert all(len(r["codes"]) == dim for r in rows)     # 1 byte/dim storage

    # Sequential reference: decode every code, cosine-score against the
    # sampled queries, take top-k (score desc, id asc), self excluded.
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    C = np.array([np.frombuffer(r["codes"], dtype=np.uint8) for r in rows],
                 dtype=np.float64)
    recon = lo + scale * C
    rn = np.linalg.norm(recon, axis=1)
    raw = {r["vec_id"]: np.array(r["v"], dtype=np.float64)
           for r in emb.collect()}
    k = 7
    expect = {}
    for qid in sorted(raw):
        if qid % 100 != 0:
            continue
        q = raw[qid]
        s = (recon @ q) / (np.linalg.norm(q) * rn)
        order = sorted(
            ((float(-s[i]), int(ids[i])) for i in range(len(ids))
             if ids[i] != qid))
        expect[qid] = [v for _, v in order[:k]]
    q_df = emb.filter(FF.col("vec_id") % 100 == 0).select(
        FF.col("vec_id").alias("query_id"), FF.col("v").alias("qv"))
    got = {}
    for r in SQ8.sq8_search_topk(codes, q_df, lo, scale, k=k).collect():
        got.setdefault(r["query_id"], {})[r["srnk"]] = r["neighbor_id"]
    got = {q: [d[i] for i in sorted(d)] for q, d in got.items()}
    assert got == expect


def test_sq8_search_chunking_is_result_invariant(spark, sf_dir):
    from etl_pipe_spark.functions import vectors as VX
    from etl_pipe_spark.operators import sq8 as SQ8
    from pyspark.sql import functions as FF

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", VX.as_double(FF.col("embedding")).alias("v"))
    lo, scale = SQ8.sq8_stats(emb)
    codes = SQ8.sq8_encode(emb, lo, scale).cache()
    q_df = emb.filter(FF.col("vec_id") % 100 == 0).select(
        FF.col("vec_id").alias("query_id"), FF.col("v").alias("qv"))
    one = sorted(map(tuple, SQ8.sq8_search_topk(
        codes, q_df, lo, scale, k=5).collect()))
    # Force multiple chunks: budget of one query's bytes per chunk.
    many = sorted(map(tuple, SQ8.sq8_search_topk(
        codes, q_df, lo, scale, k=5,
        max_query_bytes=lo.shape[0] * 8).collect()))
    codes.unpersist()
    assert one == many


# ---------------------------------------------------------------------------
# bigram_backoff_quality
# ---------------------------------------------------------------------------

def test_bigram_backoff_exercises_all_three_ladder_branches(spark, tmp_path):
    """Crafted corpus: the held-out doc (doc_id % 5 == 0) contains a
    seen bigram, an unseen bigram of seen tokens, and an OOV token —
    one bigram per ladder branch, with hand-computed probabilities."""
    import math
    from etl_pipe_spark.plans.corpus_plans2 import (
        BACKOFF_ALPHA, bigram_backoff_quality)

    docs = [
        (1, "a b a b c"),      # train: bigrams ab, ba, ab, bc
        (2, "c a"),            # train: bigram ca
        (5, "a b c a zzz"),    # held-out: ab(seen) bc(seen) ca(seen) a-zzz(OOV)
        (10, "b a c b"),       # held-out: ba(seen) ac(UNSEEN, both tokens seen) cb(unseen)
    ]
    d = str(tmp_path / "lm")
    os.makedirs(d, exist_ok=True)
    spark.createDataFrame(docs, "doc_id long, text string").coalesce(1) \
        .write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = {r["doc_id"]: r.asDict()
           for r in bigram_backoff_quality(spark, d).collect()}
    # train counts: tokens a:3 b:2 c:2 (N=7); bigrams ab:2 ba:1 bc:1 ca:1
    N = 7.0
    # doc 5: ab=2/3? no — S(cur|prev)=c2/c1(prev): ab=2/3, bc=1/2, ca=1/2,
    # a->zzz OOV floor = alpha/N
    p5 = [2 / 3, 1 / 2, 1 / 2, BACKOFF_ALPHA / N]
    assert out[5]["n_bigrams"] == 4 and out[5]["backoff_bigrams"] == 1
    assert out[5]["avg_nll"] == round(-sum(map(math.log, p5)) / 4, 4)
    # doc 10: ba=1/2, ac unseen -> alpha*c(c)/N = .4*2/7, cb unseen ->
    # alpha*c(b)/N = .4*2/7
    p10 = [1 / 2, BACKOFF_ALPHA * 2 / N, BACKOFF_ALPHA * 2 / N]
    assert out[10]["n_bigrams"] == 3 and out[10]["backoff_bigrams"] == 2
    assert out[10]["avg_nll"] == round(-sum(map(math.log, p10)) / 3, 4)
    assert set(out) == {5, 10}  # train docs are never scored


# ---------------------------------------------------------------------------
# logreg_quality_fit (operators/logreg.py)
# ---------------------------------------------------------------------------

def _logreg_features(spark, sf_dir):
    toks = F.split("text", " ")
    return load_table(spark, sf_dir, "documents").select(
        F.lit(1.0).alias("f_bias"),
        (F.size(toks) / 100.0).alias("f_ntok"),
        (F.size(F.array_distinct(toks)) / F.size(toks)).alias("f_ttr"),
        ((F.length("text") - F.size(toks) + 1) / F.size(toks) / 10.0)
        .alias("f_wlen"),
        (F.size(toks) >= 55).cast("int").alias("y"),
    )


def test_logreg_gd_matches_numpy_reference(spark, sf_dir):
    """Same fixed-point GD in numpy must reproduce the distributed fit
    exactly — weights, loss trace, and accuracy."""
    from etl_pipe_spark.operators.logreg import _Q, logreg_fit_gd

    feats = _logreg_features(spark, sf_dir).cache()
    fit = logreg_fit_gd(feats, ["f_bias", "f_ntok", "f_ttr", "f_wlen"], "y",
                        lr=1.0, n_iters=4)
    rows = feats.collect()
    feats.unpersist()
    X = np.array([[r["f_bias"], r["f_ntok"], r["f_ttr"], r["f_wlen"]]
                  for r in rows])
    y = np.array([r["y"] for r in rows], dtype=np.float64)
    n = len(y)
    w = np.zeros(4)
    losses = []
    for _ in range(4):
        z = X @ w
        p = 1.0 / (1.0 + np.exp(-z))
        softplus = np.where(z > 30.0, z, np.log1p(np.exp(np.minimum(z, 30.0))))
        losses.append(np.rint((softplus - y * z) * _Q).sum() / _Q / n)
        g = np.rint(((p - y)[:, None] * X) * _Q).sum(axis=0) / _Q
        w = w - 1.0 * g / n
    z = X @ w
    softplus = np.where(z > 30.0, z, np.log1p(np.exp(np.minimum(z, 30.0))))
    losses.append(np.rint((softplus - y * z) * _Q).sum() / _Q / n)
    acc = float(((z >= 0) == (y >= 0.5)).mean())
    assert fit.n_rows == n
    assert np.allclose(fit.weights, w, rtol=0, atol=1e-12)
    assert np.allclose(fit.losses, losses, rtol=0, atol=1e-12)
    assert abs(fit.accuracy - acc) < 1e-12


def test_logreg_fit_is_partition_independent(spark, sf_dir):
    """The fixed-point gradient trace makes the fit bit-deterministic
    under any partitioning (the kmeans_fit recipe)."""
    from etl_pipe_spark.operators.logreg import logreg_fit_gd

    cols = ["f_bias", "f_ntok", "f_ttr", "f_wlen"]
    a = logreg_fit_gd(_logreg_features(spark, sf_dir).repartition(1),
                      cols, "y", n_iters=3)
    b = logreg_fit_gd(_logreg_features(spark, sf_dir).repartition(13),
                      cols, "y", n_iters=3)
    assert a.weights == b.weights and a.losses == b.losses


def test_standardize_is_partition_independent_and_correct(spark, sf_dir):
    from etl_pipe_spark.operators.logreg import standardize

    cols = ["f_ntok", "f_ttr", "f_wlen"]
    a = standardize(_logreg_features(spark, sf_dir).repartition(1), cols)
    b = standardize(_logreg_features(spark, sf_dir).repartition(13), cols)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb                       # bit-identical under repartition
    arr = np.array([[r["f_ntok"], r["f_ttr"], r["f_wlen"]] for r in a.collect()])
    # z-scored up to the 2^-24 stats quantization
    assert np.all(np.abs(arr.mean(axis=0)) < 1e-5)
    assert np.all(np.abs(arr.std(axis=0) - 1.0) < 1e-5)
