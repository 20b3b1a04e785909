"""Behavioral tests for corpus_plans3: the iterative BPE trainer and
exact global quantiles (oracle parity is covered for every registered
query by test_oracle_parity; these pin the algorithmic invariants)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pipe_spark.plans.corpus_plans3 import (
    _QUANT_PS,
    _SEP,
    BPE_MERGES,
    bpe_train_merges,
    exact_global_quantiles,
)


def _wrap(spark, word: str):
    return spark.createDataFrame([(word,)], "word string").select(
        F.regexp_replace("word", "(.)", _SEP + "$1" + _SEP).alias("w")
    )


def _apply_merge(df, l: str, r: str):
    return df.withColumn(
        "w",
        F.replace(
            F.col("w"),
            F.lit(_SEP + l + _SEP + _SEP + r + _SEP),
            F.lit(_SEP + l + r + _SEP),
        ),
    )


def _syms(df) -> list[str]:
    row = df.select(
        F.split(F.expr("btrim(w, char(1))"), r"\x01\x01").alias("s")
    ).head()
    return list(row["s"])


def test_bpe_greedy_pairing_semantics(spark):
    # The load-bearing claim: separator-anchored plain replace IS
    # greedy left-to-right BPE pairing.
    assert _syms(_apply_merge(_wrap(spark, "aaaa"), "a", "a")) == ["aa", "aa"]
    assert _syms(_apply_merge(_wrap(spark, "aaa"), "a", "a")) == ["aa", "a"]
    # Anchoring: merging (a, b) must not fire inside symbols that
    # merely END with a / START with b ("ba"+"ab" stays untouched).
    two = _apply_merge(
        _apply_merge(_wrap(spark, "baab"), "b", "a"), "a", "b"
    )
    assert _syms(two) == ["ba", "ab"]
    assert _syms(_apply_merge(two, "a", "b")) == ["ba", "ab"]


def test_bpe_merge_counts_nonincreasing(spark, sf_dir):
    rows = bpe_train_merges(spark, sf_dir).orderBy("rnk").collect()
    assert len(rows) == BPE_MERGES
    cnts = [r["cnt"] for r in rows]
    # A merged pair's occurrences can only come from occurrences of
    # round i's argmax-or-lower pairs, so the max count never rises.
    assert cnts == sorted(cnts, reverse=True)
    assert all(r["merged"] == r["left_sym"] + r["right_sym"] for r in rows)
    # Deterministic across runs (driver loop + collect is still pure).
    again = [tuple(r) for r in bpe_train_merges(spark, sf_dir).collect()]
    assert again == [tuple(r) for r in rows]


def test_exact_quantiles_monotone_and_members(spark, sf_dir):
    rows = exact_global_quantiles(spark, sf_dir).orderBy("p").collect()
    assert [r["p"] for r in rows] == list(_QUANT_PS)
    vals = [r["value"] for r in rows]
    assert vals == sorted(vals)
    from etl_pipe_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        F.size(F.split("text", " ")).cast("bigint").alias("n")
    )
    n = docs.count()
    observed = {r["n"] for r in docs.distinct().collect()}
    for r in rows:
        assert 1 <= r["target_rnk"] <= n
        assert r["value"] in observed  # nearest-rank => a real member


def test_cooccurrence_pmi_shape_and_bounds(spark, sf_dir):
    from etl_pipe_spark.plans.corpus_plans3 import (
        COOC_TOP,
        cooccurrence_pmi,
    )

    rows = cooccurrence_pmi(spark, sf_dir).orderBy("rnk").collect()
    assert 0 < len(rows) <= COOC_TOP
    cnts = [r["pair_cnt"] for r in rows]
    assert cnts == sorted(cnts, reverse=True)
    for r in rows:
        assert r["tok_a"] <= r["tok_b"]  # canonical unordered pair
        assert r["pmi_r4"] is not None
    assert [r["rnk"] for r in rows] == list(range(1, len(rows) + 1))
