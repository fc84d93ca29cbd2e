"""Text-analysis operator tests (SURVEY.md §2.13 X4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from core_telecoms_etl_spark.operators import text as tx


def _one(spark, text: str):
    return spark.createDataFrame([(text,)], "text string")


def test_tokens_robust_to_whitespace(spark):
    df = _one(spark, "  a  b c  ")
    toks = df.select(tx.tokens("text").alias("t")).collect()[0].t
    assert toks == ["a", "b", "c"]


def test_token_counts(spark):
    df = _one(spark, "a b b c")
    row = df.select(
        tx.token_count("text").alias("n"),
        tx.distinct_token_count("text").alias("d"),
    ).collect()[0]
    assert (row.n, row.d) == (4, 3)


def test_bpe_ish_token_count(spark):
    df = _one(spark, "hello, world42!")
    n = df.select(tx.bpe_ish_token_count("text").alias("n")).collect()[0].n
    assert n == 5  # [hello][,][world][42][!]


def test_word_shingles(spark):
    df = _one(spark, "a b c d")
    sh = df.select(tx.word_shingles("text", 3).alias("s")).collect()[0].s
    assert sorted(sh) == ["a b c", "b c d"]


def test_predicted_lang_markers(spark):
    df = spark.createDataFrame(
        [("the cat and the dog",), ("el gato y la casa de los perros",)],
        "text string",
    )
    out = [r.p for r in df.select(tx.predicted_lang("text").alias("p")).collect()]
    assert out == ["en", "es"]


def test_predicted_lang_cjk(spark):
    out = (
        _one(spark, "这 是 中文 文本 没有 英文 标记")
        .select(tx.predicted_lang("text").alias("p"))
        .collect()[0]
        .p
    )
    assert out == "zh"


def test_quality_score_bounds(spark, sf_dir):
    from core_telecoms_etl_spark.sources.readers import load_table

    d = load_table(spark, sf_dir, "documents")
    stats = d.select(tx.quality_score("text").alias("q")).agg(
        F.min("q").alias("lo"), F.max("q").alias("hi")
    ).collect()[0]
    assert 0.0 <= stats.lo and stats.hi <= 1.0


def test_fingerprints(spark):
    df = spark.createDataFrame(
        [("Hello  World",), ("hello world",)], "text string"
    )
    rows = df.select(
        tx.content_sha256("text").alias("raw"),
        tx.normalized_sha256("text").alias("norm"),
    ).collect()
    assert rows[0].raw != rows[1].raw  # exact digests differ
    assert rows[0].norm == rows[1].norm  # normalized digests collide
    assert len(rows[0].raw) == 64


def test_simhash_similar_texts_close(spark):
    df = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "the quick brown fox jumps over the lazy cat"),
            (2, "completely unrelated text about database engines"),
        ],
        "doc_id long, text string",
    )
    from core_telecoms_etl_spark.operators.dedup import simhash_signatures

    sigs = {
        r.doc_id: r.simhash
        for r in simhash_signatures(df, "doc_id", "text").collect()
    }
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    assert ham(sigs[0], sigs[1]) < ham(sigs[0], sigs[2])
    assert sigs[0] >= 0  # bit 63 dropped → stays in positive long range


@pytest.mark.parametrize(
    "text,expected",
    [("", 0), ("   ", 0), ("one", 1)],
)
def test_token_count_edge_cases(spark, text, expected):
    n = _one(spark, text).select(tx.token_count("text").alias("n")).collect()[0].n
    assert n == expected
