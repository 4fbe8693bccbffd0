"""Tests for trained BPE (op 97): hand-checked merge learning, encode
properties, capped distributed word counts, corpus-wide UDF encoding."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tiledspark.bpe import (
    END,
    bpe_encode_udf,
    encode_word,
    learn_bpe,
    train_bpe,
    word_counts,
)


def test_learn_bpe_hand_example():
    # the Sennrich '16 running example: {'low':5,'lower':2,'newest':6,'widest':3}
    counts = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = learn_bpe(counts, n_merges=4)
    # pair counts round 1: ('e','s') 9, ('s','t') 9, ('t',END) 9, ('l','o') 7,
    # ('o','w') 7 ... tie on 9 -> lexicographic: ('e','s') first
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", END)
    assert merges[3] == ("l", "o")


def test_learn_bpe_deterministic():
    counts = [("banana", 3), ("bandana", 2), ("cabana", 5)]
    assert learn_bpe(counts, 10) == learn_bpe(counts, 10)


def test_encode_word_properties():
    counts = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = learn_bpe(counts, n_merges=10)
    ranks = {m: i for i, m in enumerate(merges)}
    for w in ("low", "lower", "newest", "widest", "lowest", "unseen"):
        toks = encode_word(w, ranks)
        # concatenation property: tokens reassemble the word + end marker
        assert "".join(toks) == w + END
    # a fully-merged training word encodes to few tokens
    assert len(encode_word("newest", ranks)) <= 3


def test_more_merges_never_lengthen():
    counts = [("banana", 5), ("bandana", 3), ("cabana", 4), ("anagram", 2)]
    m_small = {m: i for i, m in enumerate(learn_bpe(counts, 3))}
    m_big = {m: i for i, m in enumerate(learn_bpe(counts, 30))}
    for w, _ in counts:
        assert len(encode_word(w, m_big)) <= len(encode_word(w, m_small))


def test_word_counts_cap_and_report(spark):
    df = spark.createDataFrame(
        [(0, "aa aa aa bb bb cc"), (1, "aa bb dd")], "doc_id long, text string"
    )
    kept, report = word_counts(df, max_word_types=2)
    assert kept == [("aa", 4), ("bb", 3)]  # count desc, deterministic
    assert report["n_word_types"] == 4
    assert report["kept_types"] == 2
    assert report["count_mass_kept"] == pytest.approx(7 / 9)


def test_train_and_encode_corpus(spark):
    rows = [(i, "the lowest slowest newest tower " * 3) for i in range(20)]
    rows += [(100 + i, "wide widest widening slower low " * 3) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    model = train_bpe(df, n_merges=40)
    assert model["report"]["count_mass_kept"] == 1.0
    out = df.withColumn("n_bpe", bpe_encode_udf(model, count_only=True)(F.col("text")))
    out = out.withColumn("toks", bpe_encode_udf(model)(F.col("text")))
    rows = out.collect()
    # python mirror: encode each doc's words and compare counts + tokens
    ranks = {tuple(m): i for i, m in enumerate(model["merges"])}
    for r in rows:
        mirror = []
        for w in r.text.lower().split():
            mirror.extend(encode_word(w, ranks))
        assert r.toks == mirror
        assert r.n_bpe == len(mirror)
    # trained merges compress: fewer BPE tokens than characters, more than words
    sample = rows[0]
    n_words = len(sample.text.split())
    assert n_words <= sample.n_bpe < len(sample.text.replace(" ", "")) + n_words


def test_encode_null_text(spark):
    df = spark.createDataFrame([(0, None), (1, "ab ab")], "doc_id long, text string")
    model = train_bpe(df.where("text is not null"), n_merges=5)
    got = {
        r.doc_id: r.n
        for r in df.withColumn(
            "n", bpe_encode_udf(model, count_only=True)(F.col("text"))
        ).collect()
    }
    assert got[0] == 0 and got[1] > 0
