"""Dedup suite (MinHash-LSH, SimHash) + language-ID heuristic."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from tiledspark.textops import (
    lang_id_expr,
    lsh_candidate_pairs,
    shingles_expr,
    simhash_near_pairs,
    with_simhash,
)


def _corpus(spark):
    rng = np.random.default_rng(31)
    vocab = [f"w{i}" for i in range(200)]
    texts = [" ".join(rng.choice(vocab, 60)) for _ in range(40)]
    # plant near-dups: 40/41 share all but 2 words; 42 == 40 exactly
    base = texts[0].split()
    mut = list(base)
    mut[10], mut[30] = "zzz", "qqq"
    texts.append(" ".join(mut))  # id 40
    texts.append(texts[0])  # id 41 exact dup
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    )


def test_minhash_lsh_finds_planted_dups(spark):
    df = _corpus(spark)
    pairs = lsh_candidate_pairs(df, "doc_id", est_threshold=0.4).toPandas()
    found = {(int(a), int(b)) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    assert (0, 41) in found, f"exact dup missed: {found}"
    assert (0, 40) in found or (40, 41) in found, f"near dup missed: {found}"
    exact = pairs.set_index(["id_a", "id_b"])["exact_jaccard"]
    assert exact.loc[(0, 41)] == 1.0
    # no wildly-false positives: every surfaced pair has real overlap
    assert (pairs["exact_jaccard"] > 0.2).all()


def test_minhash_estimate_tracks_exact(spark):
    df = _corpus(spark)
    pairs = lsh_candidate_pairs(df, "doc_id", est_threshold=0.3).toPandas()
    assert len(pairs) > 0
    err = (pairs["est_jaccard"] - pairs["exact_jaccard"]).abs()
    assert err.max() <= 0.5  # 16 perms → coarse but sane


def test_shingles_expr(spark):
    df = spark.createDataFrame(pd.DataFrame({"text": ["a b c d e"]}))
    out = df.select(shingles_expr(F.col("text"), 3).alias("s")).collect()[0]["s"]
    assert sorted(out) == ["a b c", "b c d", "c d e"]


def test_simhash_near_pairs(spark):
    df = _corpus(spark)
    pairs = simhash_near_pairs(df, "doc_id", max_hamming=10).toPandas()
    found = {(int(a), int(b)) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    assert (0, 41) in found
    h = pairs.set_index(["id_a", "id_b"])["hamming"]
    assert h.loc[(0, 41)] == 0  # identical text → identical simhash
    # simhash of identical docs equal, random docs far apart
    sh = with_simhash(df).select("doc_id", "simhash").toPandas().set_index("doc_id")
    assert sh.loc[0, "simhash"] == sh.loc[41, "simhash"]


def test_lang_id_heuristic(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "text": [
                    "the cat and the dog sat in the garden of the house",
                    "der hund und die katze ist nicht in das haus",
                    "le chat et la maison est un des plus grands",
                    "el perro y el gato es que en la casa",
                ],
                "expected": ["en", "de", "fr", "es"],
            }
        )
    )
    out = df.withColumn("pred", lang_id_expr(F.col("text"))).collect()
    for r in out:
        assert r["pred"] == r["expected"], (r["text"], r["pred"])
