"""Tests for the seed-set quality classifier + Pareto keep rule (op 96)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tiledspark.quality import (
    MAX_SEED_ROWS,
    pareto_keep_expr,
    score_quality,
    train_quality_classifier,
)
from tiledspark.textops import hashed_tf_embedding


def _corpus(spark, vocab_prefix, n, id0=0, seed=0):
    """Docs drawn from a domain vocabulary plus shared common words."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        words = ["the", "and", "of"] + [
            f"{vocab_prefix}{rng.integers(0, 50)}" for _ in range(25)
        ]
        rng.shuffle(words)
        rows.append((id0 + i, " ".join(words)))
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def model_and_data(spark):
    pos = _corpus(spark, "alpha", 120, id0=0, seed=1)
    neg = _corpus(spark, "beta", 120, id0=1000, seed=2)
    model = train_quality_classifier(pos, neg, dim=256, iters=200)
    return model, pos, neg


def test_classifier_separates_seed_domains(spark, model_and_data):
    model, pos, neg = model_and_data
    assert model["train_acc"] > 0.95
    # holdout from the same distributions
    pos_h = _corpus(spark, "alpha", 40, id0=5000, seed=3)
    neg_h = _corpus(spark, "beta", 40, id0=6000, seed=4)
    sp = score_quality(pos_h, model)
    sn = score_quality(neg_h, model)
    mp = sp.agg(F.avg("quality_score")).first()[0]
    mn = sn.agg(F.avg("quality_score")).first()[0]
    assert mp > 0.8 and mn < 0.2


def test_score_matches_numpy_mirror(spark, model_and_data):
    model, pos, _ = model_and_data
    emb = hashed_tf_embedding(pos, dim=256).collect()
    w = np.array(model["weights"])
    mirror = {
        r["doc_id"]: 1.0 / (1.0 + np.exp(-(np.dot(r["embedding"], w) + model["bias"])))
        for r in emb
    }
    got = {r["doc_id"]: r["quality_score"] for r in score_quality(pos, model).collect()}
    assert set(got) == set(mirror)
    for k in got:
        assert got[k] == pytest.approx(mirror[k], abs=1e-9)


def test_training_is_deterministic(spark, model_and_data):
    model, pos, neg = model_and_data
    again = train_quality_classifier(pos, neg, dim=256, iters=200)
    assert again["weights"] == model["weights"]
    assert again["bias"] == model["bias"]


def test_seed_row_guard(spark, model_and_data):
    _, pos, neg = model_and_data
    import tiledspark.quality as q

    old = q.MAX_SEED_ROWS
    try:
        q.MAX_SEED_ROWS = 10
        with pytest.raises(ValueError, match="seed set"):
            train_quality_classifier(pos, neg, dim=32)
    finally:
        q.MAX_SEED_ROWS = old
    assert MAX_SEED_ROWS == old


def test_pareto_keep_rates(spark):
    n = 4000
    df = spark.range(0, n).withColumnRenamed("id", "doc_id")
    def rate(score):
        kept = df.where(
            pareto_keep_expr(F.lit(float(score)), F.col("doc_id"), alpha=9.0, seed=5)
        ).count()
        return kept / n

    assert rate(1.0) == 1.0                    # perfect score always kept
    assert rate(0.0) < 0.01                    # ~2^-9 trickle
    assert abs(rate(0.5) - 1.5 ** -9.0) < 0.01  # P(X > 0.5) = (1.5)^-alpha
    # deterministic
    k1 = {r.doc_id for r in df.where(pareto_keep_expr(F.lit(0.5), F.col("doc_id"), seed=5)).collect()}
    k2 = {r.doc_id for r in df.where(pareto_keep_expr(F.lit(0.5), F.col("doc_id"), seed=5)).collect()}
    assert k1 == k2
