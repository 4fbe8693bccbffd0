"""Seed-set quality classifier + Pareto-threshold filtering (SURVEY §2 op 96).

The GPT-3 / CCNet / PaLM corpus step the §2E surface was still missing: train
a linear quality classifier on a SMALL curated seed set (positive = "looks
like the reference corpus", negative = random crawl) and score the WHOLE
corpus with it, then keep documents by the published Pareto-thresholding rule
(Brown et al. '20 appendix A: keep iff score > 1 - X, X ~ Pareto(alpha=9) —
a soft threshold that lets a trickle of low-scoring docs through so the kept
corpus is not a hard decision boundary).

The asymmetry IS the scale design (same shape as op 92's decontamination):

* TRAINING data is seed-set-sized by construction — thousands to tens of
  thousands of labeled docs, not the corpus. Features come from the
  distributed ``hashed_tf_embedding`` path (JVM-native), then the dense
  matrix (seed_rows × dim — megabytes) collects to the driver where plain
  deterministic numpy gradient descent fits the weights. Collecting the
  CORPUS would be wrong at any scale; collecting the seed set is the same
  O(benchmark) driver traffic every published pipeline accepts.
* SCORING is a pure per-row projection: broadcast the dim-sized weight
  vector as a literal array, dot it with the document's hashed-TF embedding
  via zip_with + aggregate (native HOFs, whole-stage codegen, no Python in
  the corpus path), sigmoid in Column arithmetic. One corpus scan.
* The Pareto keep rule is a deterministic hash draw (xxhash64(id, seed) →
  uniform → inverse-CDF Pareto), like every sampler in assemble.py: no RNG
  state, stable under retries, reproducible from the seed.

No reference implementation exists (empty /root/reference checkout —
SURVEY.md §0); shapes re-derived from the published descriptions.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F

from tiledspark.textops import hashed_tf_embedding

# Refuse to collect more than this many seed rows: the classifier's contract
# is seed-set-sized training data. Corpus-scale labels belong in a different
# operator (and pipeline).
MAX_SEED_ROWS = 500_000


def _collect_features(df: DataFrame, dim: int, text_col: str, id_col: str) -> np.ndarray:
    emb = hashed_tf_embedding(
        df, id_col=id_col, text_col=text_col, dim=dim, l2_normalize=True
    )
    rows = emb.select("embedding").collect()
    return np.array([r["embedding"] for r in rows], dtype=np.float64)


def train_quality_classifier(
    pos: DataFrame,
    neg: DataFrame,
    dim: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
    l2: float = 1e-3,
    iters: int = 300,
    lr: float = 2.0,
) -> dict:
    """Fit logistic regression on hashed-TF features of two seed frames.

    Featurization is the distributed op-81 path; the fit itself is
    deterministic full-batch gradient descent on the COLLECTED seed matrix
    (guarded by MAX_SEED_ROWS — training data is benchmark-sized by
    construction, see module docstring). Returns a plain-dict model
    {weights, bias, dim, train_acc} — broadcastable, JSON-serializable,
    engine-independent.
    """
    n_pos = pos.count()
    n_neg = neg.count()
    if n_pos + n_neg > MAX_SEED_ROWS:
        raise ValueError(
            f"seed set {n_pos + n_neg} rows > MAX_SEED_ROWS={MAX_SEED_ROWS}; "
            "the quality classifier trains on curated seed sets, not corpora"
        )
    xp = _collect_features(pos, dim, text_col, id_col)
    xn = _collect_features(neg, dim, text_col, id_col)
    x = np.vstack([xp, xn])
    y = np.concatenate([np.ones(len(xp)), np.zeros(len(xn))])
    w = np.zeros(dim)
    b = 0.0
    n = len(y)
    for _ in range(iters):
        z = x @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        gw = x.T @ g / n + l2 * w
        gb = float(g.mean())
        w -= lr * gw
        b -= lr * gb
    pred = (x @ w + b) > 0
    return {
        "weights": w.tolist(),
        "bias": b,
        "dim": dim,
        "train_acc": float((pred == (y > 0.5)).mean()),
    }


def score_quality(
    df: DataFrame,
    model: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "quality_score",
) -> DataFrame:
    """Score every document: sigmoid(w · hashed_tf(text) + b), all JVM-native
    (the weight vector is a broadcast literal array; the dot product is
    zip_with + aggregate over the op-81 embedding). Returns the THIN frame
    (id_col, out_col in [0, 1]) — the house convention for corpus-scale
    filters (like the dedup keeper frames): filter it (e.g. with
    ``pareto_keep_expr``) and semi-join the surviving ids back, rather than
    shuffling the full corpus through a wide join."""
    emb = hashed_tf_embedding(
        df, id_col=id_col, text_col=text_col, dim=int(model["dim"]), l2_normalize=True
    )
    wlit = F.array(*[F.lit(float(v)) for v in model["weights"]])
    dot = F.aggregate(
        F.zip_with(F.col("embedding"), wlit, lambda a, c: a * c),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    z = dot + F.lit(float(model["bias"]))
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return emb.select(id_col, score.alias(out_col))


def pareto_keep_expr(
    score: Column, id_col: Column, alpha: float = 9.0, seed: int = 0
) -> Column:
    """The GPT-3 appendix-A keep rule as a deterministic Column predicate:
    keep iff score > 1 - X with X ~ Pareto(alpha) (numpy's Lomax
    convention: X = (1-u)^(-1/alpha) - 1). u comes from xxhash64(id, seed)
    so the draw is reproducible and retry-stable. score=1 always keeps;
    score=0 keeps with probability 2^-alpha — the published soft threshold
    that admits a calibrated trickle of low-scoring docs.

    The hash is domain-separated with a "pareto" salt (round 9, ADVICE r8):
    without it the draw is the identical expression assemble._uniform01
    uses for deterministic_sample/mix_corpora, so at equal (default) seeds
    every doc got the same u in the quality filter and the mixture sampler —
    Pareto-trickle survivors (kept only because u was near 1) were then
    almost never kept by any downsample with a smaller fraction, silently
    eliminating the low-score trickle the rule is designed to admit."""
    buckets = 2**32
    u = F.pmod(
        F.xxhash64(F.lit("pareto"), id_col, F.lit(int(seed))), F.lit(buckets)
    ).cast("double") / F.lit(float(buckets))
    x = F.pow(F.lit(1.0) - u, F.lit(-1.0 / float(alpha))) - F.lit(1.0)
    return score > (F.lit(1.0) - x)
