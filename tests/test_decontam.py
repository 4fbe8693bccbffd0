"""Eval-set decontamination (round 8): contamination_hits / decontaminate
vs an exact python mirror of the same normalization + n-gram set semantics.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from tiledspark.textops import contamination_hits, decontaminate


def _norm(t: str) -> str:
    return re.sub(r"[^a-z0-9]+", " ", t.lower()).strip()


def _grams(t: str, n: int) -> set[str]:
    toks = _norm(t).split(" ")
    if toks == [""] or len(toks) < n:
        return set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _mirror(docs: dict[int, str], evals: dict[int, str], n: int) -> dict:
    out = {}
    eg = {e: _grams(t, n) for e, t in evals.items()}
    for d, t in docs.items():
        dg = _grams(t, n)
        for e, g in eg.items():
            inter = len(dg & g)
            if inter:
                out[(d, e)] = inter
    return out


def _frames(spark, docs, evals):
    ddf = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})
    )
    edf = spark.createDataFrame(
        pd.DataFrame({"eval_id": list(evals), "text": list(evals.values())})
    )
    return ddf, edf


def test_contamination_hits_matches_python_mirror(spark):
    rng = np.random.default_rng(8)
    vocab = [f"w{i}" for i in range(150)]
    docs = {i: " ".join(rng.choice(vocab, 40)) for i in range(30)}
    evals = {100: " ".join(rng.choice(vocab, 25)), 101: " ".join(rng.choice(vocab, 25))}
    # plant: doc 0 embeds 12 consecutive eval-100 tokens (>= one 8-gram,
    # several overlapping ones); doc 1 embeds the same span but with CASE
    # and PUNCTUATION noise (must still match through normalization);
    # doc 2 embeds only 7 consecutive tokens (one short of n=8 — no hit)
    span = evals[100].split()[3:15]
    docs[0] = "prefix words here " + " ".join(span) + " suffix tail"
    noisy = " ".join(w.upper() + "," for w in span)
    docs[1] = "other lead-in " + noisy + " trailing bits"
    docs[2] = "pad pad pad " + " ".join(span[:7]) + " unrelated rest"
    ddf, edf = _frames(spark, docs, evals)

    got = {
        (int(r["doc_id"]), int(r["eval_id"])): int(r["n_hits"])
        for r in contamination_hits(ddf, edf, n=8).collect()
    }
    want = _mirror(docs, evals, 8)
    assert got == want, f"mismatch: got {got}, want {want}"
    assert (0, 100) in got and got[(0, 100)] >= 5  # 12-token span -> 5 8-grams
    assert (1, 100) in got and got[(1, 100)] == got[(0, 100)]  # normalization
    assert (2, 100) not in got  # 7 tokens < n: not a match


def test_decontaminate_drops_flagged_keeps_rest(spark):
    docs = {
        0: "the quick brown fox jumps over the lazy dog tonight again",
        1: "completely unrelated text about spark partitions and shuffles here",
        2: "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG tonight!!",
    }
    evals = {7: "the quick brown fox jumps over the lazy dog tonight"}
    ddf, edf = _frames(spark, docs, evals)
    clean, report = decontaminate(ddf, edf, n=8, min_hits=1)
    kept = sorted(r["doc_id"] for r in clean.collect())
    assert kept == [1], f"kept {kept}"
    rep = {(int(r["doc_id"]), int(r["eval_id"])) for r in report.collect()}
    assert rep == {(0, 7), (2, 7)}
    # clean frame keeps the input schema untouched
    assert clean.columns == ddf.columns


def test_decontaminate_min_hits_threshold(spark):
    # doc 0 shares exactly ONE 8-gram (an 8-token span), doc 1 shares many
    ev = "a b c d e f g h i j k l m n o p q r s t"
    docs = {
        0: "x y z " + " ".join(ev.split()[0:8]) + " zz yy xx ww vv",
        1: ev,
        2: "nothing shared at all in this one really truly",
    }
    ddf, edf = _frames(spark, docs, {5: ev})
    clean1, _ = decontaminate(ddf, edf, n=8, min_hits=1)
    assert sorted(r["doc_id"] for r in clean1.collect()) == [2]
    clean2, rep2 = decontaminate(ddf, edf, n=8, min_hits=2)
    assert sorted(r["doc_id"] for r in clean2.collect()) == [0, 2]
    assert {int(r["doc_id"]) for r in rep2.collect()} == {1}


def test_contamination_null_and_short_texts(spark):
    ddf = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1, 2], "text": [None, "", "one two three"]}).astype(
            {"text": "object"}
        )
    )
    edf = spark.createDataFrame(
        pd.DataFrame({"eval_id": [9], "text": ["one two three four five six seven eight"]})
    )
    assert contamination_hits(ddf, edf, n=8).count() == 0
    clean, _ = decontaminate(ddf, edf, n=8)
    assert clean.count() == 3
