"""Tests for training-set assembly ops 93-95 (tiledspark/assemble.py).

Verification strategy: exact python mirrors where the operator is
deterministic math (mixture fractions, FFD packing), statistical bounds
where it is a hash draw (sampling rates), and structural invariants that
must hold at ANY scale (coverage-exactly-once, capacity, offsets,
partition-order independence).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tiledspark.assemble import (
    chunk_parts,
    deterministic_sample,
    deterministic_shuffle,
    mix_corpora,
    mixture_fractions,
    pack_sequences,
    packing_report,
    with_global_position,
    with_shard,
)


def _ids_df(spark, n, partitions=4):
    return spark.range(0, n, 1, partitions).withColumnRenamed("id", "doc_id")


# --- op 93: deterministic sampling / mixing ---------------------------------


def test_sample_fraction_one_is_identity(spark):
    df = _ids_df(spark, 300)
    out = deterministic_sample(df, 1.0).collect()
    assert sorted(r.doc_id for r in out) == list(range(300))
    assert all(r.copy_idx == 0 for r in out)


def test_sample_epoch_upsampling(spark):
    df = _ids_df(spark, 2000)
    out = deterministic_sample(df, 2.5, seed=7)
    counts = out.groupBy("doc_id").count().collect()
    assert len(counts) == 2000  # floor(2.5) >= 2 copies: nobody dropped
    per = {r.doc_id: r["count"] for r in counts}
    assert set(per.values()) <= {2, 3}
    mean = sum(per.values()) / len(per)
    assert 2.4 < mean < 2.6
    # copy_idx is dense 0..n-1 per doc
    idx = out.groupBy("doc_id").agg(
        F.min("copy_idx").alias("lo"), F.max("copy_idx").alias("hi"), F.count("*").alias("n")
    )
    bad = idx.where((F.col("lo") != 0) | (F.col("hi") != F.col("n") - 1)).count()
    assert bad == 0


def test_sample_deterministic_and_layout_independent(spark):
    a = deterministic_sample(_ids_df(spark, 1500, partitions=2), 0.37, seed=3)
    b = deterministic_sample(_ids_df(spark, 1500, partitions=13), 0.37, seed=3)
    ka = sorted(r.doc_id for r in a.collect())
    kb = sorted(r.doc_id for r in b.collect())
    assert ka == kb
    rate = len(ka) / 1500
    assert abs(rate - 0.37) < 0.05


def test_sample_seeds_decorrelated(spark):
    df = _ids_df(spark, 4000)
    s1 = {r.doc_id for r in deterministic_sample(df, 0.3, seed=1).collect()}
    s2 = {r.doc_id for r in deterministic_sample(df, 0.3, seed=2).collect()}
    overlap = len(s1 & s2) / 4000
    # independent draws: E[overlap] = 0.09
    assert abs(overlap - 0.09) < 0.04


def test_mixture_fractions_math():
    shares = {"a": 800.0, "b": 200.0}
    fr = mixture_fractions(shares, targets={"a": 1, "b": 1}, scale=0.5)
    # expected: each domain ends at 250 weight (50/50 of a half-size corpus)
    assert fr["a"] == pytest.approx(250 / 800)
    assert fr["b"] == pytest.approx(250 / 200)
    # temperature 0 == uniform targets
    fr_t = mixture_fractions(shares, temperature=0.0, scale=0.5)
    assert fr_t == pytest.approx(fr)
    # temperature 1 == keep current proportions (fractions equal across domains)
    fr_1 = mixture_fractions(shares, temperature=1.0)
    assert fr_1["a"] == pytest.approx(fr_1["b"]) == pytest.approx(1.0)


def test_mix_corpora_balances_token_shares(spark):
    # domain A: 1600 docs x 100 tokens; domain B: 400 docs x 100 tokens
    df = (
        spark.range(0, 2000, 1, 4)
        .withColumnRenamed("id", "doc_id")
        .withColumn("source", F.when(F.col("doc_id") < 1600, "A").otherwise("B"))
        .withColumn("n_tokens", F.lit(100))
    )
    sampled, report = mix_corpora(
        df, targets={"A": 1, "B": 1}, scale=0.5, weight_col="n_tokens", seed=11
    )
    rep = {r.domain: r for r in report.collect()}
    assert rep["A"].share == pytest.approx(0.8)
    assert rep["A"].expected_share == pytest.approx(0.5)
    assert rep["B"].expected_share == pytest.approx(0.5)
    got = (
        sampled.groupBy("source").agg(F.sum("n_tokens").alias("w")).collect()
    )
    w = {r.source: r.w for r in got}
    share_a = w["A"] / (w["A"] + w["B"])
    assert abs(share_a - 0.5) < 0.06
    # B upsampled ~1.25x: some docs must appear twice
    assert sampled.where("source = 'B' and copy_idx = 1").count() > 0


# --- op 94: deterministic shuffle -------------------------------------------


def test_shuffle_is_deterministic_permutation(spark):
    df = _ids_df(spark, 1000, partitions=3).withColumn(
        "payload", F.col("doc_id") * 2
    )
    o1 = [r.doc_id for r in deterministic_shuffle(df, seed=5, num_partitions=4).collect()]
    df2 = _ids_df(spark, 1000, partitions=17).withColumn("payload", F.col("doc_id") * 2)
    o2 = [r.doc_id for r in deterministic_shuffle(df2, seed=5, num_partitions=4).collect()]
    assert sorted(o1) == list(range(1000))  # permutation
    assert o1 == o2  # layout-independent total order
    assert o1 != sorted(o1)  # actually shuffled
    o3 = [r.doc_id for r in deterministic_shuffle(df, seed=6, num_partitions=4).collect()]
    assert o3 != o1
    # seeds give near-independent orders: rank correlation ~ 0
    r1 = np.argsort(np.argsort(o1))
    r3 = np.argsort(np.argsort(o3))
    corr = np.corrcoef(r1, r3)[0, 1]
    assert abs(corr) < 0.1


def test_shuffle_single_range_exchange(spark):
    df = _ids_df(spark, 100)
    plan = deterministic_shuffle(df, seed=1, num_partitions=4)._jdf.queryExecution().executedPlan().toString()
    assert plan.lower().count("exchange") == 1
    assert "rangepartitioning" in plan.lower()


def test_shuffle_spreads_upsampled_copies(spark):
    df = deterministic_sample(_ids_df(spark, 200), 3.0, seed=2)
    out = deterministic_shuffle(df, seed=9, extra_key_cols=["copy_idx"], num_partitions=4)
    rows = [(r.doc_id, r.copy_idx) for r in out.collect()]
    assert len(rows) == 600 and len(set(rows)) == 600
    # the 3 copies of a doc should not sit adjacent: measure mean gap of doc 0
    pos = [i for i, (d, _) in enumerate(rows) if d == 0]
    assert max(pos) - min(pos) > 10


# --- op 95: sequence packing -------------------------------------------------


def test_chunk_parts_long_doc(spark):
    df = spark.createDataFrame([(1, 5000), (2, 2048), (3, 10)], "doc_id long, n_tokens long")
    parts = {(r.doc_id, r.part_idx): r.part_tokens for r in chunk_parts(df, 2048, "n_tokens", "doc_id").collect()}
    assert parts == {(1, 0): 2048, (1, 1): 2048, (1, 2): 904, (2, 0): 2048, (3, 0): 10}


def _rand_docs(spark, n=400, seed=0, hi=3000):
    rng = np.random.default_rng(seed)
    toks = rng.integers(20, hi, n)
    pdf = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64), "n_tokens": toks.astype(np.int64)})
    return spark.createDataFrame(pdf), pdf


def _py_ffd(parts, max_tokens):
    """Independent FFD mirror: parts = list of (doc_id, part_idx, tokens)."""
    parts = sorted(parts, key=lambda p: (-p[2], p[0], p[1]))
    bins, out = [], {}
    for d, pi, t in parts:
        for b in range(len(bins)):
            if bins[b] + t <= max_tokens:
                out[(d, pi)] = (b, bins[b])
                bins[b] += t
                break
        else:
            out[(d, pi)] = (len(bins), 0)
            bins.append(t)
    return out


def test_pack_matches_python_mirror_single_bucket(spark):
    df, pdf = _rand_docs(spark, n=200, seed=4)
    max_tokens = 2048
    got = pack_sequences(df, max_tokens, bucket_target_tokens=10**12).collect()
    # build the same parts list the operator chunks to
    parts = []
    for d, n in zip(pdf.doc_id, pdf.n_tokens):
        rem, pi = int(n), 0
        while rem > 0:
            parts.append((int(d), pi, min(rem, max_tokens)))
            rem -= max_tokens
            pi += 1
    mirror = _py_ffd(parts, max_tokens)
    assert len(got) == len(mirror)
    for r in got:
        b, off = mirror[(r.doc_id, r.part_idx)]
        assert r.seq_id == f"0-{b}"
        assert r.offset == off


def test_pack_invariants_multi_bucket(spark):
    df, pdf = _rand_docs(spark, n=500, seed=7)
    max_tokens = 2048
    asg = pack_sequences(df, max_tokens, bucket_target_tokens=100_000, seed=1)
    asg.cache()
    rows = asg.collect()
    # every (doc, part) exactly once; per-doc token totals preserved
    keys = [(r.doc_id, r.part_idx) for r in rows]
    assert len(keys) == len(set(keys))
    per_doc = {}
    for r in rows:
        per_doc[r.doc_id] = per_doc.get(r.doc_id, 0) + r.part_tokens
    assert per_doc == {int(d): int(n) for d, n in zip(pdf.doc_id, pdf.n_tokens)}
    # capacity + non-overlapping offsets per sequence
    by_seq = {}
    for r in rows:
        by_seq.setdefault(r.seq_id, []).append((r.offset, r.part_tokens))
    for seq, items in by_seq.items():
        items.sort()
        assert sum(t for _, t in items) <= max_tokens
        cur = 0
        for off, t in items:
            assert off == cur
            cur += t
    rep = packing_report(asg, max_tokens)
    assert rep["n_parts"] == len(rows)
    assert rep["fill_rate"] > 0.9
    asg.unpersist()


def test_pack_deterministic_across_layout(spark):
    df1, _ = _rand_docs(spark, n=300, seed=9)
    a = {(r.doc_id, r.part_idx): (r.seq_id, r.offset) for r in pack_sequences(df1.repartition(2), 1024, bucket_target_tokens=50_000).collect()}
    b = {(r.doc_id, r.part_idx): (r.seq_id, r.offset) for r in pack_sequences(df1.repartition(11), 1024, bucket_target_tokens=50_000).collect()}
    assert a == b


# --- op 94 companion: global position / shard manifest ------------------------


def test_global_position_follows_shuffle_order(spark):
    df = _ids_df(spark, 500, partitions=3).withColumn("payload", F.col("doc_id") + 7)
    shuffled = deterministic_shuffle(df, seed=4, num_partitions=5)
    # cache: position stamping runs two actions over the same lineage
    shuffled = shuffled.cache()
    expect_order = [r.doc_id for r in shuffled.collect()]
    pos_df = with_global_position(shuffled)
    rows = pos_df.collect()
    shuffled.unpersist()
    assert sorted(r.global_pos for r in rows) == list(range(500))
    by_pos = [r.doc_id for r in sorted(rows, key=lambda r: r.global_pos)]
    assert by_pos == expect_order  # positions follow the training order
    assert set(pos_df.columns) == {"doc_id", "payload", "global_pos"}


def test_with_shard_sizes(spark):
    df = _ids_df(spark, 250, partitions=4).cache()
    pos = with_global_position(deterministic_shuffle(df, seed=1, num_partitions=3).cache())
    sharded = with_shard(pos, rows_per_shard=64)
    sizes = {r.shard_id: r["count"] for r in sharded.groupBy("shard_id").count().collect()}
    assert sizes == {0: 64, 1: 64, 2: 64, 3: 58}


def test_mix_corpora_null_domain_rows_excluded(spark):
    df = (
        spark.range(0, 300)
        .withColumnRenamed("id", "doc_id")
        .withColumn(
            "source",
            F.when(F.col("doc_id") < 100, "A")
            .when(F.col("doc_id") < 200, "B")
            .otherwise(F.lit(None).cast("string")),
        )
    )
    sampled, report = mix_corpora(df, targets={"A": 1, "B": 1}, seed=3)
    rep = {r.domain: r for r in report.collect()}
    assert rep["__null__"].fraction == 0.0
    assert rep["__null__"].weight == 100.0
    assert sampled.where(F.col("source").isNull()).count() == 0
    # targeted domains unaffected by the null mass
    assert rep["A"].expected_share == pytest.approx(0.5)


def test_pack_sequences_copy_col_full_range_ids(spark):
    # ids near the int64 edge: the packer must key on (doc_id, copy_idx)
    # without any arithmetic folding
    big = 2**62
    df = spark.createDataFrame(
        [(big + i, c, 700) for i in range(5) for c in range(3)],
        "doc_id long, copy_idx int, n_tokens long",
    )
    rows = pack_sequences(
        df, 2048, bucket_target_tokens=10**9, copy_col="copy_idx"
    ).collect()
    keys = [(r.doc_id, r.copy_idx, r.part_idx) for r in rows]
    assert len(keys) == 15 and len(set(keys)) == 15
    assert {r.doc_id for r in rows} == {big + i for i in range(5)}
    assert {r.copy_idx for r in rows} == {0, 1, 2}


def test_global_position_on_fresh_parquet_read(spark, tmp_path):
    # the documented cheap deterministic lineage: a parquet read — positions
    # must come out dense and unique even across the two internal actions
    p = str(tmp_path / "thin.parquet")
    deterministic_shuffle(_ids_df(spark, 400, partitions=3), seed=2, num_partitions=4).write.parquet(p)
    pos = with_global_position(spark.read.parquet(p)).collect()
    got = sorted(r.global_pos for r in pos)
    assert got == list(range(400))
    assert len({r.doc_id for r in pos}) == 400
