"""Similarity search over `embeddings` (training-data pipeline surface).

Brute-force cosine top-k is the correctness baseline (oracle-checked against
DuckDB); the LSH-bucketed scale path lives in tiledspark.vector and is tested
against this baseline in pytest. Dot products run as native higher-order
functions (zip_with + aggregate) in double precision — deterministic order
(list order), rounded to 4dp on both sides so engine-level ulp jitter cannot
flip the hash.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tiledspark.registry import query, table


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _sqnorm(a):
    return F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


_DOT_SQL = (
    "list_aggregate(list_transform(list_zip({a}, {b}), "
    "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), 'sum')"
)


@query(
    "vector_topk_bruteforce",
    f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    scored AS (
        SELECT e.vec_id,
               ROUND({_DOT_SQL.format(a='e.embedding', b='q.qv')}
                     / (SQRT({_DOT_SQL.format(a='e.embedding', b='e.embedding')})
                        * SQRT({_DOT_SQL.format(a='q.qv', b='q.qv')})), 4) AS cos_sim
        FROM embeddings e, q
        WHERE e.vec_id <> 0
    )
    SELECT vec_id, cos_sim FROM scored ORDER BY cos_sim DESC, vec_id LIMIT 10
    """,
)
def vector_topk_bruteforce(spark, sf_dir):
    from tiledspark.vector import _widen

    e = table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    # widen (round 9, guide §4/§2.5): the embeddings table arrives in ONE
    # parquet split, so the interpreted-HOF dot products otherwise run on a
    # single core (measured 0.94 s for a 2k-row table on local[32]); the
    # repartition is a 2k-row shuffle, and the result is partitioning-
    # independent (total order: cos desc, vec_id asc)
    scored = (
        _widen(e.where(F.col("vec_id") != 0))
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(
                _dot(F.col("embedding"), F.col("qv"))
                / (F.sqrt(_sqnorm(F.col("embedding"))) * F.sqrt(_sqnorm(F.col("qv")))),
                4,
            ).alias("cos_sim"),
        )
    )
    return scored.orderBy(F.desc("cos_sim"), F.asc("vec_id")).limit(10)


@query(
    "vector_norms",
    """
    SELECT label,
           COUNT(*) AS n_vecs,
           ROUND(AVG(SQRT(list_aggregate(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))), 6) AS avg_l2
    FROM embeddings GROUP BY label
    """,
)
def vector_norms(spark, sf_dir):
    e = table(spark, sf_dir, "embeddings")
    return e.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(F.avg(F.sqrt(_sqnorm(F.col("embedding")))), 6).alias("avg_l2"),
    )


@query(
    "ann_lsh_topk",
    f"""
    WITH q AS (
        SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
        FROM embeddings WHERE vec_id = 0
    ),
    base AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        FROM embeddings WHERE vec_id <> 0
    ),
    planted AS (
        SELECT 20000000 + t.j AS vec_id,
               list_transform(q.qv,
                   (x, i) -> x + CAST((t.j + i - 1) % 8 AS DOUBLE) / 1024.0) AS emb
        FROM q, range(10) t(j)
    ),
    un AS (
        SELECT vec_id, emb FROM base UNION ALL SELECT vec_id, emb FROM planted
    ),
    scored AS (
        SELECT un.vec_id,
               {_DOT_SQL.format(a='un.emb', b='q.qv')}
               / (SQRT({_DOT_SQL.format(a='un.emb', b='un.emb')})
                  * SQRT({_DOT_SQL.format(a='q.qv', b='q.qv')})) AS cs
        FROM un, q
    ),
    top10 AS (
        SELECT vec_id, ROUND(cs, 4) AS cos_sim
        FROM scored ORDER BY cs DESC, vec_id LIMIT 10
    )
    SELECT m.method, t.vec_id, t.cos_sim
    FROM top10 t CROSS JOIN (SELECT 'lsh' AS method UNION ALL SELECT 'ivf') m
    """,
)
def ann_lsh_topk(spark, sf_dir):
    """BOTH ANN scale paths, ORACLED with planted ground truth (round-4; the
    driver brief names 'an IVF or LSH-bucketed variant as the scale path' —
    this row carries each as a tagged union). Ten deterministic jittered
    copies of the query vector are planted (vec_id 20M+j, +((j+i)%8)/1024
    per dim → cos≈0.99997 vs a base-corpus max well below 0.9), so the
    global top-10 is EXACTLY the planted set; the DuckDB oracle brute-forces
    every cosine and both methods must return that same true top-10
    (method='lsh': multi-table hyperplane LSH + multiprobe; method='ivf':
    sampled-k-means inverted lists + nearest-centroid probes — each with the
    guaranteed-k escalation, so a top-k call can never silently return fewer
    than k rows; CORRECTNESS_r03 recorded 0 rows here before that contract).
    Recall/exactness additionally asserted in pytest on clustered corpora."""
    from tiledspark.vector import ann_topk_ivf, ann_topk_lsh

    e = table(spark, sf_dir, "embeddings")
    qvec = [float(v) for v in e.where(F.col("vec_id") == 0).collect()[0]["embedding"]]
    base = e.where(F.col("vec_id") != 0).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("emb")
    )
    # Planted rows are DRIVER-SIDE LITERALS (round-5, VERDICT r4 #4): the
    # previous range(10).crossJoin(broadcast(q)) construction forced Catalyst
    # to lift the ANN calls' pandas-UDF bucket filters out of the join
    # condition (ExtractPythonUDFFromJoinCondition → "converted to cross
    # join" warnings on every bench run). qvec is already collected for the
    # ANN API, so the same 10 jittered copies cost zero Spark jobs. Same
    # arithmetic as the oracle: emb[i] = qv[i] + ((j + i) % 8) / 1024.
    planted = spark.createDataFrame(
        [
            (20_000_000 + j, [x + ((j + i) % 8) / 1024.0 for i, x in enumerate(qvec)])
            for j in range(10)
        ],
        "vec_id long, emb array<double>",
    )
    un = base.unionByName(planted)

    # Round 7: the two arms are independent but each blocks the driver on
    # its guaranteed-k materialize+count jobs (plus IVF's training sample
    # collect) — serially that is the row's whole wall. Build them on two
    # threads so the blocking jobs overlap in the scheduler (same pattern as
    # snapshot commit()'s concurrent data+index writes); the returned plan
    # union is unchanged and deterministic.
    from concurrent.futures import ThreadPoolExecutor

    def _lsh():
        return ann_topk_lsh(spark, un, qvec, k=10, emb_col="emb").select(
            F.lit("lsh").alias("method"),
            "vec_id",
            F.round("cos_sim", 4).alias("cos_sim"),
        )

    def _ivf():
        return ann_topk_ivf(
            spark, un, qvec, k=10, emb_col="emb", n_centroids=16, n_probe=4
        ).select(
            F.lit("ivf").alias("method"),
            "vec_id",
            F.round("cos_sim", 4).alias("cos_sim"),
        )

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_lsh, f_ivf = pool.submit(_lsh), pool.submit(_ivf)
        lsh, ivf = f_lsh.result(), f_ivf.result()
    return lsh.unionByName(ivf)


@query(
    "embedding_near_dups",
    f"""
    WITH base AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        FROM embeddings
    ),
    planted AS (
        SELECT vec_id + 10000000 AS vec_id,
               list_transform(emb,
                   (x, i) -> x + CAST((vec_id + i - 1) % 8 AS DOUBLE) / 1024.0) AS emb
        FROM base WHERE vec_id < 10
    ),
    un AS (
        SELECT vec_id, emb FROM base UNION ALL SELECT vec_id, emb FROM planted
    ),
    pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               {_DOT_SQL.format(a='a.emb', b='b.emb')}
               / (SQRT({_DOT_SQL.format(a='a.emb', b='a.emb')})
                  * SQRT({_DOT_SQL.format(a='b.emb', b='b.emb')})) AS cs
        FROM un a JOIN un b ON a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, ROUND(cs, 4) AS cos_sim FROM pairs WHERE cs >= 0.9
    """,
)
def embedding_near_dups(spark, sf_dir):
    """Embedding near-dup detection, ORACLED (round-2 fix: the sf0.01 row was
    0 rows — vacuous). Ten deterministic jittered copies are planted
    (vec_id+10M, +((vec_id+i)%8)/1024 per dim → cos ≈ 0.999); the base
    corpus's max pair cosine at sf0.01 is 0.513, so the qualifying set is
    EXACTLY the planted pairs and the LSH path must find all of them — the
    oracle brute-forces every pair in DuckDB. Integer-derived jitter keeps
    the arithmetic bit-identical across engines."""
    from tiledspark.vector import embedding_near_dup_pairs

    e = table(spark, sf_dir, "embeddings")
    base = e.select("vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("emb"))
    planted = base.where(F.col("vec_id") < 10).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"),
        F.transform(
            "emb",
            lambda x, i: x + ((F.col("vec_id") + i) % 8).cast("double") / F.lit(1024.0),
        ).alias("emb"),
    )
    un = base.unionByName(planted)
    pairs = embedding_near_dup_pairs(un, emb_col="emb", dim=64, min_cos=0.9)
    return pairs.select("id_a", "id_b", F.round("cos_sim", 4).alias("cos_sim")).orderBy(
        "id_a", "id_b"
    )
