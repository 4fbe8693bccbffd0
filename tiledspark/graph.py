"""Connected components over pair edges — the transitive-closure step of a
web-scale dedup sweep.

Near-dup detection (MinHash LSH / SimHash / embedding buckets — textops.py,
vector.py) emits PAIRS, but keeper selection must be transitive: if A~B and
B~C, exactly one of {A, B, C} survives even though (A, C) may never have
been surfaced as a pair. The standard fix (CCNet / RefinedWeb-style
pipelines) is connected components over the pair graph with min-id as the
component label.

Algorithm: iterative min-label propagation — each round every node takes the
minimum component label among itself and its neighbors; converge when no
label changes. Rounds needed = graph diameter, and near-dup components are
shallow by construction (duplicates of a common source connect through it:
diameter ~2-4), so the loop is a handful of rounds even at 10^12 docs.
Spark shape per round: ONE join of the (src, dst) edge list against the
(id, comp) label table on dst + a min-aggregate on src — both shuffles are
narrow (two longs per row). Labels are localCheckpoint-ed each round to
truncate lineage (the relations.py semi-naive fixpoint pattern), and the
convergence probe rides the SAME aggregate that computes the new labels
(observe() metric), so each round is exactly one job.

For adversarially deep graphs (long chains) use the alternating
small-star/large-star variant (Kiveris et al., "Connected Components in
MapReduce and Beyond") — same per-round shape, O(log n) rounds; near-dup
graphs do not need it and the simple propagation keeps every exchange
narrow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 30,
) -> DataFrame:
    """(src, dst) undirected pair edges -> (id, comp): every node labeled
    with the MINIMUM id reachable from it. Deterministic; isolated nodes
    (absent from edges) are simply absent — callers union them back as
    their own keeper."""
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    sym = e.unionByName(e.select(F.col("d").alias("s"), F.col("s").alias("d")))
    sym = sym.dropDuplicates(["s", "d"]).localCheckpoint()

    labels = (
        sym.select(F.col("s").alias("id")).distinct().withColumn("comp", F.col("id"))
    ).localCheckpoint()

    for _ in range(max_iter):
        nbr_min = (
            sym.join(
                labels.select(F.col("id").alias("d"), F.col("comp").alias("nc")), "d"
            )
            .groupBy("s")
            .agg(F.min("nc").alias("nbc"))
            .select(F.col("s").alias("id"), "nbc")
        )
        obs = Observation()
        new_labels = (
            labels.join(nbr_min, "id", "left")
            .select(
                "id",
                F.least(F.col("comp"), F.coalesce(F.col("nbc"), F.col("comp"))).alias(
                    "comp"
                ),
                (F.col("nbc") < F.col("comp")).cast("int").alias("_chg"),
            )
            .observe(obs, F.sum("_chg").alias("changed"))
            .drop("_chg")
        )
        # localCheckpoint materializes the round (truncating lineage) AND
        # fires the observation — one job per round, no separate count()
        labels = new_labels.localCheckpoint()
        if not (obs.get["changed"] or 0):
            break
    return labels


def dedup_keepers(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """docs + near-dup pairs -> the KEEPER subset of docs: one survivor per
    connected component (the min id), every other component member dropped,
    non-paired docs kept as-is. The anti-join ships only (id, comp) pairs —
    document payloads never enter the dedup shuffle."""
    comp = connected_components(pairs, src, dst)
    losers = comp.where(F.col("comp") != F.col("id")).select(
        F.col("id").alias(id_col)
    )
    return docs.join(losers, id_col, "left_anti")
