"""Quadtree tile tree: per-tile counts rolled up the hierarchy + the
deterministic split/merge fixpoint (SURVEY.md op 13; reference semantics:
tiled-db's tile-split/merge snapshot tests, SPEC-PINNED rule §1.3).

SPEC-PINNED split/merge rule (frozen; golden fixtures derive from it):
- a tile at zoom z in [Z_BASE, Z_MAX) SPLITS while doc_count > max_docs;
- sibling groups MERGE into their parent (zoom < Z_BASE) while the parent's
  combined count < max_docs / 4;
- applied bottom-up then top-down → unique fixpoint → deterministic tree.

Resulting leaf rule (provably equivalent, and what the implementation uses —
one pass over the count table instead of an iterative rewrite):
- leaf at z in (Z_BASE, Z_MAX]: every ancestor in [Z_BASE, z) has
  count > max_docs, and (count <= max_docs or z == Z_MAX);
- leaf at Z_BASE: count <= max_docs and parent count >= max_docs/4;
- leaf at z < Z_BASE: count < max_docs/4 and (z == 0 or parent count >=
  max_docs/4)  [all descendants absorbed — 'merged' state below the leaf].

States in the emitted tree (SURVEY.md §1.2 tile_tree):
  'materialized' = a leaf; 'split' = has materialized descendants deeper;
  'merged' = absorbed into a shallower merged leaf; 'interior' = rollup
  ancestor above the leaf level.

Scale shape: TWO shuffles total regardless of zoom depth — one groupBy at
Z_MAX (map-side partial combine does the heavy lifting), then one explode of
the (already tiny) tile-count table over its ancestor chain + re-aggregate.
No per-zoom passes over the documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tiledspark import tiles
from tiledspark.tiles import MAX_DOCS_PER_TILE, Z_BASE, Z_MAX


def tile_counts_all_zooms(
    doc_points: DataFrame,
    z_max: int = Z_MAX,
    z_base: int = Z_BASE,
    max_docs: int | None = None,
) -> DataFrame:
    """doc_points(lat, lon, ...) -> counts(tile_id, zoom, doc_count).

    Drill-down shape: aggregate at z_base first (ONE shuffle over the docs,
    map-side combined), roll ancestors up from the (tiny) tile table, and
    compute deeper-than-base counts ONLY under tiles that can actually split
    (count > max_docs — a set provably <= n_docs/max_docs). The naive
    alternative (count at z_max for everything, explode 19 ancestors) shuffles
    ~19x the distinct-tile rows for counts the split rule never looks at.

    When max_docs is None, deep counts cover every tile below z_base
    (exhaustive mode — used by tests that want the full pyramid).
    """
    docs = doc_points.where(F.col("lat").isNotNull() & F.col("lon").isNotNull())
    base = (
        docs.withColumn("tile_id", tiles.tile_id_expr(F.col("lon"), F.col("lat"), z_base))
        .groupBy("tile_id")
        .agg(F.count(F.lit(1)).alias("doc_count"))
        # materialize once: three consumers (ancestor rollup, the split-id
        # broadcast, the deep-docs join) would otherwise each re-run the
        # doc-scale groupBy; the checkpoint is O(base tiles), never O(docs).
        # Lazy (round 9): the splittable-count gate below materializes the
        # blocks inside its own job — eager + take(1) was two driver
        # barriers for one doc-scale pass; the exhaustive max_docs=None path
        # (no gate job) materializes eagerly as before.
        .localCheckpoint(eager=(max_docs is None or z_max <= z_base))
    )
    up = base.select(
        F.explode(
            tiles.tile_ancestors_literal_expr(F.col("tile_id"), z_base)
        ).alias("tile_id"),
        "doc_count",
    ).groupBy("tile_id").agg(F.sum("doc_count").alias("doc_count"))

    if z_max > z_base:
        splittable = base if max_docs is None else base.where(
            F.col("doc_count") > max_docs
        )
        # Short-circuit (round 4): when NO base tile exceeds max_docs the
        # deep branch is a guaranteed-empty full pass over the docs (join
        # against an empty broadcast). Round 9: the gate is a count() over
        # the LAZY base checkpoint — the same job computes the doc-scale
        # aggregate, stores every checkpoint block (count scans all
        # partitions, unlike take(1)), and returns the gate scalar; at
        # planet scale splittable tiles exist and the branch runs.
        if max_docs is not None and splittable.count() == 0:
            z0, _, _ = tiles.tile_unpack_exprs(F.col("tile_id"))
            return up.withColumn("zoom", z0)
        split_ids = splittable.select(F.col("tile_id").alias("_split_base"))
        deep_docs = docs.withColumn(
            "_base", tiles.tile_id_expr(F.col("lon"), F.col("lat"), z_base)
        ).join(
            F.broadcast(split_ids),
            F.col("_base") == F.col("_split_base"),
            "inner",
        )
        deep = (
            deep_docs.withColumn(
                "_deep", tiles.tile_id_expr(F.col("lon"), F.col("lat"), z_max)
            )
            .select(
                F.explode(
                    tiles.tile_ancestors_literal_expr(F.col("_deep"), z_max, z_base + 1)
                ).alias("tile_id")
            )
            .groupBy("tile_id")
            .agg(F.count(F.lit(1)).alias("doc_count"))
        )
        counts = up.unionByName(deep)
    else:
        counts = up
    z, _, _ = tiles.tile_unpack_exprs(F.col("tile_id"))
    return counts.withColumn("zoom", z)


def build_tile_tree(
    doc_points: DataFrame,
    max_docs: int = MAX_DOCS_PER_TILE,
    z_base: int = Z_BASE,
    z_max: int = Z_MAX,
) -> DataFrame:
    """-> tile_tree(tile_id, zoom, x, y, parent_id, doc_count, state).

    The golden tile-tree artifact (BASELINE.json: "golden tile-tree match rate
    100%"). Deterministic: pure function of the doc coordinates.
    """
    # Eager localCheckpoint, not cache(): the count table feeds FOUR
    # downstream references (parent self-join, split broadcast, deep set,
    # ancestor explode). A lazy cache() here never helped — the old code
    # unpersisted before the caller's first action, so every reference
    # re-derived counts from scratch, including the doc-scale deep branch
    # (measured 1.36x slower at 1.2M docs). The checkpoint is O(tiles),
    # never O(docs), and truncates the lineage exactly like graph.py's
    # fixpoint frames.
    counts = tile_counts_all_zooms(doc_points, z_max, z_base, max_docs).localCheckpoint(
        eager=True
    )
    merge_thresh = max_docs / 4.0

    parent = tiles.tile_parent_expr(F.col("tile_id"))
    with_parent = counts.withColumn(
        "parent_id", F.when(F.col("zoom") > 0, parent)
    )
    # attach parent count (self-join on the small count table; broadcast-size
    # at any realistic tile cardinality relative to docs)
    pc = counts.select(
        F.col("tile_id").alias("parent_id"), F.col("doc_count").alias("parent_count")
    )
    t = with_parent.join(pc, "parent_id", "left")

    # 'reached' for z > z_base: every ancestor in [z_base, z) has count > max.
    # ONE broadcast join: explode each deep tile's ancestors in [z_base, z),
    # count how many are split tiles, compare to the required chain length.
    # (A chained per-zoom formulation re-evaluates its whole upstream DAG per
    # broadcast exchange — measured 5x slower at sf0.1.)
    split_tiles = counts.where(
        (F.col("zoom") >= z_base) & (F.col("zoom") < z_max) & (F.col("doc_count") > max_docs)
    ).select(F.col("tile_id").alias("anc_id"))
    deep = counts.where(F.col("zoom") > z_base).select("tile_id", "zoom")
    anc_range = F.filter(
        tiles.tile_ancestors_expr(F.col("tile_id")),
        lambda a: (F.shiftrightunsigned(a, 58) >= z_base)
        & (F.shiftrightunsigned(a, 58) < F.col("zoom")),
    )
    deep_anc = deep.select(
        "tile_id", "zoom", F.explode(anc_range).alias("anc_id")
    )
    reached_deep = (
        deep_anc.join(F.broadcast(split_tiles), "anc_id", "inner")
        .groupBy("tile_id", "zoom")
        .agg(F.count(F.lit(1)).alias("n_split_anc"))
        .where(F.col("n_split_anc") == (F.col("zoom") - F.lit(z_base)))
        .select("tile_id")
    )
    reached_all = counts.where(F.col("zoom") == z_base).select("tile_id").unionByName(
        reached_deep
    )

    # NB: no broadcast here — reached_all is O(base tiles), which at planet
    # scale exceeds broadcast limits; the equi-join shuffles the small count
    # table only. split_tiles above IS broadcast-safe (≤ docs/max_docs rows).
    is_reached = F.col("_reached").isNotNull()
    t = t.join(reached_all.withColumn("_reached", F.lit(1)), "tile_id", "left")

    deep_leaf = (
        (F.col("zoom") > z_base)
        & is_reached
        & ((F.col("doc_count") <= max_docs) | (F.col("zoom") == z_max))
    )
    base_leaf = (
        (F.col("zoom") == z_base)
        & (F.col("doc_count") <= max_docs)
        & (F.coalesce(F.col("parent_count"), F.lit(0.0)) >= merge_thresh)
    )
    shallow_leaf = (
        (F.col("zoom") < z_base)
        & (F.col("doc_count") < merge_thresh)
        & ((F.col("zoom") == 0) | (F.col("parent_count") >= merge_thresh))
    )
    is_leaf = deep_leaf | base_leaf | shallow_leaf

    is_split = (
        (F.col("zoom") >= z_base)
        & (F.col("zoom") < z_max)
        & (F.col("doc_count") > max_docs)
        & ((F.col("zoom") == z_base) | is_reached)
    )
    # merged: at/below z_base but above no-leaf — absorbed into a shallower
    # merged leaf (its own count < merge_thresh chain). A tile at z <= z_base
    # is merged iff some ancestor at z' < z is a leaf, equivalently its parent
    # count < merge_thresh (parent merged or is the merged leaf).
    is_merged = (
        (F.col("zoom") <= z_base)
        & (F.col("zoom") > 0)
        & ~is_leaf
        & ~is_split
        & (F.col("parent_count") < merge_thresh)
    )

    state = (
        F.when(is_leaf, F.lit("materialized"))
        .when(is_split, F.lit("split"))
        .when(is_merged, F.lit("merged"))
        .otherwise(F.lit("interior"))
    )

    # drop unreachable deep tiles (descendants of non-split tiles)
    keep = (F.col("zoom") <= z_base) | is_reached
    z_, x_, y_ = tiles.tile_unpack_exprs(F.col("tile_id"))
    out = (
        t.where(keep)
        .select(
            "tile_id",
            F.col("zoom"),
            x_.alias("x"),
            y_.alias("y"),
            F.col("parent_id"),
            F.col("doc_count"),
            state.alias("state"),
        )
    )
    # no unpersist: `out` is lazy and still reads the checkpointed blocks;
    # they are freed with the RDD when `out` (and its plans) are GC'd.
    # Long-lived-service caveat (ADVICE r6): each call parks O(tiles)
    # checkpoint blocks in the block manager until the driver GCs the
    # returned plan — callers that loop build_tile_tree in one session
    # should drop references to the previous result (or materialize it
    # and let the plan go) rather than accumulating live DataFrames.
    return out


def assign_docs_to_leaves(
    doc_points: DataFrame,
    tree: DataFrame,
    z_max: int = Z_MAX,
) -> DataFrame:
    """Attach each doc's final (leaf) tile: compute the doc's tile at z_max,
    explode its ancestor chain, equi-join against the leaf set — each doc
    matches exactly one leaf. One equi-join; the leaf table broadcasts when
    small, shuffles cleanly otherwise."""
    leaves = tree.where(F.col("state") == "materialized").select(
        F.col("tile_id").alias("leaf_tile_id")
    )
    docs = (
        doc_points.where(F.col("lat").isNotNull() & F.col("lon").isNotNull())
        .withColumn("_deep", tiles.tile_id_expr(F.col("lon"), F.col("lat"), z_max))
        .withColumn(
            "leaf_tile_id",
            F.explode(tiles.tile_ancestors_literal_expr(F.col("_deep"), z_max)),
        )
        .drop("_deep")
    )
    return docs.join(leaves, "leaf_tile_id", "inner")


def canonical_tree_rows(tree: DataFrame) -> list[dict]:
    """Canonical serialization for goldens (FIXTURES.md §4): sorted by
    tile_id, ints as decimal strings."""
    rows = tree.orderBy("tile_id").collect()
    return [
        {
            "tile_id": str(r["tile_id"]),
            "zoom": str(r["zoom"]),
            "x": str(r["x"]),
            "y": str(r["y"]),
            "parent_id": "" if r["parent_id"] is None else str(r["parent_id"]),
            "doc_count": str(r["doc_count"]),
            "state": r["state"],
        }
        for r in rows
    ]
