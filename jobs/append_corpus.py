#!/usr/bin/env python
"""Incremental corpus append job — dedupe a new crawl batch against an
EXISTING deduped corpus without re-scanning it. Submit:

  spark-submit --py-files dist/tiledspark.zip jobs/append_corpus.py \
      --new-docs <batch-parquet> --base-docs <corpus-parquet> \
      --out <kept-new-parquet> [--base-signatures <stored-bands-parquet>] \
      [--signatures-out <kept-new-bands-parquet>] [--min-jaccard 0.5]

The production append shape (SURVEY §2E op 84): the base corpus persists
its band signatures ONCE (textops.band_signatures); each batch append pays
O(batch) signing + a band-key equi-join where the tiny new side broadcasts
— the base text is touched only for exact-verify candidates, column-pruned.
Byte-identical duplicates need no separate exact pass here: identical text
gives identical signatures, which collide in EVERY band, so the pair is a
certain candidate at Jaccard 1.0.

Keeper semantics MATCH full-batch dedup (base ∪ batch, CC keeper = the
component's anchor): connected components run over all qualifying pairs;
a new doc is dropped if its component contains ANY base doc (the base —
already deduped and published — always wins), otherwise the component's
minimum new id survives. Pinned against full-batch dedup in the e2e test.

Prints: {"n_new", "n_pairs", "n_components", "n_dropped_vs_base",
"n_dropped_within_batch", "n_kept", "out"}.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--new-docs", required=True)
    ap.add_argument("--base-docs", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--base-signatures", default=None,
                    help="stored band_signatures parquet for the base corpus "
                         "(skips re-signing it); params must match")
    ap.add_argument("--signatures-out", default=None,
                    help="also write band signatures for the KEPT new docs "
                         "(append these to the stored base signatures)")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--min-jaccard", type=float, default=0.5)
    ap.add_argument("--est-threshold", type=float, default=0.2)
    args = ap.parse_args()

    from tiledspark.graph import connected_components
    from tiledspark.textops import band_signatures, lsh_candidate_pairs_incremental

    spark = SparkSession.builder.appName("tiledspark-append-corpus").getOrCreate()
    idc, txt = args.id_col, args.text_col

    new_docs = spark.read.parquet(args.new_docs)
    base_docs = spark.read.parquet(args.base_docs)
    base_banded = (
        spark.read.parquet(args.base_signatures) if args.base_signatures else None
    )
    n_new = new_docs.count()

    pairs = lsh_candidate_pairs_incremental(
        new_docs, base_docs, idc, text_col=txt,
        est_threshold=args.est_threshold, base_banded=base_banded,
    ).where(
        F.col("n_inter").cast("double")
        >= F.lit(args.min_jaccard) * F.col("n_union").cast("double")
    ).select("id_a", "id_b").localCheckpoint(eager=False)
    n_pairs = pairs.count()

    new_ids = new_docs.select(F.col(idc).alias("id")).localCheckpoint()
    if n_pairs:
        labels = connected_components(pairs)  # (id, comp), pair nodes only
        lab_new = labels.join(new_ids, "id", "left_semi")
        lab_base = labels.join(new_ids, "id", "left_anti")
        # components anchored by ANY base doc drop all their new members;
        # unanchored components keep their minimum new id
        anchored = lab_base.select("comp").distinct()
        drop_vs_base = lab_new.join(anchored, "comp", "left_semi").select("id")
        floating = lab_new.join(anchored, "comp", "left_anti")
        keep_floating = floating.groupBy("comp").agg(F.min("id").alias("id"))
        drop_within = floating.join(
            keep_floating.select("id"), "id", "left_anti"
        ).select("id")
        # ONE stats job for both drop counts (round 9, the streaming-op
        # fusion): the tagged union's agg materializes the dropped
        # checkpoint the kept anti-join re-reads
        dropped = (
            drop_vs_base.withColumn("_vs_base", F.lit(True))
            .unionByName(drop_within.withColumn("_vs_base", F.lit(False)))
            .localCheckpoint(eager=False)
        )
        cnt = dropped.agg(
            F.sum(F.col("_vs_base").cast("int")).alias("n_base"),
            F.count(F.lit(1)).alias("n_all"),
        ).collect()[0]
        n_drop_base = int(cnt["n_base"] or 0)
        n_drop_within = int(cnt["n_all"]) - n_drop_base
        n_components = labels.select("comp").distinct().count()
        kept = new_docs.join(
            dropped.select(F.col("id").alias(idc)), idc, "left_anti"
        ).localCheckpoint(eager=False)
    else:
        n_drop_base = n_drop_within = n_components = 0
        kept = new_docs
    n_kept = kept.count()

    kept.write.mode("overwrite").parquet(args.out)
    if args.signatures_out:
        band_signatures(kept, idc, text_col=txt).write.mode("overwrite").parquet(
            args.signatures_out
        )
    print(
        json.dumps(
            {
                "n_new": n_new,
                "n_pairs": n_pairs,
                "n_components": n_components,
                "n_dropped_vs_base": n_drop_base,
                "n_dropped_within_batch": n_drop_within,
                "n_kept": n_kept,
                "out": args.out,
            }
        )
    )


if __name__ == "__main__":
    main()
