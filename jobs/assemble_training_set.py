#!/usr/bin/env python
"""Training-set assembly job — the step AFTER prepare_corpus: turn a cleaned
corpus into what a trainer reads. Submit:

  spark-submit --py-files dist/tiledspark.zip jobs/assemble_training_set.py \
      --docs <prepared-parquet> --out <dir> \
      [--target srcA=2,srcB=1 | --temperature 0.7] [--scale 1.0] \
      [--mix-weight tokens|docs] [--shuffle-seed 0] \
      [--max-tokens 2048] [--bucket-target-tokens 4000000]

Stages (SURVEY §2 ops 93-95, tiledspark/assemble.py):

1. TOKENS — reuse an existing --n-tokens-col, else ONE codegen projection
   (the BPE-ish pre-tokenizer regexp from text_stats; no UDF).
2. MIX (optional) — epoch-weighted source mixing toward --target shares or
   --temperature-flattened shares: per-domain fractions from one narrow
   aggregate, applied as a pure per-row hash draw (floor(f) guaranteed
   copies + Bernoulli remainder). Zero doc-sized shuffles.
3. SHUFFLE — global training order: ONE range-partitioned sort on
   xxhash64(id, seed, copy_idx); reproducible from the seed alone,
   independent of input layout; re-run with a new seed per epoch.
4. PACK — FFD sequence packing at --max-tokens capacity; long docs chunked;
   hash-bucketed groups hold ~--bucket-target-tokens tokens each so packing
   memory is corpus-size-independent.
5. WRITE — <out>/corpus (the shuffled mixture; sequential file-order
   readers recover the order, but the robust key is the manifest),
   <out>/sequences (seq_id, doc_id, part_idx, offset, part_tokens), and
   with --rows-per-shard <out>/manifest (id, copy_idx, global_pos,
   shard_id — positions stamped on the shuffle lineage itself, since a
   parquet re-read does not replay write order); print ONE JSON stats
   line with the mixture audit and the packing fill rate.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

_BPE_RE = "[a-zA-Z]+|[0-9]+|[^ \\t\\n\\ra-zA-Z0-9]+"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--domain-col", default="source")
    ap.add_argument("--n-tokens-col", default=None,
                    help="existing token-count column; default: compute the "
                         "BPE-ish pre-tokenizer count from --text-col")
    ap.add_argument("--bpe-model", default=None,
                    help="JSON file holding tiledspark.bpe.train_bpe output: "
                         "token counts come from TRUE trained-BPE encoding "
                         "of --text-col instead of the pre-tokenizer regexp "
                         "(ignored when --n-tokens-col is given)")
    ap.add_argument("--target", default=None,
                    help="comma list domain=weight of target mixture shares "
                         "(relative); e.g. web=5,wiki=2,code=1")
    ap.add_argument("--temperature", type=float, default=None,
                    help="derive targets from data: share^alpha (alpha<1 "
                         "flattens toward uniform; mutually exclusive with "
                         "--target)")
    ap.add_argument("--scale", type=float, default=1.0,
                    help="total sampled weight relative to input (2.0 = two "
                         "average epochs)")
    ap.add_argument("--mix-weight", choices=("tokens", "docs"), default="tokens")
    ap.add_argument("--mix-seed", type=int, default=0)
    ap.add_argument("--shuffle-seed", type=int, default=0)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--max-tokens", type=int, default=2048)
    ap.add_argument("--bucket-target-tokens", type=int, default=4_000_000)
    ap.add_argument("--rows-per-shard", type=int, default=None,
                    help="also write <out>/manifest: (id, copy_idx, "
                         "global_pos, shard_id) over the shuffled order — "
                         "fixed-size shards, all full except the last")
    args = ap.parse_args()
    if args.target and args.temperature is not None:
        ap.error("--target and --temperature are mutually exclusive")

    from tiledspark.assemble import (
        deterministic_shuffle,
        mix_corpora,
        pack_sequences,
        packing_report,
        with_global_position,
        with_shard,
    )

    spark = SparkSession.builder.appName("tiledspark-assemble").getOrCreate()
    idc, txt = args.id_col, args.text_col

    docs = spark.read.parquet(args.docs)
    # fail fast (ADVICE r8): the packing schema (_PACK_SCHEMA) and the shard
    # manifests carry doc_id as a 64-bit integer; a string-id corpus would
    # otherwise fail (or corrupt) at Arrow conversion deep inside
    # pack_sequences' applyInPandas
    id_type = docs.schema[args.id_col].dataType.simpleString()
    if id_type not in ("bigint", "int", "smallint", "tinyint"):
        raise SystemExit(
            f"--id-col {args.id_col!r} has type {id_type}; the packing/"
            "manifest schema requires a 64-bit-integer id — cast or remap "
            "the id column first"
        )
    ntc = args.n_tokens_col
    if ntc is None:
        ntc = "n_tokens"
        if args.bpe_model:
            from tiledspark.bpe import bpe_encode_udf

            with open(args.bpe_model) as fh:
                bpe_model = json.load(fh)
            docs = docs.withColumn(
                ntc, bpe_encode_udf(bpe_model, count_only=True)(F.col(txt)).cast("long")
            )
        else:
            docs = docs.withColumn(ntc, F.regexp_count(F.col(txt), F.lit(_BPE_RE)))
    n_input = docs.count()

    stats: dict = {"n_input_docs": n_input}
    mixed = docs.withColumn("copy_idx", F.lit(0))
    if args.target or args.temperature is not None:
        targets = None
        if args.target:
            targets = {}
            for part in args.target.split(","):
                d, w = part.split("=")
                targets[d.strip()] = float(w)
        mixed, report = mix_corpora(
            docs,
            targets=targets,
            temperature=args.temperature,
            scale=args.scale,
            seed=args.mix_seed,
            domain_col=args.domain_col,
            weight_col=ntc if args.mix_weight == "tokens" else None,
            id_col=idc,
        )
        stats["mixture"] = {
            r["domain"]: {
                "share": round(r["share"], 6),
                "fraction": round(r["fraction"], 6),
                "expected_share": round(r["expected_share"], 6),
            }
            for r in report.collect()
        }

    shuffled = deterministic_shuffle(
        mixed,
        seed=args.shuffle_seed,
        id_col=idc,
        num_partitions=args.shuffle_partitions,
        extra_key_cols=["copy_idx"],
    )
    corpus_out = args.out.rstrip("/") + "/corpus"
    shuffled.write.mode("overwrite").parquet(corpus_out)

    # pack over the WRITTEN corpus; copy_col makes each upsampled (doc,
    # copy) pair an independent packing item with its real 64-bit id intact
    kept = spark.read.parquet(corpus_out)
    stats["n_sampled_rows"] = kept.count()
    if args.rows_per_shard:
        # shard manifest: positions must be stamped on the SHUFFLED lineage
        # itself — a parquet read-back does not replay write order (Spark
        # size-packs file splits), so re-reading the corpus would misorder.
        # The projection is thin (two ints + key): column pruning makes the
        # repeated range sort cheap; readers join the manifest on
        # (id, copy_idx) rather than trusting any file order.
        # localCheckpoint pins the partitioning: with_global_position runs
        # two actions over its input, and an unmaterialized
        # repartitionByRange may re-sample different range boundaries per
        # action (RangePartitioner seeds from the execution's rdd id),
        # which would corrupt the stamped positions. Lazy (round 9): the
        # checkpoint compiles the plan to ONE RDD at creation either way, so
        # the range shuffle executes exactly once — the first stamping
        # action materializes the blocks the second one re-reads
        thin = deterministic_shuffle(
            mixed.select(idc, "copy_idx"),
            seed=args.shuffle_seed,
            id_col=idc,
            num_partitions=args.shuffle_partitions,
            extra_key_cols=["copy_idx"],
        ).localCheckpoint(eager=False)
        manifest = with_shard(with_global_position(thin), args.rows_per_shard)
        manifest.write.mode("overwrite").parquet(args.out.rstrip("/") + "/manifest")
        stats["n_shards"] = manifest.agg(F.countDistinct("shard_id")).first()[0]

    asg = pack_sequences(
        kept.select(F.col(idc).alias("doc_id"), "copy_idx", F.col(ntc).cast("long").alias("n_tokens")),
        args.max_tokens,
        bucket_target_tokens=args.bucket_target_tokens,
        seed=args.shuffle_seed,
        copy_col="copy_idx",
    )
    seq_out = args.out.rstrip("/") + "/sequences"
    asg.write.mode("overwrite").parquet(seq_out)
    stats["packing"] = packing_report(spark.read.parquet(seq_out), args.max_tokens)
    stats["max_tokens"] = args.max_tokens

    print(json.dumps(stats))
    spark.stop()


if __name__ == "__main__":
    main()
