#!/usr/bin/env python
"""Stage-attribute dedup_minhash_lsh (VERDICT r6 #1).

The operator's cost splits into three candidate terms:
  A. signature pass #1 + band explode + band exchange + pair dedup
     (everything up to the materialized candidate-id pairs)
  B. signature pass #2 — with_minhash over the FULL corpus again, feeding
     the verify join (the docstring's "recomputed map-side" trade)
  C. the verify join itself + exact-jaccard HOFs on surviving pairs

This probe times, on the same sf0.1 input the bench row uses:
  t_sig    one full-corpus signature pass (lower bound for A and for B)
  t_band   _banded_ids.count() (A minus the pair self-join/dedup)
  t_cand   candidate pairs only (all of A)
  t_full   the full operator (A + B + C)
so  B+C ≈ t_full - t_cand,  and t_sig tells whether B is signature-bound.

Run:  python bench/minhash_decompose.py [--sf-dir /root/testdata/sf0.1] [--trials 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from tiledspark.session import get_spark
    from tiledspark.textops import _banded_ids, lsh_candidate_pairs, with_minhash

    spark = get_spark(app_name="minhash_decompose")
    docs = spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet")).select(
        "doc_id", "text"
    )
    # mirror the oracled row exactly: union the 10 planted copies
    planted = docs.where(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 30_000_000).alias("doc_id"), "text"
    )
    un = docs.unionByName(planted)
    un.count()  # warm page cache / file listing once, outside all timings

    def timed(fn):
        t0 = time.monotonic()
        fn()
        return round(time.monotonic() - t0, 3)

    def t_sig():
        with_minhash(un.where(F.col("text").isNotNull())).select(
            F.max(F.element_at("minhash", 1))
        ).collect()

    def t_band():
        _banded_ids(un, "doc_id", "text", 3, 16, 4).select(
            F.count(F.lit(1))
        ).collect()

    def t_cand():
        from tiledspark.textops import _candidate_pair_frame

        _candidate_pair_frame(un, "doc_id", "text", 3, 16, 4, None).count()

    def t_full():
        lsh_candidate_pairs(un, "doc_id", est_threshold=0.2, bucket_cap=None).count()

    out = {"sf_dir": args.sf_dir, "trials": args.trials}
    for name, fn in (("t_sig", t_sig), ("t_band", t_band),
                     ("t_cand", t_cand), ("t_full", t_full)):
        runs = [timed(fn) for _ in range(args.trials)]
        out[name] = {"runs": runs, "median": sorted(runs)[len(runs) // 2]}
    out["derived"] = {
        "A_candidates": out["t_cand"]["median"],
        "BC_verify": round(out["t_full"]["median"] - out["t_cand"]["median"], 3),
        "sig_share_of_band": round(out["t_sig"]["median"] / max(out["t_band"]["median"], 1e-9), 3),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
