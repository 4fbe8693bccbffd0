#!/usr/bin/env python
"""Scheduler locality-wait A/B at the 4N scaling point (round 8).

Motivation: the round-8 event-log attribution (bench/timeline_decompose.py
on a 40M-page 4N pipeline run) REFUTED the round-7 directive's join-stage
wave-shaping hypothesis — every doc-scale stage already fills 0.91-0.99 of
the 24 slots (the round-7 generation wave knob did its job). What remains
of the 4N under-utilization is (a) 11.4% of wall with ZERO running tasks
(driver/barrier gaps between jobs) and (b) 10.2% in partial-fill spans —
stage ramp-ups and tails. Term (b) has one classic engine-side lever:
`spark.locality.wait` (default 3s) lets the scheduler hold a task back up
to 3s per locality level hoping for a preferred executor; across the ~25
stages of the pipeline those holds land exactly in the ramp windows the
attribution measured. On a 4-executor local-cluster every executor reads
the same disk and RAM, so locality preference carries no data-transfer
benefit — wait 0 should strictly help, IF the term matters at all.

Protocol: identical to run_waves_ab.py — 4N-only (local-cluster[4,6,8192]
@ 40M pages, pipeline-only, fair-share pinned, shuffle=96, advisory=16m),
strict interleave default, wait0, default, ... so within-session drift
taxes neither arm. Resumable: banked runs in the jsonl are skipped.

Decision boundary for a real cluster: on a REAL multi-node cluster
locality wait trades scheduling delay against network reads, so a win
here does NOT directly generalize — it cleans up the single-box sandbox
number. A flat result exonerates the scheduler and leaves term (a)
(driver gaps), which is job-count work, not a conf knob.

Writes BENCH/LOCALITY_AB_<tag>.md + raw runs to BENCH/runs_<tag>.jsonl.

Usage: python bench/run_locality_ab.py [--pairs 3] [--tag r8loc]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "bench"))
from run_scaling import run_once  # noqa: E402

MASTER = "local-cluster[4,6,8192]"
PAGES = 40_000_000


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--tag", default="r8loc")
    args = ap.parse_args()

    common = {
        "SPARK_GRAFT_PIN": "1",
        "SPARK_GRAFT_SHUFFLE": "96",
        "SPARK_GRAFT_ADVISORY": "16m",
        "SPARK_GRAFT_PIPELINE_ONLY": "1",
    }
    raw_path = os.path.join(REPO, "BENCH", f"runs_{args.tag}.jsonl")
    banked: dict[str, list[dict]] = {"default": [], "wait0": []}
    if os.path.exists(raw_path):
        for line in open(raw_path):
            r = json.loads(line)
            banked[r["arm"]].append(r)

    def one(arm: str) -> dict:
        env = dict(common)
        if arm == "wait0":
            env["SPARK_GRAFT_EXTRA_CONF"] = "spark.locality.wait=0s"
        r = run_once(MASTER, args.sf_dir, PAGES, "expr", env)
        r["arm"] = arm
        with open(raw_path, "a") as f:
            f.write(json.dumps(r) + "\n")
        print(
            f"[{arm}] docs/s={r['docs_per_sec']:,} "
            f"pipeline={sum(r['queries'].values()):.1f}s "
            f"busy_cores_at_start={r['host_idle_check'].get('busy_cores_at_start', '?')}",
            flush=True,
        )
        return r

    for i in range(args.pairs):
        if len(banked["default"]) <= i:
            banked["default"].append(one("default"))
        if len(banked["wait0"]) <= i:
            banked["wait0"].append(one("wait0"))

    med = {
        arm: statistics.median(r["docs_per_sec"] for r in runs)
        for arm, runs in banked.items()
    }
    ratio = med["wait0"] / med["default"]
    lines = [
        f"# BENCH/LOCALITY_AB_{args.tag}.md — spark.locality.wait 3s (default) vs 0s at 4N",
        "",
        f"{MASTER} @ {PAGES:,} pages, pipeline-only, interleaved arms "
        f"(default, wait0) x {args.pairs}.",
        "",
        "| trial | default docs/s | wait0 docs/s |",
        "| --- | --- | --- |",
    ]
    for i in range(args.pairs):
        lines.append(
            f"| {i + 1} | {banked['default'][i]['docs_per_sec']:,.0f} "
            f"| {banked['wait0'][i]['docs_per_sec']:,.0f} |"
        )
    lines += [
        "",
        f"**Medians: default {med['default']:,.0f}, wait0 {med['wait0']:,.0f} "
        f"-> ratio {ratio:.3f}** "
        + ("(wait0 wins)" if ratio > 1.02 else
           "(flat — scheduler exonerated, residual is driver-gap term)"
           if ratio > 0.98 else "(wait0 LOSES)"),
        "",
    ]
    out = os.path.join(REPO, "BENCH", f"LOCALITY_AB_{args.tag}.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"\nmedian ratio wait0/default = {ratio:.3f} -> {out}")


if __name__ == "__main__":
    main()
