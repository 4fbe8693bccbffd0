#!/usr/bin/env python
"""Shuffle-codec A/B at the 4N scaling point (round 6).

Motivation: scaling sessions 4 and 5 decomposed the sub-0.8 efficiency to
two host regimes — per-core bandwidth loss at full utilization (s4) and
4N under-utilization at full per-core parity (s5). The one engine-side
lever that trades CPU (abundant at 4N) for bytes moved through the shared
memory controller / page cache is the compression codec: Spark's default
is lz4 (fast, ~2x ratio); zstd compresses shuffle/broadcast/spill ~1.3-2x
smaller at moderate CPU cost. On a real cluster this is a
network-bandwidth lever; in this sandbox it is a memory-bandwidth lever —
the same regime the 4N side dies in.

Protocol: 4N-only (local-cluster[4,6,8192] @ 40M pages, pipeline-only,
fair-share pinned — identical to the scaling protocol's 4N side), runs
strictly interleaved lz4, zstd, lz4, zstd, ... so within-session drift
taxes neither arm. Headline = median pipeline docs/sec per arm + the
pairwise adjacent ratios.

Writes BENCH/CODEC_AB_<tag>.md + raw runs to BENCH/runs_<tag>.jsonl.

Usage: python bench/run_codec_ab.py [--pairs 3] [--tag r6codec]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--pages", type=int, default=40_000_000)
    ap.add_argument("--master", default="local-cluster[4,6,8192]")
    ap.add_argument("--tag", default="r6codec")
    args = ap.parse_args()

    base_env = {
        "SPARK_GRAFT_PIN": "1",
        "SPARK_GRAFT_PIPELINE_ONLY": "1",
        "SPARK_GRAFT_SHUFFLE": "96",
        "SPARK_GRAFT_ADVISORY": "16m",
    }
    arms = [
        ("lz4", {}),  # Spark default — no override, byte-identical to the scaling runs
        ("zstd", {"SPARK_GRAFT_EXTRA_CONF": "spark.io.compression.codec=zstd"}),
    ]

    raw_path = os.path.join(REPO, "BENCH", f"runs_{args.tag}.jsonl")
    results: list[dict] = []
    for i in range(args.pairs):
        for name, extra in arms:
            r = run_once(args.master, args.sf_dir, args.pages, "expr",
                         extra_env={**base_env, **extra})
            r["codec"] = name
            r["ab_index"] = i + 1
            results.append(r)
            with open(raw_path, "a") as f:
                f.write(json.dumps(r) + "\n")
            print(f"[{name}{i+1}] docs/s={r['docs_per_sec']:,.1f} "
                  f"pipeline={r['value']:.1f}s "
                  f"busy_cores_at_start={r['host_idle_check']['busy_cores_at_start']}"
                  f" cal={r['cpu_calibration_sec']}",
                  flush=True)

    by = {name: [r for r in results if r["codec"] == name] for name, _ in arms}
    med = {name: statistics.median(r["docs_per_sec"] for r in rs)
           for name, rs in by.items()}
    # adjacent pairwise ratios (zstd_i / lz4_i) — drift-robust comparison
    ratios = [by["zstd"][i]["docs_per_sec"] / by["lz4"][i]["docs_per_sec"]
              for i in range(args.pairs)]

    lines = [
        f"# BENCH/CODEC_AB_{args.tag}.md — shuffle-codec A/B at 4N",
        "",
        f"{args.master} @ {args.pages:,} pages, pipeline-only, fair-share "
        "pinned, shuffle=96, advisory=16m. Strict interleave lz4, zstd, ... "
        "(same drift logic as the scaling-pairs protocol).",
        "",
        "| pair | lz4 docs/s | zstd docs/s | zstd/lz4 |",
        "| --- | --- | --- | --- |",
    ]
    for i in range(args.pairs):
        lines.append(
            f"| {i+1} | {by['lz4'][i]['docs_per_sec']:,.0f} "
            f"| {by['zstd'][i]['docs_per_sec']:,.0f} | {ratios[i]:.3f} |")
    lines += [
        "",
        f"**Median docs/s: lz4 {med['lz4']:,.0f}, zstd {med['zstd']:,.0f}; "
        f"median adjacent ratio {statistics.median(ratios):.3f}**",
        "",
        "Idle checks (busy cores at start): " + ", ".join(
            f"{r['codec']}{r['ab_index']}={r['host_idle_check']['busy_cores_at_start']}"
            for r in results),
    ]
    out = os.path.join(REPO, "BENCH", f"CODEC_AB_{args.tag}.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"\nmedian ratio zstd/lz4 = {statistics.median(ratios):.3f} -> {out}")


if __name__ == "__main__":
    main()
