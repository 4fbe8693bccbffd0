#!/usr/bin/env python
"""Generation-stage wave-count A/B at the 4N scaling point: 1 wave vs 4 waves.

Motivation: scaling sessions 5-6 decomposed their sub-0.8 efficiency to 4N
UNDER-UTILIZATION (time-avg CPU 0.68-0.80 of 28 cores) at intact
per-busy-core parity — cores idle waiting. The pipeline's single biggest
map stage (expr page generation + regex coordinate extraction, the bulk of
tile_build) runs with spark.range's default partitioning =
defaultParallelism = ONE TASK PER SLOT: a single wave. A single-wave stage
pays the full straggler tail — when one of 24 tasks runs long, the other
23 slots sit idle until it finishes, and E[max of 24 iid durations]
exceeds E[max of 6] (the N baseline's wave) in relative terms. Four waves
(96 partitions at 4N) bound the tail at ~1/4 of a wave and give the
scheduler room to rebalance, at the cost of 4x task-launch overhead and a
4x-smaller Arrow batch per python-UDF task.

The knob is SPARK_GRAFT_RANGE_PARTS (bench.py -> synth.pages_df
num_partitions). Row content depends only on `id`, so the arms read
byte-identical data — this is purely a scheduling A/B.

Protocol: identical to run_localdir_ab.py / run_codec_ab.py — 4N-only
(local-cluster[4,6,8192] @ 40M pages, pipeline-only, fair-share pinned),
strict interleave 1wave, 4wave, 1wave, ... so within-session drift taxes
neither arm. Resumable: banked runs in the jsonl are skipped.

Decision boundary for a real cluster: if 4 waves win, the lesson
generalizes — size the INPUT partitioning of generation/scan stages to
several waves per slot count (or let AQE coalesce from a high initial
count); if flat/lose, the generation stage fills its slots fine and the
under-utilization lives elsewhere (use bench/timeline_decompose.py on an
event-logged run to locate it).

Writes BENCH/WAVES_AB_<tag>.md + raw runs to BENCH/runs_<tag>.jsonl.

Usage: python bench/run_waves_ab.py [--pairs 3] [--tag r6waves]
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
    ap.add_argument("--parts", type=int, default=96,
                    help="range partitions for the multi-wave arm "
                    "(96 = 4 waves on 24 slots)")
    ap.add_argument("--tag", default="r6waves")
    args = ap.parse_args()

    base_env = {
        "SPARK_GRAFT_PIN": "1",
        "SPARK_GRAFT_PIPELINE_ONLY": "1",
        "SPARK_GRAFT_SHUFFLE": "96",
        "SPARK_GRAFT_ADVISORY": "16m",
    }
    arms = [
        ("1wave", {}),  # spark.range default — byte-identical to the scaling runs
        (f"{args.parts}parts", {"SPARK_GRAFT_RANGE_PARTS": str(args.parts)}),
    ]

    raw_path = os.path.join(REPO, "BENCH", f"runs_{args.tag}.jsonl")
    results: list[dict] = []
    if os.path.exists(raw_path):
        with open(raw_path) as f:
            results = [json.loads(line) for line in f if line.strip()]
        if results:
            print(f"resuming: {len(results)} banked runs in {raw_path}")
    done = {(r["range_arm"], r["ab_index"]) for r in results}
    for i in range(args.pairs):
        for name, extra in arms:
            if (name, i + 1) in done:
                continue
            r = run_once(args.master, args.sf_dir, args.pages, "expr",
                         extra_env={**base_env, **extra})
            r["range_arm"] = name
            r["ab_index"] = i + 1
            results.append(r)
            with open(raw_path, "a") as f:
                f.write(json.dumps(r) + "\n")
            print(f"[{name}{i+1}] docs/s={r['docs_per_sec']:,.1f} "
                  f"pipeline={r['value']:.1f}s "
                  f"util_cores={r.get('cpu_util_cores')} "
                  f"busy_cores_at_start={r['host_idle_check']['busy_cores_at_start']}",
                  flush=True)

    by = {name: sorted((r for r in results if r["range_arm"] == name),
                       key=lambda r: r["ab_index"])
          for name, _ in arms}
    a, b = arms[0][0], arms[1][0]
    med = {name: statistics.median(r["docs_per_sec"] for r in rs)
           for name, rs in by.items()}
    npairs = min(len(by[a]), len(by[b]))
    ratios = [by[b][i]["docs_per_sec"] / by[a][i]["docs_per_sec"]
              for i in range(npairs)]

    lines = [
        f"# BENCH/WAVES_AB_{args.tag}.md — generation-stage wave-count A/B at 4N",
        "",
        f"{args.master} @ {args.pages:,} pages, pipeline-only, fair-share "
        f"pinned, shuffle=96, advisory=16m. Arm `{a}` = spark.range default "
        f"(defaultParallelism partitions = single wave); arm `{b}` = "
        f"SPARK_GRAFT_RANGE_PARTS={args.parts} (~{args.parts // 24} waves on "
        "24 slots). Strict interleave; identical data (content is a pure "
        "function of row id).",
        "",
        f"| pair | {a} docs/s | {b} docs/s | {b}/{a} | {a} util | {b} util |",
        "| --- | --- | --- | --- | --- | --- |",
    ]
    for i in range(npairs):
        lines.append(
            f"| {i+1} | {by[a][i]['docs_per_sec']:,.0f} "
            f"| {by[b][i]['docs_per_sec']:,.0f} | {ratios[i]:.3f} "
            f"| {by[a][i].get('cpu_util_cores', '?')} "
            f"| {by[b][i].get('cpu_util_cores', '?')} |")
    lines += [
        "",
        f"**Median docs/s: {a} {med[a]:,.0f}, {b} {med[b]:,.0f}; "
        f"median adjacent ratio {statistics.median(ratios):.3f}**",
        "",
        "Idle checks (busy cores at start): " + ", ".join(
            f"{r['range_arm']}{r['ab_index']}={r['host_idle_check']['busy_cores_at_start']}"
            for r in results),
    ]
    out = os.path.join(REPO, "BENCH", f"WAVES_AB_{args.tag}.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"\nmedian ratio {b}/{a} = {statistics.median(ratios):.3f} -> {out}")


if __name__ == "__main__":
    main()
