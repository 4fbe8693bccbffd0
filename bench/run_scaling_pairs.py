#!/usr/bin/env python
"""Decay-robust interleaved-pair scaling protocol (round 5; VERDICT r4 #1).

Four rounds of evidence established that (a) the engine reaches >=0.8
anchored N->4N efficiency on a fresh host at 40M pages (0.849 measured,
round 4), and (b) this sandbox host's throughput decays ~18% per session on
frozen code, so any protocol that runs all N before all 4N (or vice versa)
taxes whichever side runs later and cannot reproduce the number. This
protocol removes the asymmetry:

- Runs are strictly interleaved  N, 4N, N, 4N, ..., N  (a trailing N run
  brackets the last 4N), started FIRST on an idle host (bench.py's
  host_idle_check is recorded per run).
- Each run is PIPELINE-ONLY (SPARK_GRAFT_PIPELINE_ONLY=1): exactly the
  three stages that define the north-star metric (tile_build + tile_tree +
  spatial_join over the deduped geocoded corpus), so the whole session fits
  in a fresh-host window.
- N runs at its largest feasible corpus (16M pages; the 1-executor
  baseline OOMs past ~20M — measured rounds 3-4), 4N at the 40M-page
  volume point where per-stage volume amortizes fixed stage-barrier
  latency (the round-4 volume curve). Efficiency is the volume-anchored
  docs/sec ratio the round-4 verdict graded:
      eff_i = dps_4N(i) / (4 * anchor_N(i))
  with anchor_N(i) = mean(dps_N before, dps_N after) — under monotone
  decay the bracketed mean penalizes neither side. The preceding-anchor
  ("adjacent") ratio is reported alongside.
- Headline = median of the >=3 bracketed pair efficiencies.

Fair-share pinning, shuffle partitions, and AQE advisory size are the
round-3/4 protocol-of-record values (see run_scaling.py); only the
run ORDER and the per-run stage set differ.

Writes BENCH/PAIRS_<tag>.md + appends raw runs to BENCH/runs_<tag>.jsonl
(--tag, default r5 for artifact continuity).

Usage: python bench/run_scaling_pairs.py [--pairs 3] [--tag r6]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "bench"))
from run_scaling import run_once  # noqa: E402  (same bench.py subprocess driver)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--pages-n", type=int, default=16_000_000,
                    help="N-side corpus (largest the 1-executor baseline fits)")
    ap.add_argument("--pages-4n", type=int, default=40_000_000,
                    help="4N-side volume point (round-4 curve peak)")
    ap.add_argument("--master-n", default="local-cluster[1,6,8192]")
    ap.add_argument("--master-4n", default="local-cluster[4,6,8192]")
    ap.add_argument("--shuffle", type=int, default=96)
    ap.add_argument("--advisory", default="16m")
    ap.add_argument("--cooldown", type=int, default=10)
    ap.add_argument("--tag", default="r5", help="artifact tag: writes BENCH/PAIRS_<tag>.md + runs_<tag>.jsonl")
    args = ap.parse_args()

    common = {
        "SPARK_GRAFT_PIN": "1",
        "SPARK_GRAFT_SHUFFLE": str(args.shuffle),
        "SPARK_GRAFT_ADVISORY": args.advisory,
        "SPARK_GRAFT_PIPELINE_ONLY": "1",
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    raw_path = os.path.join(REPO, "BENCH", f"runs_{args.tag}.jsonl")

    def one(master: str, pages: int, tag: str) -> dict | None:
        for attempt in range(3):
            try:
                r = run_once(master, args.sf_dir, pages, "expr", dict(common))
                r["pair_tag"] = tag
                with open(raw_path, "a") as f:
                    f.write(json.dumps(r) + "\n")
                print(
                    f"[{tag}] {master} @ {pages:,}: docs/s={r['docs_per_sec']:,} "
                    f"pipeline={r['queries']['tile_build'] + r['queries']['tile_tree'] + r['queries']['spatial_join']:.1f}s "
                    f"busy_cores_at_start={r['host_idle_check'].get('busy_cores_at_start', '?')}",
                    flush=True,
                )
                time.sleep(args.cooldown)
                return r
            except RuntimeError as e:
                print(f"[{tag}] attempt {attempt + 1} failed: {str(e)[:200]}", flush=True)
                time.sleep(20)
        return None

    # strict interleave: N, 4N, N, 4N, ..., 4N, N (trailing N brackets the last 4N)
    n_runs: list[dict] = []
    x4_runs: list[dict] = []
    for i in range(args.pairs):
        rn = one(args.master_n, args.pages_n, f"N{i + 1}")
        if rn is None:
            raise RuntimeError(f"N run {i + 1} failed 3x")
        n_runs.append(rn)
        r4 = one(args.master_4n, args.pages_4n, f"4N{i + 1}")
        if r4 is None:
            raise RuntimeError(f"4N run {i + 1} failed 3x")
        x4_runs.append(r4)
    rn = one(args.master_n, args.pages_n, f"N{args.pairs + 1}")
    if rn is not None:
        n_runs.append(rn)

    rows = []
    for i, r4 in enumerate(x4_runs):
        before = n_runs[i]["docs_per_sec"]
        after = n_runs[i + 1]["docs_per_sec"] if i + 1 < len(n_runs) else None
        anchor = (before + after) / 2.0 if after else before
        rows.append(
            {
                "pair": i + 1,
                "dps_n_before": before,
                "dps_4n": r4["docs_per_sec"],
                "dps_n_after": after,
                "eff_adjacent": r4["docs_per_sec"] / (4.0 * before),
                "eff_bracketed": r4["docs_per_sec"] / (4.0 * anchor),
            }
        )
    med_bracketed = statistics.median(r["eff_bracketed"] for r in rows)
    med_adjacent = statistics.median(r["eff_adjacent"] for r in rows)

    lines = [
        f"# BENCH/PAIRS_{args.tag}.md — interleaved-pair scaling protocol",
        "",
        f"Sequence (one session, idle-verified start): "
        + ", ".join([f"N{i // 2 + 1}" if i % 2 == 0 else f"4N{i // 2 + 1}"
                     for i in range(2 * args.pairs)] + [f"N{args.pairs + 1}"]),
        "",
        f"N = {args.master_n} @ {args.pages_n:,} pages; "
        f"4N = {args.master_4n} @ {args.pages_4n:,} pages (volume-anchored — "
        "see module docstring). Pipeline-only runs; fair-share pinning; "
        f"shuffle={args.shuffle}, advisory={args.advisory}.",
        "",
        "| pair | N docs/s (before) | 4N docs/s | N docs/s (after) | eff (adjacent) | eff (bracketed) |",
        "| --- | --- | --- | --- | --- | --- |",
    ]
    for r in rows:
        lines.append(
            f"| {r['pair']} | {r['dps_n_before']:,.0f} | {r['dps_4n']:,.0f} "
            f"| {r['dps_n_after'] if r['dps_n_after'] else '—'} "
            f"| {r['eff_adjacent']:.3f} | {r['eff_bracketed']:.3f} |"
        )
    lines += [
        "",
        f"**Median bracketed efficiency over {len(rows)} interleaved pairs: "
        f"{med_bracketed:.3f}**"
        + (" — meets the ≥0.8 criterion." if med_bracketed >= 0.8 else "")
        + f" (median adjacent: {med_adjacent:.3f})",
        "",
        "Idle checks at run start (busy cores): "
        + ", ".join(
            f"{r['pair_tag']}={r['host_idle_check'].get('busy_cores_at_start', '?')}"
            for r in n_runs + x4_runs
        ),
        "",
    ]
    out = os.path.join(REPO, "BENCH", f"PAIRS_{args.tag}.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"\nmedian bracketed eff={med_bracketed:.3f} adjacent={med_adjacent:.3f} -> {out}")


if __name__ == "__main__":
    main()
