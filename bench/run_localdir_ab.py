#!/usr/bin/env python
"""Shuffle local-dir A/B at the 4N scaling point: shared virtual disk vs tmpfs.

Motivation: scaling sessions 5 and 6 decomposed their sub-0.8 efficiency to
4N UNDER-UTILIZATION at intact (s6: above-1.0) per-busy-core parity — cores
idle waiting, the signature of I/O/scheduling stalls on the quadrupled
process count. The shared I/O resource all four executors contend on is
spark.local.dir (default /tmp on one virtual disk): every shuffle write,
spill, and broadcast block from 24 task slots funnels through one block
device, while the N baseline's 6 slots see a quarter of that queue depth —
an asymmetry a real cluster does not have (per-executor NVMe). The host has
126 GB of unused tmpfs at /dev/shm; pointing SPARK_LOCAL_DIRS there removes
the block device from the shuffle path entirely. The flip side is that
tmpfs pages consume the SAME memory bandwidth the session-4 regime starved
on — so this is an empirical question, not a foregone win, exactly like
the zstd codec A/B (which lost: BENCH/CODEC_AB_r6codec.md).

Protocol: identical to run_codec_ab.py — 4N-only (local-cluster[4,6,8192]
@ 40M pages, pipeline-only, fair-share pinned), strict interleave
disk, tmpfs, disk, tmpfs, ... so within-session drift taxes neither arm.
The tmpfs arm sets BOTH the env (SPARK_LOCAL_DIRS — what standalone
workers actually read) and the conf (spark.local.dir — what local[] mode
reads), and the harness wipes the tmpfs dir between runs so no arm
inherits page-cache warmth or leftover blocks.

Decision boundary for a real cluster: if tmpfs wins here, the lesson is
"shuffle dirs must not share a device across co-located executors" —
provision per-executor local SSD/NVMe (or RAM-disk for small shuffles); if
it loses or is flat, the stall is kernel-scheduler/not-disk and the lz4
conclusion stands.

Writes BENCH/LOCALDIR_AB_<tag>.md + raw runs to BENCH/runs_<tag>.jsonl.

Usage: python bench/run_localdir_ab.py [--pairs 3] [--tag r6localdir]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "bench"))
from run_scaling import run_once  # noqa: E402

TMPFS_DIR = "/dev/shm/tiledspark-local"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--pages", type=int, default=40_000_000)
    ap.add_argument("--master", default="local-cluster[4,6,8192]")
    ap.add_argument("--tag", default="r6localdir")
    args = ap.parse_args()

    base_env = {
        "SPARK_GRAFT_PIN": "1",
        "SPARK_GRAFT_PIPELINE_ONLY": "1",
        "SPARK_GRAFT_SHUFFLE": "96",
        "SPARK_GRAFT_ADVISORY": "16m",
    }
    arms = [
        ("disk", {}),  # Spark default /tmp — byte-identical to the scaling runs
        ("tmpfs", {
            "SPARK_LOCAL_DIRS": TMPFS_DIR,
            "SPARK_GRAFT_EXTRA_CONF": f"spark.local.dir={TMPFS_DIR}",
        }),
    ]

    raw_path = os.path.join(REPO, "BENCH", f"runs_{args.tag}.jsonl")
    # Resume: runs already banked in the jsonl (from an interrupted session)
    # count as done; only the missing (pair, arm) slots are executed, in
    # protocol order, so an interleave interrupted mid-pair stays strict.
    results: list[dict] = []
    if os.path.exists(raw_path):
        with open(raw_path) as f:
            results = [json.loads(line) for line in f if line.strip()]
        if results:
            print(f"resuming: {len(results)} banked runs in {raw_path}")
    done = {(r["local_dir"], r["ab_index"]) for r in results}
    for i in range(args.pairs):
        for name, extra in arms:
            if (name, i + 1) in done:
                continue
            shutil.rmtree(TMPFS_DIR, ignore_errors=True)
            os.makedirs(TMPFS_DIR, exist_ok=True)
            r = run_once(args.master, args.sf_dir, args.pages, "expr",
                         extra_env={**base_env, **extra})
            r["local_dir"] = name
            r["ab_index"] = i + 1
            results.append(r)
            with open(raw_path, "a") as f:
                f.write(json.dumps(r) + "\n")
            print(f"[{name}{i+1}] docs/s={r['docs_per_sec']:,.1f} "
                  f"pipeline={r['value']:.1f}s "
                  f"busy_cores_at_start={r['host_idle_check']['busy_cores_at_start']}"
                  f" cal={r['cpu_calibration_sec']}",
                  flush=True)
    shutil.rmtree(TMPFS_DIR, ignore_errors=True)

    by = {name: [r for r in results if r["local_dir"] == name] for name, _ in arms}
    med = {name: statistics.median(r["docs_per_sec"] for r in rs)
           for name, rs in by.items()}
    ratios = [by["tmpfs"][i]["docs_per_sec"] / by["disk"][i]["docs_per_sec"]
              for i in range(args.pairs)]

    lines = [
        f"# BENCH/LOCALDIR_AB_{args.tag}.md — shuffle local-dir A/B at 4N (disk vs tmpfs)",
        "",
        f"{args.master} @ {args.pages:,} pages, pipeline-only, fair-share "
        "pinned, shuffle=96, advisory=16m. Strict interleave disk, tmpfs, ... "
        "(same drift logic as the scaling-pairs protocol); tmpfs dir wiped "
        "between runs.",
        "",
        "| pair | disk docs/s | tmpfs docs/s | tmpfs/disk |",
        "| --- | --- | --- | --- |",
    ]
    for i in range(args.pairs):
        lines.append(
            f"| {i+1} | {by['disk'][i]['docs_per_sec']:,.0f} "
            f"| {by['tmpfs'][i]['docs_per_sec']:,.0f} | {ratios[i]:.3f} |")
    lines += [
        "",
        f"**Median docs/s: disk {med['disk']:,.0f}, tmpfs {med['tmpfs']:,.0f}; "
        f"median adjacent ratio {statistics.median(ratios):.3f}**",
        "",
        "Idle checks (busy cores at start): " + ", ".join(
            f"{r['local_dir']}{r['ab_index']}={r['host_idle_check']['busy_cores_at_start']}"
            for r in results),
    ]
    out = os.path.join(REPO, "BENCH", f"LOCALDIR_AB_{args.tag}.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"\nmedian ratio tmpfs/disk = {statistics.median(ratios):.3f} -> {out}")


if __name__ == "__main__":
    main()
