#!/usr/bin/env python
"""Two-parallelism scaling evidence (BASELINE.md protocol, driver north rule):
run the identical bench suite under local[8] and local[32] on the SAME input,
report docs/sec at both plus scaling efficiency = (thr_32 / thr_8) / 4.
Writes BENCH/BASELINE.md. Each parallelism level runs in a fresh subprocess
(one JVM cannot change master strings).

Usage: python bench/run_scaling.py [--runs 3] [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_once(master: str, sf_dir: str, pages_n: int | None = None) -> dict:
    env = dict(os.environ, SPARK_GRAFT_MASTER=master, SPARK_GRAFT_SF_DIR=sf_dir)
    if pages_n:
        env["SPARK_GRAFT_PAGES_N"] = str(pages_n)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
        cwd=REPO,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--pages-n",
        type=int,
        default=4_000_000,
        help="scaling corpus size — large enough that compute dominates the "
        "fixed job overheads a 180k-doc corpus drowns in",
    )
    args = ap.parse_args()

    results: dict[str, list[dict]] = {}
    for master in ("local[8]", "local[32]"):
        results[master] = []
        for i in range(args.runs):
            r = run_once(master, args.sf_dir, args.pages_n)
            results[master].append(r)
            print(
                f"{master} run {i + 1}/{args.runs}: total={r['value']}s "
                f"docs/s={r['docs_per_sec']}",
                flush=True,
            )

    def med(master, key):
        return statistics.median(r[key] for r in results[master])

    thr8 = med("local[8]", "docs_per_sec")
    thr32 = med("local[32]", "docs_per_sec")
    eff = thr32 / (4.0 * thr8)
    n_docs = results["local[8]"][0]["n_docs"]
    sf = results["local[8]"][0]["sf"]

    q8 = {k: statistics.median(r["queries"][k] for r in results["local[8]"]) for k in results["local[8]"][0]["queries"]}
    q32 = {k: statistics.median(r["queries"][k] for r in results["local[32]"]) for k in results["local[32]"][0]["queries"]}

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    lines = [
        "# BENCH/BASELINE.md — measured scaling evidence",
        "",
        f"Input: synthetic pages sf{sf} ({results['local[8]'][0]['n_pages']} rows, "
        f"{n_docs} deduped geocoded docs), driver tables at sf{sf}. "
        f"Identical code + input at both parallelism levels; only the master "
        f"string differs (driver two-cluster-size rule, SURVEY.md §6).",
        f"Runs per level: {args.runs}; medians reported.",
        "",
        "| metric | local[8] | local[32] |",
        "| --- | --- | --- |",
        f"| headline suite total (s) | {med('local[8]', 'value')} | {med('local[32]', 'value')} |",
        f"| docs/sec tiled+joined | {thr8} | {thr32} |",
        "",
        f"**Scaling efficiency (N→4N cores): {eff:.3f}** "
        f"(target ≥ 0.8 per BASELINE.json).",
        "",
        "## Per-query medians (seconds)",
        "",
        "| query | local[8] | local[32] | speedup |",
        "| --- | --- | --- | --- |",
    ]
    for k in q8:
        sp = q8[k] / q32[k] if q32[k] else float("nan")
        lines.append(f"| {k} | {q8[k]:.3f} | {q32[k]:.3f} | {sp:.2f}x |")
    lines += [
        "",
        "Raw runs:",
        "```json",
        json.dumps(results, indent=1),
        "```",
        "",
    ]
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    with open(path, "w") as f:
        f.write("\n".join(lines))
    print(f"\nefficiency={eff:.3f}  -> {path}")


if __name__ == "__main__":
    main()
