"""Regenerate BENCH/BANKED.jsonl — the machine-readable banked-bench record
(VERDICT r7 #6): one row per idle-verified banked suite run, so
round-over-round comparisons read a file instead of BASELINE.md prose.

Run from the repo root after banking a run:
    python bench/update_banked.py
A "banked run" is any bench.py output saved as BENCH/bench_r<N>_idle_*.json
(the convention since round 5); the official driver BENCH_r<N>.json artifacts
are intentionally NOT included — they land on whatever host state the driver
finds (see BASELINE.md's busy-host annotations) and are kept separately.
"""

from __future__ import annotations

import glob
import json
import os

BENCH_DIR = os.path.join(os.path.dirname(__file__), "..", "BENCH")


def main() -> None:
    rows = []
    for f in sorted(glob.glob(os.path.join(BENCH_DIR, "bench_r[0-9]*_idle_*.json"))):
        d = json.load(open(f))
        name = os.path.basename(f)
        rows.append(
            {
                "round": int(name.split("_r")[1].split("_")[0]),
                "file": name,
                "wall_sec": d["value"],
                "docs_per_sec": d.get("docs_per_sec"),
                "idle": d.get("host_idle_check", {}).get("idle"),
                "busy_cores_at_start": d.get("host_idle_check", {}).get(
                    "busy_cores_at_start"
                ),
                "cpu_calibration_sec": d.get("cpu_calibration_sec"),
                "sf": d.get("sf"),
                "queries": d.get("queries"),
                "tree_golden_match_rate": d.get("tree_golden_match_rate"),
            }
        )
    rows.sort(key=lambda r: (r["round"], r["file"]))
    out_path = os.path.join(BENCH_DIR, "BANKED.jsonl")
    with open(out_path, "w") as out:
        for r in rows:
            out.write(json.dumps(r) + "\n")
    print(f"{len(rows)} rows -> {out_path}")


if __name__ == "__main__":
    main()
