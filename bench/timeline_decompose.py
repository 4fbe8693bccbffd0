#!/usr/bin/env python
"""Attribute 4N under-utilization to stages via the Spark event log.

Scaling sessions 5-6 measured 4N CPU utilization of 0.68-0.80 of 28 cores
at intact per-busy-core parity — cores idle waiting — but /proc/stat
aggregates cannot say WHERE the idling happens: inside stages that launch
fewer tasks than the 24 slots, in the tails of skewed stages, or between
jobs (driver-side planning/collect). The event log can: every task carries
launch/finish timestamps, so integrating "running tasks" over time yields
per-stage average concurrency and the exact seconds with zero running
tasks (pure driver/barrier time).

Usage:
  1. One instrumented pipeline run (NOT for the timed record — event
     logging adds driver-side work):
       mkdir -p /tmp/spark-events
       SPARK_GRAFT_MASTER='local-cluster[4,6,8192]' SPARK_GRAFT_SRC=expr \
       SPARK_GRAFT_PAGES_N=40000000 SPARK_GRAFT_PIN=1 \
       SPARK_GRAFT_PIPELINE_ONLY=1 SPARK_GRAFT_SHUFFLE=96 \
       SPARK_GRAFT_ADVISORY=16m \
       SPARK_GRAFT_EXTRA_CONF='spark.eventLog.enabled=true;spark.eventLog.dir=file:/tmp/spark-events' \
       python bench.py
  2. python bench/timeline_decompose.py /tmp/spark-events/<app-id> [--slots 24]

Prints a per-stage table (wall span, task-seconds, avg concurrency,
slot-fill ratio) plus the app-level attribution: % of wall at full fill,
% in under-filled stage spans, % with zero running tasks.
"""

from __future__ import annotations

import argparse
import json
import sys
from collections import defaultdict


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("log", help="event-log file OR the eventlog_v2_<app> rolling "
                    "directory Spark 4 writes (events_* parts, .zstd handled "
                    "via pyarrow)")
    ap.add_argument("--slots", type=int, default=24,
                    help="total task slots (4 executors x 6 cores = 24)")
    ap.add_argument("--top", type=int, default=12, help="stages to print")
    ap.add_argument("--gaps", type=int, default=0,
                    help="also print the K largest zero-running gaps with "
                    "the stages that bound them (attributes driver time)")
    ap.add_argument("--from-sec", type=float, default=None,
                    help="restrict the attribution to [from,to) seconds "
                    "from app start (e.g. the timed pipeline window, "
                    "excluding session startup + warmup)")
    ap.add_argument("--to-sec", type=float, default=None)
    args = ap.parse_args()

    # (start_ms, end_ms) per task, grouped by stage; stage names
    # Spark 4 rolling event logs are a DIRECTORY of events_N_<app>[.codec]
    # parts; single-file logs may also carry a compression suffix.
    def _iter_lines(path):
        import os as _os
        if _os.path.isdir(path):
            parts = sorted(
                _os.path.join(path, p) for p in _os.listdir(path)
                if p.startswith("events_")
            )
        else:
            parts = [path]
        for part in parts:
            if part.endswith(".zstd"):
                import subprocess
                out = subprocess.run(["zstd", "-dc", part],
                                     capture_output=True, check=True).stdout
                yield from out.decode("utf-8", "replace").splitlines()
            elif part.endswith(".gz"):
                import gzip
                with gzip.open(part, "rt", errors="replace") as fh:
                    yield from fh
            else:
                with open(part) as fh:
                    yield from fh

    tasks: dict[tuple[int, int], list[tuple[int, int]]] = defaultdict(list)
    stage_name: dict[tuple[int, int], str] = {}
    app_start = None
    app_end = None
    if True:
        for line in _iter_lines(args.log):
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            et = ev.get("Event")
            if et == "SparkListenerApplicationStart":
                app_start = ev["Timestamp"]
            elif et == "SparkListenerApplicationEnd":
                app_end = ev["Timestamp"]
            elif et == "SparkListenerStageSubmitted":
                si = ev["Stage Info"]
                stage_name[(si["Stage ID"], si["Stage Attempt ID"])] = \
                    si.get("Stage Name", "?")
            elif et == "SparkListenerTaskEnd":
                ti = ev.get("Task Info", {})
                if ti.get("Launch Time") and ti.get("Finish Time"):
                    key = (ev["Stage ID"], ev["Stage Attempt ID"])
                    tasks[key].append((ti["Launch Time"], ti["Finish Time"]))

    if not tasks:
        sys.exit("no TaskEnd events found — is this a completed event log?")
    t0 = app_start or min(s for v in tasks.values() for s, _ in v)
    t1 = app_end or max(e for v in tasks.values() for _, e in v)
    if args.from_sec is not None or args.to_sec is not None:
        w0 = t0 + int((args.from_sec or 0.0) * 1000)
        w1 = t0 + int(args.to_sec * 1000) if args.to_sec is not None else t1
        # clamp every task interval to the window; drop stages that fall
        # entirely outside it
        clamped: dict[tuple[int, int], list[tuple[int, int]]] = defaultdict(list)
        for k, v in tasks.items():
            for s, e in v:
                s2, e2 = max(s, w0), min(e, w1)
                if s2 < e2:
                    clamped[k].append((s2, e2))
        tasks = clamped
        t0, t1 = w0, w1
        print(f"window [{(w0 - (app_start or w0))/1e3:.1f}s, "
              f"{(w1 - (app_start or w0))/1e3:.1f}s] from app start")

    # global running-task curve via event sweep (ms resolution is overkill;
    # sweep the exact breakpoints instead of bucketing)
    deltas: dict[int, int] = defaultdict(int)
    for v in tasks.values():
        for s, e in v:
            deltas[s] += 1
            deltas[e] -= 1
    points = sorted(deltas)
    zero_ms = 0
    full_ms = 0
    partial_ms = 0
    weighted_conc = 0.0
    running = 0
    prev = t0
    zero_gaps: list[tuple[int, int, int]] = []  # (span, start, end)
    for p in points + [t1]:
        span = max(0, p - prev)
        if running == 0:
            zero_ms += span
            if span > 0:
                zero_gaps.append((span, prev, p))
        elif running >= args.slots:
            full_ms += span
        else:
            partial_ms += span
        weighted_conc += running * span
        running += deltas.get(p, 0)
        prev = p
    wall_ms = t1 - t0

    rows = []
    for key, v in tasks.items():
        span_s = min(s for s, _ in v)
        span_e = max(e for _, e in v)
        task_ms = sum(e - s for s, e in v)
        conc = task_ms / max(1, span_e - span_s)
        rows.append((key, len(v), (span_e - span_s) / 1e3, task_ms / 1e3,
                     conc, conc / args.slots, stage_name.get(key, "?")))
    rows.sort(key=lambda r: -r[2])

    print(f"app wall {wall_ms/1e3:.1f}s  slots={args.slots}")
    print(f"  zero-running (driver/barrier): {zero_ms/1e3:.1f}s "
          f"({100*zero_ms/wall_ms:.1f}%)")
    print(f"  full-fill (>= slots running):  {full_ms/1e3:.1f}s "
          f"({100*full_ms/wall_ms:.1f}%)")
    print(f"  partial-fill:                  {partial_ms/1e3:.1f}s "
          f"({100*partial_ms/wall_ms:.1f}%)")
    print(f"  time-avg concurrency: {weighted_conc/wall_ms:.1f} "
          f"({100*weighted_conc/wall_ms/args.slots:.1f}% of slots)")
    print()
    print(f"{'stage':>10} {'tasks':>6} {'span s':>8} {'task-s':>9} "
          f"{'avg conc':>9} {'fill':>6}  name")
    for (sid, att), n, span, task_s, conc, fill, name in rows[: args.top]:
        print(f"{sid:>8}.{att} {n:>6} {span:>8.1f} {task_s:>9.1f} "
              f"{conc:>9.1f} {fill:>6.2f}  {name[:60]}")

    if args.gaps:
        # bound each gap by the stage whose last task ends at its start and
        # the stage whose first task launches at its end
        end_stage = {max(e for _, e in v): k for k, v in tasks.items()}
        start_stage = {min(s for s, _ in v): k for k, v in tasks.items()}
        print(f"\ntop {args.gaps} zero-running gaps (driver-only time):")
        for span, s, e in sorted(zero_gaps, reverse=True)[: args.gaps]:
            before = end_stage.get(s)
            after = start_stage.get(e)
            print(f"  {span/1e3:>7.2f}s at t+{(s - t0)/1e3:>7.1f}s  "
                  f"after stage {before[0] if before else '?'} "
                  f"-> before stage {after[0] if after else '?'}")


if __name__ == "__main__":
    main()
