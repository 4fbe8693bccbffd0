#!/usr/bin/env python
"""Reproduce the environmental CPU-ceiling evidence cited in BENCH/BASELINE.md:
this sandbox caps a SINGLE process at a few effective cores regardless of
thread count, while separate processes scale near-linearly. Run standalone:

  python bench/cpu_ceiling_probe.py
"""

from __future__ import annotations

import time
from concurrent.futures import ProcessPoolExecutor


def burn(n: int) -> int:
    s = 0
    for i in range(n):
        s += i * i
    return s


def main() -> None:
    n = 20_000_000
    t0 = time.perf_counter()
    burn(n)
    single = time.perf_counter() - t0
    print(f"single process: {single:.2f}s")
    for workers in (8, 16, 32):
        t0 = time.perf_counter()
        with ProcessPoolExecutor(workers) as ex:
            list(ex.map(burn, [n] * workers))
        dt = time.perf_counter() - t0
        print(
            f"{workers} procs x same work: {dt:.2f}s -> aggregate {workers * single / dt:.1f} "
            f"effective cores"
        )
    print(
        "\ncompare: pyspark local[32] pure-codegen arithmetic is no faster than "
        "local[8] (one JVM process is capped); two CONCURRENT local[8] JVMs each "
        "run at full solo speed. Hence scaling evidence uses local-cluster "
        "multi-executor processes (bench/run_scaling.py)."
    )


if __name__ == "__main__":
    main()
