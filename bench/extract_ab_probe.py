#!/usr/bin/env python
"""A/B probe: pure-regex vs locate+anchored-window extract_coords kernel.

Round 6: tile_build is ~75% of the north-star pipeline wall, and its
documented CPU hot spot is the full-text java.util.regex scan. The
hypothesis was that a literal indexOf + 32-char anchored validation
(full-regex fallback for decoy prefixes) beats the full-text regex scan.
MEASURED RESULT: 0.90x — the experiment LOST, because java.util.regex
compiles a leading literal ("geo:") into a Boyer-Moore prefix scan, so
regexp_extract already skips text at indexOf speed. The production kernel
(tiledspark/extract.py) stays pure-regex; this probe preserves the
experiment. Interleaved A,B,A,B,... in one session (shared codegen/JIT
warmup, drift taxes neither arm); the sum_lat/count assert pins parity.

Usage: python bench/extract_ab_probe.py [n_pages] [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tiledspark import synth
from tiledspark.extract import GEO_RX, extract_coords
from tiledspark.session import get_spark


def extract_coords_locate_window(pages, text_col="text"):
    """The REJECTED round-6 experiment, kept here so the negative result
    stays reproducible: literal locate + anchored 32-char validation +
    full-regex decoy fallback. Measured 0.90x (slower) at 4M rows because
    java.util.regex already compiles the leading literal "geo:" into a
    Boyer-Moore prefix scan — see tiledspark/extract.py docstring."""
    txt = F.col(text_col)
    pos = F.locate("geo:", txt)
    anchored = F.regexp_extract(F.substring(txt, pos, 32), "^" + GEO_RX, 0)
    token = F.when(pos == 0, F.lit("")).otherwise(
        F.when(anchored != F.lit(""), anchored).otherwise(
            F.regexp_extract(txt, GEO_RX, 0)
        )
    )
    parts = F.split(F.substring(token, 5, 64), ",")
    has = token != F.lit("")
    return (
        pages.withColumn("_geo_parts", F.when(has, parts))
        .withColumn("lat", F.element_at("_geo_parts", 1).try_cast("double"))
        .withColumn("lon", F.element_at("_geo_parts", 2).try_cast("double"))
        .drop("_geo_parts")
    )


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="extract-ab")
    pages = synth.pages_df(spark, n_pages).select("url", "text")

    def run(fn):
        t0 = time.perf_counter()
        # sum of extracted lats forces full evaluation of the kernel and
        # is identical across arms (a parity smoke on top of the timing)
        row = fn(pages).agg(
            F.sum("lat").alias("s"), F.count("lat").alias("c")
        ).collect()[0]
        return time.perf_counter() - t0, row["s"], row["c"]

    # shared warmup: one pass of each arm, untimed
    run(extract_coords)
    run(extract_coords_locate_window)

    arms = [("regex", extract_coords), ("fast", extract_coords_locate_window)]
    times: dict[str, list[float]] = {"regex": [], "fast": []}
    checks = set()
    for i in range(rounds):
        for name, fn in arms:
            dt, s, c = run(fn)
            times[name].append(dt)
            checks.add((round(s, 6), c))
            print(f"[{name}{i+1}] {dt:.2f}s sum_lat={s:.6f} n={c}", flush=True)
    assert len(checks) == 1, f"arms disagree: {checks}"
    import statistics

    mr, mf = statistics.median(times["regex"]), statistics.median(times["fast"])
    print(
        f"\nn_pages={n_pages} median regex={mr:.2f}s fast={mf:.2f}s "
        f"speedup={mr / mf:.2f}x (parity: sum_lat+count identical)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
