"""Synthetic pages/zones generator: schema, determinism, FIXTURES.md grammar."""

from __future__ import annotations

import re

import pyarrow as pa

from tiledspark import synth

GEO_RX = re.compile(r"geo:(-?\d{1,2}\.\d{6}),(-?\d{1,3}\.\d{6})")


def test_pages_schema_and_grammar():
    t = synth.gen_pages_table(3000)
    assert t.schema.equals(synth.PAGES_SCHEMA)
    assert t.num_rows == 3000
    urls = t.column("url").to_pylist()
    assert len(set(urls)) == 1000  # ~3 crawls per url
    texts = t.column("text").to_pylist()
    with_geo = sum(1 for x in texts if GEO_RX.search(x))
    assert 0.85 <= with_geo / len(set(urls)) / 3 <= 0.95  # ~90% of urls carry a token
    # text identical across crawls of the same url (invariant basis)
    by_url = {}
    for u, x in zip(urls, texts):
        assert by_url.setdefault(u, x) == x
    # lat in [-90,90] 6dp, lon in [-180,180] 6dp
    for x in texts[:200]:
        m = GEO_RX.search(x)
        if m:
            lat, lon = float(m.group(1)), float(m.group(2))
            assert -90 <= lat <= 90 and -180 <= lon <= 180


def test_pages_deterministic():
    a = synth.gen_pages_table(500)
    b = synth.gen_pages_table(500)
    assert a.equals(b)


def test_zones_schema():
    z = synth.gen_zones_table()
    assert z.schema.equals(synth.ZONES_SCHEMA)
    assert z.num_rows == 113
    names = z.column("name").to_pylist()
    assert "donut_zone" in names and "greenwich_zone" in names and "sliver_zone" in names
    # rings closed
    rings = z.column("ring").to_pylist()
    for r in rings:
        assert r[0] == r[-1] and len(r) >= 5
    # donut has a hole
    holes = z.column("holes").to_pylist()
    assert any(len(h) > 0 for h in holes)


def test_pages_df_partition_knob_is_scheduling_only(spark):
    """num_partitions (the wave-count knob, SPARK_GRAFT_RANGE_PARTS) must
    never change the generated rows — content is a pure function of row id.
    Guards the scaling/waves A/B's 'identical data in both arms' claim."""
    base = synth.pages_df(spark, 2000)
    parted = synth.pages_df(spark, 2000, num_partitions=7)
    assert parted.rdd.getNumPartitions() == 7
    cols = ["url", "warc_ts", "text", "lang"]
    a = sorted(map(tuple, base.select(*cols).collect()))
    b = sorted(map(tuple, parted.select(*cols).collect()))
    assert a == b
