"""Deterministic synthetic data — `pages` (Common-Crawl-style) and `zones`.

Implements FIXTURES.md §2/§3 exactly (seeds 42/43, geo-token grammar,
Zipf-clustered hot tiles per SURVEY.md risk R4). No external data: every
byte derives from numpy default_rng with pinned seeds, so the same (n, seed)
always produces byte-identical parquet content regardless of parallelism.

Input shape is binding (BASELINE.json input_hint):
    pages(url: string, warc_ts: timestamp, html: binary, text: string, lang: string)

One deliberate clarification vs FIXTURES.md §2 as first drafted: the url
grammar is `https://site{uid % 1000}.example/p/{uid}` with
`uid = i % (n // 3 or 1)`, so the table has ~n/3 distinct urls with ~3 crawl
rows each (dedupe_latest_by_url has real work). `text` and coordinates are a
function of `uid` (a url never changes text or moves between crawls), which
makes the per-url byte-identical-text invariant checkable end-to-end.
"""

from __future__ import annotations

import math
import os
from datetime import datetime, timezone

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED_PAGES = 42
SEED_ZONES = 43
N_CLUSTERS = 20
CLUSTER_SIGMA = 0.05  # degrees
ZIPF_S = 1.2
GEO_TOKEN_FRACTION = 0.9

PAGES_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ]
)

_LATLON = pa.struct([pa.field("lat", pa.float64()), pa.field("lon", pa.float64())])
ZONES_SCHEMA = pa.schema(
    [
        pa.field("zone_id", pa.int64()),
        pa.field("name", pa.string()),
        pa.field("ring", pa.list_(_LATLON)),
        pa.field("holes", pa.list_(pa.list_(_LATLON))),
    ]
)

_EPOCH_2025 = int(datetime(2025, 1, 1, tzinfo=timezone.utc).timestamp())


def _vocab(size: int = 512) -> list[str]:
    rng = np.random.default_rng(7)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    out = []
    seen = set()
    while len(out) < size:
        ln = int(rng.integers(3, 10))
        w = "".join(rng.choice(letters, size=ln))
        if w not in seen:
            seen.add(w)
            out.append(w)
    return out


def city_centers(rng: np.random.Generator | None = None) -> np.ndarray:
    """20 seeded cluster centers (lat, lon); shared by pages and zones."""
    r = rng or np.random.default_rng(SEED_PAGES + 1000)
    lat = r.uniform(-55.0, 65.0, N_CLUSTERS)
    lon = r.uniform(-175.0, 175.0, N_CLUSTERS)
    return np.stack([lat, lon], axis=1)


def _zipf_weights(k: int, s: float = ZIPF_S) -> np.ndarray:
    w = 1.0 / np.arange(1, k + 1) ** s
    return w / w.sum()


def gen_pages_table(n: int, seed: int = SEED_PAGES) -> pa.Table:
    """Deterministic pages table: ~n/3 distinct urls, 90% with one geo token,
    coordinates Zipf-clustered around 20 city centers (hot tiles)."""
    rng = np.random.default_rng(seed)
    n_urls = max(n // 3, 1)
    uid = np.arange(n, dtype=np.int64) % n_urls

    # --- per-uid deterministic attributes -----------------------------------
    urng = np.random.default_rng(seed + 1)
    # coordinates: 80% clustered (Zipf over 20 centers), 20% uniform
    centers = city_centers()
    is_clustered = urng.random(n_urls) < 0.8
    cluster_idx = urng.choice(N_CLUSTERS, size=n_urls, p=_zipf_weights(N_CLUSTERS))
    lat = np.where(
        is_clustered,
        centers[cluster_idx, 0] + urng.normal(0.0, CLUSTER_SIGMA, n_urls),
        urng.uniform(-60.0, 70.0, n_urls),
    )
    lon = np.where(
        is_clustered,
        centers[cluster_idx, 1] + urng.normal(0.0, CLUSTER_SIGMA, n_urls),
        urng.uniform(-180.0, 180.0, n_urls),
    )
    lat = np.clip(lat, -84.0, 84.0)
    lon = np.mod(lon + 180.0, 360.0) - 180.0
    has_geo = urng.random(n_urls) < GEO_TOKEN_FRACTION

    vocab = np.array(_vocab())
    n_words = urng.integers(20, 81, n_urls)
    langs = np.array(["en", "de", "fr", "nl", "es"])
    lang_per_uid = urng.choice(langs, size=n_urls, p=_zipf_weights(5))

    texts: list[str] = []
    for u in range(n_urls):
        k = int(n_words[u])
        words = list(vocab[urng.integers(0, len(vocab), k)])
        if has_geo[u]:
            token = f"geo:{lat[u]:.6f},{lon[u]:.6f}"
            pos = int(urng.integers(0, k + 1))
            words.insert(pos, token)
        texts.append(" ".join(words))
    texts_arr = np.array(texts, dtype=object)

    # --- per-row assembly -----------------------------------------------------
    url = np.array(
        [f"https://site{int(u) % 1000}.example/p/{int(u)}" for u in uid], dtype=object
    )
    warc_ts = (_EPOCH_2025 + np.arange(n, dtype=np.int64) * 137) * 1_000_000  # us
    text = texts_arr[uid]
    html = np.array(
        [f"<html><body>{t}</body></html>".encode("utf-8") for t in text], dtype=object
    )
    lang = lang_per_uid[uid]

    return pa.table(
        {
            "url": pa.array(url, pa.string()),
            "warc_ts": pa.array(warc_ts, pa.timestamp("us")),
            "html": pa.array(list(html), pa.binary()),
            "text": pa.array(text, pa.string()),
            "lang": pa.array(lang, pa.string()),
        },
        schema=PAGES_SCHEMA,
    )


def _polygon(center_lat, center_lon, radius, n_vertices, rng) -> list[dict]:
    """Convex-ish closed CCW ring around a center (first == last vertex)."""
    angles = np.sort(rng.uniform(0.0, 2.0 * np.pi, n_vertices))
    radii = radius * rng.uniform(0.6, 1.0, n_vertices)
    lats = center_lat + radii * np.sin(angles)
    lons = center_lon + radii * np.cos(angles)
    ring = [{"lat": float(a), "lon": float(o)} for a, o in zip(lats, lons)]
    ring.append(ring[0])
    return ring


def gen_zones_table(seed: int = SEED_ZONES) -> pa.Table:
    """113 polygons per FIXTURES.md §3: 100 city polygons, 10 spanning, 3 pathological."""
    rng = np.random.default_rng(seed)
    centers = city_centers()
    zone_ids, names, rings, holes_col = [], [], [], []

    def add(name, ring, holes=None):
        zone_ids.append(len(zone_ids))
        names.append(name)
        rings.append(ring)
        holes_col.append(holes or [])

    for i in range(100):
        c = centers[i % N_CLUSTERS]
        add(
            f"city_zone_{i}",
            _polygon(
                c[0] + rng.normal(0, 0.3),
                c[1] + rng.normal(0, 0.3),
                rng.uniform(0.1, 3.0),
                int(rng.integers(8, 25)),
                rng,
            ),
        )
    for i in range(10):
        add(
            f"span_zone_{i}",
            _polygon(
                rng.uniform(-40, 50), rng.uniform(-150, 150), rng.uniform(5.0, 15.0),
                int(rng.integers(12, 25)), rng,
            ),
        )
    # pathological 1: polygon with a hole (donut)
    outer = _polygon(10.0, 10.0, 4.0, 16, rng)
    inner = _polygon(10.0, 10.0, 1.5, 12, rng)
    add("donut_zone", outer, [inner])
    # pathological 2: crosses lon=0
    add("greenwich_zone", _polygon(48.0, 0.0, 3.0, 14, rng))
    # pathological 3: sliver (aspect ratio > 100)
    lats = np.linspace(-0.02, 0.02, 4)
    lons = np.linspace(-30.0, 30.0, 4)
    sliver = (
        [{"lat": float(a), "lon": float(o)} for a, o in zip(lats, lons)]
        + [{"lat": float(a) + 0.04, "lon": float(o)} for a, o in zip(lats[::-1], lons[::-1])]
    )
    sliver.append(sliver[0])
    add("sliver_zone", sliver)

    return pa.table(
        {
            "zone_id": pa.array(zone_ids, pa.int64()),
            "name": pa.array(names, pa.string()),
            "ring": pa.array(rings, pa.list_(_LATLON)),
            "holes": pa.array(holes_col, pa.list_(pa.list_(_LATLON))),
        },
        schema=ZONES_SCHEMA,
    )


def ensure_pages(out_dir: str, n: int, seed: int = SEED_PAGES) -> str:
    """Idempotent cached write of pages parquet; returns the file path."""
    path = os.path.join(out_dir, f"pages_n{n}_s{seed}.parquet")
    if not os.path.exists(path):
        os.makedirs(out_dir, exist_ok=True)
        tmp = path + ".tmp"
        pq.write_table(gen_pages_table(n, seed), tmp, row_group_size=65536)
        os.replace(tmp, path)
    return path


def ensure_zones(out_dir: str, seed: int = SEED_ZONES) -> str:
    path = os.path.join(out_dir, f"zones_s{seed}.parquet")
    if not os.path.exists(path):
        os.makedirs(out_dir, exist_ok=True)
        tmp = path + ".tmp"
        pq.write_table(gen_zones_table(seed), tmp)
        os.replace(tmp, path)
    return path


# scale-factor → row count (FIXTURES.md §2)
PAGES_ROWS = {"0.001": 5_000, "0.01": 50_000, "0.1": 600_000}


def pages_rows_for_sf_dir(sf_dir: str) -> int:
    base = os.path.basename(sf_dir.rstrip("/"))
    sf = base.replace("sf", "") if base.startswith("sf") else "0.01"
    return PAGES_ROWS.get(sf, 50_000)


def gen_diff_batch(base_n: int, batch_idx: int, rows: int = 500) -> pa.Table:
    """FIXTURES.md §5: deterministic OsmChange-style delta batches over the
    pages corpus — upserts that MOVE existing urls (new geo token → new tile),
    brand-new urls, and deletes. Schema = pages + op:string."""
    rng = np.random.default_rng(SEED_PAGES + 9000 + batch_idx)
    n_urls = max(base_n // 3, 1)
    centers = city_centers()

    n_del = rows // 5
    n_new = rows // 5
    n_move = rows - n_del - n_new

    moved_uids = rng.choice(n_urls, n_move, replace=False)
    del_uids = rng.choice(n_urls, n_del, replace=False)
    new_uids = n_urls + batch_idx * n_new + np.arange(n_new)

    vocab = np.array(_vocab())
    out_url, out_ts, out_html, out_text, out_lang, out_op = [], [], [], [], [], []
    base_ts = _EPOCH_2025 + (base_n + batch_idx * 1_000_000) * 137

    def _mk_text(u, lat, lon):
        k = int(rng.integers(20, 81))
        words = list(vocab[rng.integers(0, len(vocab), k)])
        words.insert(int(rng.integers(0, k + 1)), f"geo:{lat:.6f},{lon:.6f}")
        return " ".join(words)

    for i, u in enumerate(np.concatenate([moved_uids, new_uids])):
        ci = int(rng.integers(0, N_CLUSTERS))
        lat = float(np.clip(centers[ci, 0] + rng.normal(0, CLUSTER_SIGMA), -84, 84))
        lon = float(np.mod(centers[ci, 1] + rng.normal(0, CLUSTER_SIGMA) + 180, 360) - 180)
        text = _mk_text(int(u), lat, lon)
        out_url.append(f"https://site{int(u) % 1000}.example/p/{int(u)}")
        out_ts.append((base_ts + i * 137) * 1_000_000)
        out_html.append(f"<html><body>{text}</body></html>".encode())
        out_text.append(text)
        out_lang.append("en")
        out_op.append("upsert")
    for j, u in enumerate(del_uids):
        out_url.append(f"https://site{int(u) % 1000}.example/p/{int(u)}")
        out_ts.append((base_ts + (n_move + n_new + j) * 137) * 1_000_000)
        out_html.append(b"")
        out_text.append("")
        out_lang.append("en")
        out_op.append("delete")

    schema = PAGES_SCHEMA.append(pa.field("op", pa.string()))
    return pa.table(
        {
            "url": pa.array(out_url, pa.string()),
            "warc_ts": pa.array(out_ts, pa.timestamp("us")),
            "html": pa.array(out_html, pa.binary()),
            "text": pa.array(out_text, pa.string()),
            "lang": pa.array(out_lang, pa.string()),
            "op": pa.array(out_op, pa.string()),
        },
        schema=schema,
    )


def ensure_diff_batches(
    out_dir: str, base_n: int, n_batches: int = 5, rows: int = 500
) -> list[str]:
    """One parquet FILE per batch under diffs/ (file-per-trigger streaming source)."""
    paths = []
    d = os.path.join(out_dir, f"diffs_n{base_n}_r{rows}")
    os.makedirs(d, exist_ok=True)
    for b in range(n_batches):
        p = os.path.join(d, f"batch_{b:04d}.parquet")
        if not os.path.exists(p):
            tmp = p + ".tmp"
            pq.write_table(gen_diff_batch(base_n, b, rows), tmp)
            os.replace(tmp, p)
        paths.append(p)
    return paths


# --- in-executor generator (scaling corpora) ------------------------------------

def pages_df(spark, n: int, seed: int = SEED_PAGES, num_partitions: int | None = None):
    """Deterministic pages DataFrame generated IN EXECUTORS with pure Column
    exprs — no driver materialization, no parquet, no shared-disk scan.

    Purpose: SCALING corpora beyond what the numpy generator can build (the
    driver-side text loop is O(n) single-threaded Python — minutes at 16M
    rows, while this generates wherever the executors are and scales with
    them). Distribution parity with gen_pages_table (same vocab, same Zipf
    cluster mix, same geo-token grammar, ~n/3 distinct urls × 3 crawls), NOT
    byte parity: correctness goldens stay pinned to the numpy FIXTURES
    corpus; this one feeds throughput/scaling benchmarks only, where the only
    requirement is "identical input at both cluster sizes", guaranteed by
    seed-pinned hash exprs.
    """
    from pyspark.sql import functions as F

    n_urls = max(n // 3, 1)
    vocab = F.array(*[F.lit(w) for w in _vocab()])
    centers = city_centers()
    zw = _zipf_weights(N_CLUSTERS)
    cum = zw.cumsum()[:-1]  # 19 boundaries
    cum_arr = F.array(*[F.lit(float(c)) for c in cum])
    clat = F.array(*[F.lit(float(v)) for v in centers[:, 0]])
    clon = F.array(*[F.lit(float(v)) for v in centers[:, 1]])

    def h(tag):
        return F.xxhash64(
            F.concat(F.lit(f"s{seed}_{tag}_"), F.col("_uid").cast("string"))
        )

    def u01(tag):
        return (F.pmod(h(tag), F.lit(1_000_000)).cast("double")) / 1e6

    # num_partitions controls the WAVE COUNT of the generate+extract map
    # stage (spark.range defaults to defaultParallelism = one task per slot,
    # a single wave whose stragglers idle every other slot for the tail).
    # Row content depends only on `id`, so partitioning never changes the
    # data — it is purely a scheduling knob.
    if num_partitions is not None:
        rng = spark.range(0, n, 1, num_partitions)
    else:
        rng = spark.range(n)
    df = rng.withColumn("_uid", F.pmod(F.col("id"), F.lit(n_urls)))

    # Zipf cluster index via inverse CDF: count boundaries <= u
    u_c = u01("cluster")
    cidx = F.size(F.filter(cum_arr, lambda c: c <= u_c)) + F.lit(1)  # 1-based
    # Box-Muller jitter (distribution parity with numpy normal(0, sigma))
    bm = F.sqrt(F.lit(-2.0) * F.log(u01("bm1") + F.lit(1e-9)))
    jlat = bm * F.cos(F.lit(2.0 * math.pi) * u01("bm2")) * F.lit(CLUSTER_SIGMA)
    jlon = bm * F.sin(F.lit(2.0 * math.pi) * u01("bm2")) * F.lit(CLUSTER_SIGMA)
    is_clustered = u01("isc") < F.lit(0.8)
    lat = F.when(
        is_clustered, F.element_at(clat, cidx) + jlat
    ).otherwise(u01("ulat") * F.lit(130.0) - F.lit(60.0))
    lon = F.when(
        is_clustered, F.element_at(clon, cidx) + jlon
    ).otherwise(u01("ulon") * F.lit(360.0) - F.lit(180.0))
    lat = F.least(F.greatest(lat, F.lit(-84.0)), F.lit(84.0))
    lon = F.pmod(lon + F.lit(180.0), F.lit(360.0)) - F.lit(180.0)

    n_words = (F.pmod(h("nw"), F.lit(61)) + F.lit(20)).cast("int")
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda i: F.element_at(
            vocab,
            (
                F.pmod(
                    F.xxhash64(F.concat(F.col("_uid").cast("string"), F.lit("_w_"), i.cast("string"))),
                    F.lit(512),
                )
                + F.lit(1)
            ).cast("int"),
        ),
    )
    has_geo = u01("geo") < F.lit(GEO_TOKEN_FRACTION)
    token = F.format_string("geo:%.6f,%.6f", lat, lon)
    pos = F.pmod(h("pos"), n_words.cast("long") + F.lit(1)).cast("int")
    with_token = F.concat(
        F.slice(words, 1, pos),
        F.array(token),
        F.slice(words, pos + F.lit(1), n_words - pos),
    )
    text = F.array_join(F.when(has_geo, with_token).otherwise(words), " ")

    langs = F.array(*[F.lit(x) for x in ["en", "de", "fr", "nl", "es"]])
    lzw = _zipf_weights(5).cumsum()[:-1]
    lcum = F.array(*[F.lit(float(v)) for v in lzw])
    u_l = u01("lang")
    lang = F.element_at(langs, F.size(F.filter(lcum, lambda c: c <= u_l)) + F.lit(1))

    return df.select(
        F.concat(
            F.lit("https://site"),
            F.pmod(F.col("_uid"), F.lit(1000)).cast("string"),
            F.lit(".example/p/"),
            F.col("_uid").cast("string"),
        ).alias("url"),
        F.timestamp_seconds(F.lit(_EPOCH_2025) + F.col("id") * F.lit(137)).alias("warc_ts"),
        F.encode(F.lit("<html/>"), "utf-8").alias("html"),
        text.alias("text"),
        lang.alias("lang"),
    )
