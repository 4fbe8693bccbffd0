"""Structured Streaming: windowed aggs == batch oracles, watermark dedupe,
and the foreachBatch diff-commit loop (the tiled-db minutely-diff analogue)."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from tiledspark import synth
from tiledspark.snapshot import SnapshotStore
from tiledspark.streaming import (
    run_to_memory,
    session_counts,
    sliding_counts,
    stream_commit_diffs,
    stream_dedupe,
    stream_events,
    tumbling_counts,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def events_dir(tmp_path, spark):
    # split events into 3 files so the stream runs 3 micro-batches
    d = str(tmp_path / "events_stream")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    ev.repartition(3).write.mode("overwrite").parquet(d)
    return d


def _batch_events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


def test_streaming_tumbling_equals_batch(spark, events_dir):
    got = tumbling_counts(stream_events(spark, events_dir))
    run_to_memory(got, "tumbling_out")
    s = spark.sql("SELECT * FROM tumbling_out").toPandas()
    b = (
        _batch_events(spark)
        .groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n", "total_value")
        .toPandas()
    )
    key = ["win_start", "event_type"]
    s = s.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert len(s) == len(b)
    assert (s["n"].to_numpy() == b["n"].to_numpy()).all()
    assert (s["total_value"].to_numpy() == b["total_value"].to_numpy()).all()


def test_streaming_sliding_and_session_run(spark, events_dir):
    run_to_memory(sliding_counts(stream_events(spark, events_dir)), "sliding_out")
    n_slide = spark.sql("SELECT count(*) c FROM sliding_out").collect()[0]["c"]
    assert n_slide > 0
    # micro-batches arrive out of time-order (repartition(3) split), so for
    # an exact streaming==batch equality the watermark must exceed the data
    # span — with a realistic 1h watermark the stream correctly DROPS
    # cross-batch late events, which is the semantics, not a bug
    run_to_memory(
        session_counts(stream_events(spark, events_dir), watermark="60 days"),
        "session_out",
    )
    n_sess = spark.sql("SELECT count(*) c FROM session_out").collect()[0]["c"]
    # sessions == batch session_window count
    b = (
        _batch_events(spark)
        .groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .count()
        .count()
    )
    assert n_sess == b


def test_stream_dedupe_drops_replayed_ids(spark, tmp_path):
    d = str(tmp_path / "dup_stream")
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").limit(200).cache()
    ev.write.mode("overwrite").parquet(d + "/a")
    ev.write.mode("append").parquet(d + "/a")  # replay the same ids
    deduped = stream_dedupe(stream_events(spark, d + "/a", files_per_trigger=100))
    run_to_memory(deduped.groupBy().count(), "dedup_out", output_mode="complete")
    n = spark.sql("SELECT * FROM dedup_out").collect()[0]["count"]
    assert n == 200, f"expected 200 unique events, got {n}"
    ev.unpersist()


def test_stream_commit_diffs_layers(spark, tmp_path, pages_path):
    from pyspark.sql import functions as F
    from tiledspark import tiles
    from tiledspark.extract import dedupe_latest_by_url, extract_coords

    store = SnapshotStore(str(tmp_path / "store"), n_buckets=256)
    pages = spark.read.parquet(pages_path)
    base = (
        dedupe_latest_by_url(extract_coords(pages))
        .where(F.col("lat").isNotNull())
        .withColumn("tile_id", tiles.tile_id_expr(F.col("lon"), F.col("lat"), tiles.Z_BASE))
        .select("url", "warc_ts", "text", "lang", "lat", "lon", "tile_id")
    )
    store.commit(base, key_col="tile_id", index_key="url")

    diff_files = synth.ensure_diff_batches(
        str(tmp_path / "synth"), 5_000, n_batches=3, rows=100
    )
    diffs_dir = str(tmp_path / "diffs_in")
    os.makedirs(diffs_dir)
    for p in diff_files:
        shutil.copy(p, diffs_dir)

    committed = stream_commit_diffs(
        spark, diffs_dir, store, str(tmp_path / "ckpt")
    )
    assert len(committed) == 3, f"expected 3 micro-batch commits, got {committed}"
    assert store.snapshots() == [1, 2, 3, 4]
    # layering is copy-on-write: later manifests carry earlier files
    m = store.manifest()
    assert m["diff"]["n_carried_files"] > 0
    # final state has no duplicate urls
    after = store.read(spark)
    assert after.groupBy("url").count().where(F.col("count") > 1).count() == 0


def test_stateful_tile_counts_carries_state_across_batches(spark, tmp_path):
    """Op 68 (round-1 fix: real cross-batch GroupState via
    applyInPandasWithState, not foreachBatch; transformWithStateInPandas is
    env-blocked — its worker needs google.protobuf, absent here): per-tile
    state must accumulate across micro-batches and the final running totals
    must equal a batch recompute over all diffs."""
    from tiledspark import tiles
    from tiledspark.extract import extract_coords
    from tiledspark.streaming import stateful_tile_counts

    diff_files = synth.ensure_diff_batches(
        str(tmp_path / "synth"), 5_000, n_batches=3, rows=100
    )
    diffs_dir = str(tmp_path / "diffs_in")
    os.makedirs(diffs_dir)
    for p in diff_files:
        shutil.copy(p, diffs_dir)

    rows = stateful_tile_counts(spark, diffs_dir, str(tmp_path / "ckpt_tws"))
    # memory sink in Update mode appends each batch's emissions: the LAST
    # emission per tile is the running total
    latest: dict[int, tuple[int, int]] = {}
    for r in rows:
        tid = r["tile_id"]
        prev = latest.get(tid)
        if prev is None or r["n_batches"] >= prev[1]:
            latest[tid] = (r["n_docs"], r["n_batches"])

    batch = (
        extract_coords(spark.read.parquet(diffs_dir))
        .withColumn(
            "tile_id",
            F.when(
                F.col("lat").isNotNull(),
                tiles.tile_id_expr(F.col("lon"), F.col("lat"), tiles.Z_BASE),
            ).otherwise(F.lit(0)),
        )
        .groupBy("tile_id")
        .agg(
            F.sum(F.when(F.col("op") == "upsert", 1).otherwise(-1)).alias("net")
        )
        .collect()
    )
    expected = {r["tile_id"]: r["net"] for r in batch}
    got = {tid: nd for tid, (nd, _) in latest.items()}
    assert got == expected, (
        f"stateful totals diverge from batch recompute: "
        f"{dict(list(got.items())[:3])} vs {dict(list(expected.items())[:3])}"
    )
    # state genuinely crossed batches: some tile must have n_batches >= 2
    assert any(nb >= 2 for _, nb in latest.values()), latest


def test_apply_diff_is_idempotent_per_tag(spark, tmp_path, pages_path):
    """Round-1 fix: replaying a tagged diff (foreachBatch crash-replay) must
    return the existing snapshot id, not layer a duplicate commit."""
    from tiledspark import tiles
    from tiledspark.extract import dedupe_latest_by_url, extract_coords

    store = SnapshotStore(str(tmp_path / "store"), n_buckets=64)
    pages = spark.read.parquet(pages_path)
    base = (
        dedupe_latest_by_url(extract_coords(pages))
        .where(F.col("lat").isNotNull())
        .withColumn("tile_id", tiles.tile_id_expr(F.col("lon"), F.col("lat"), tiles.Z_BASE))
        .select("url", "warc_ts", "text", "lang", "lat", "lon", "tile_id")
    )
    store.commit(base, key_col="tile_id", index_key="url")

    delta = base.limit(5).withColumn("op", F.lit("upsert"))
    sid1 = store.apply_diff(spark, delta, row_key="url", key_col="tile_id", tag="diff_batch=0")
    sid2 = store.apply_diff(spark, delta, row_key="url", key_col="tile_id", tag="diff_batch=0")
    assert sid1 == sid2
    assert store.snapshots() == [1, 2], "replay must not create a third layer"


def test_stream_near_dedupe_across_batches(spark, tmp_path):
    """Cross-batch MinHash dedup: a batch-2 doc near-dupping a batch-1
    keeper is dropped, new content survives, signatures accumulate, and a
    replayed file is fully absorbed (self-healing idempotence)."""
    from tiledspark.streaming import stream_near_dedupe

    base_words = ("the quick brown fox jumps over the lazy dog and then it "
                  "runs far away into the deep green forest tonight").split()
    mut = list(base_words); mut[4] = "cat"
    docs_dir = tmp_path / "docs_in"
    docs_dir.mkdir()
    b1 = [(1, " ".join(base_words)), (2, " ".join(f"u2_{j}" for j in range(25)))]
    b2 = [
        (3, " ".join(mut)),                              # near-dup of kept 1
        (4, " ".join(f"u4_{j}" for j in range(25))),     # new
        (5, " ".join(f"u4_{j}" for j in range(25))),     # exact dup of 4 (in-batch)
    ]
    # flat part files with ordered mtimes: the file source forms one
    # micro-batch per file in modification-time order
    import glob
    import os
    import shutil
    import time

    def _write_batch(rows, name, age_s):
        stage = tmp_path / f"stage_{name}"
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.parquet(str(stage))
        part = glob.glob(str(stage / "part-*.parquet"))[0]
        dst = str(docs_dir / name)
        shutil.copy(part, dst)
        ts = time.time() - age_s
        os.utime(dst, (ts, ts))

    _write_batch(b1, "f1.parquet", 200)
    _write_batch(b2, "f2.parquet", 100)

    out_dir, sig_dir = str(tmp_path / "kept"), str(tmp_path / "sigs")
    stats = stream_near_dedupe(
        spark, str(docs_dir), out_dir, sig_dir, str(tmp_path / "ckpt"),
        files_per_trigger=1,
    )
    assert len(stats) == 2
    by_batch = {s["batch_id"]: s for s in stats}
    assert by_batch[0]["n_kept"] == 2
    assert by_batch[1]["n_dropped_vs_history"] == 1       # doc 3
    assert by_batch[1]["n_dropped_within_batch"] == 1     # doc 5
    assert by_batch[1]["n_kept"] == 1                     # doc 4

    kept = {r["doc_id"] for r in spark.read.parquet(out_dir).collect()}
    assert kept == {1, 2, 4}
    sig_ids = {
        r["doc_id"]
        for r in spark.read.parquet(sig_dir).select("doc_id").distinct().collect()
    }
    assert sig_ids == kept

    # replay: drop the checkpoint and stream the SAME files again into the
    # same stores — the id guard absorbs every doc, nothing duplicates
    stats2 = stream_near_dedupe(
        spark, str(docs_dir), out_dir, sig_dir, str(tmp_path / "ckpt2"),
        files_per_trigger=1,
    )
    assert all(s["n_kept"] == 0 for s in stats2)
    assert sum(s["n_dropped_replay"] for s in stats2) == 3  # ids 1, 2, 4
    replay_kept = [r["doc_id"] for r in spark.read.parquet(out_dir).collect()]
    assert sorted(replay_kept) == [1, 2, 4]
