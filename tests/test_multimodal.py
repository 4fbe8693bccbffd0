"""Multimodal plumbing: schema, mapInPandas batch shape, determinism,
frame-sample plan (decode kernel itself is a documented deterministic stub)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tiledspark.multimodal import decode_features, frame_sample_plan, synth_media


def test_decode_features_runs_and_is_deterministic(spark):
    media = synth_media(spark, 120).cache()
    a = decode_features(media).toPandas().sort_values("media_id").reset_index(drop=True)
    b = (
        decode_features(media.repartition(7))
        .toPandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    assert len(a) == 120
    assert (a["phash"] == b["phash"]).all()
    assert (a["mean_luma"] == b["mean_luma"]).all()
    assert a["phash"].nunique() > 50  # hash actually varies with content
    media.unpersist()


def test_frame_sample_plan(spark):
    media = synth_media(spark, 60)
    frames = frame_sample_plan(media, every_ms=10_000)
    pdf = frames.toPandas()
    assert (pdf["frame_ts_ms"] % 10_000 == 0).all()
    # every video yields ceil(duration/10s) >= 1 frames
    vids = media.where(F.col("kind") == "video").count()
    assert pdf["media_id"].nunique() == vids
