"""Multimodal plumbing tests: binary columns + metadata through Arrow
mapInPandas transforms (decode stubbed — deterministic fake, schema and
batch shape real)."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest

from dedup_domains_spark.functions.multimodal import (
    MEDIA_SCHEMA,
    decode_image,
    image_features,
    phash_dedup_pairs,
    sample_video_frames,
)


@pytest.fixture(scope="module")
def media_df(spark):
    rows = []
    for i in range(30):
        payload = hashlib.sha256(f"img{i // 2}".encode()).digest() * 8
        # pairs of identical payloads -> exact phash duplicates
        rows.append((f"m{i}", "image", "image/png", 64, 64, None, payload))
    for i in range(5):
        payload = hashlib.sha256(f"vid{i}".encode()).digest() * 16
        rows.append((f"v{i}", "video", "video/mp4", 640, 480, 3500, payload))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA.fields]),
        schema=MEDIA_SCHEMA,
    )


def test_decode_strict_raises():
    with pytest.raises(NotImplementedError):
        decode_image(b"bytes", strict=True)


def test_image_features_schema_and_determinism(spark, media_df):
    feats = image_features(media_df.filter("kind = 'image'"))
    rows = {r.media_id: r for r in feats.collect()}
    assert len(rows) == 30
    assert all(len(r.phash) == 16 for r in rows.values())
    assert all(len(r.mean_rgb) == 3 for r in rows.values())
    # identical payloads decode to identical features
    assert rows["m0"].phash == rows["m1"].phash
    assert rows["m2"].phash == rows["m3"].phash
    assert rows["m0"].phash != rows["m2"].phash


def test_phash_dedup_pairs(spark, media_df):
    feats = image_features(media_df.filter("kind = 'image'"))
    pairs = {
        (r.id_a, r.id_b) for r in phash_dedup_pairs(feats, max_hamming=0).collect()
    }
    assert ("m0", "m1") in pairs or ("m1", "m0") in pairs
    # no cross-pair between different payload groups at hamming 0 unless
    # hashes collide — planted groups differ
    assert ("m0", "m2") not in pairs and ("m2", "m0") not in pairs


def test_video_frame_sampling(spark, media_df):
    frames = sample_video_frames(media_df, every_ms=1000)
    got = frames.groupBy("media_id").count().collect()
    assert {r.media_id for r in got} == {f"v{i}" for i in range(5)}
    assert all(r["count"] == 3 for r in got)  # 3500ms / 1000ms -> 3 frames


def test_audio_features_plumbing(spark):
    """Audio decode→loudness→fingerprint chain: deterministic per payload,
    batch-invariant, correct schema; video rows filtered out."""
    import pandas as pd
    from pyspark.sql import functions as F

    from dedup_domains_spark.functions.multimodal import audio_features

    rows = [
        ("a1", "audio", b"payload-one" * 400),
        ("a2", "audio", b"payload-two" * 900),
        ("a1b", "audio", b"payload-one" * 400),  # identical payload to a1
        ("v1", "video", b"not-audio"),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["media_id", "kind", "data"])
    ).select(
        "media_id", "kind", F.lit("audio/wav").alias("mime"),
        F.lit(None).cast("int").alias("width"), F.lit(None).cast("int").alias("height"),
        F.lit(1000).alias("duration_ms"), "data",
    )
    feats = {r.media_id: r for r in audio_features(df).collect()}
    assert set(feats) == {"a1", "a2", "a1b"}  # video row filtered
    assert feats["a1"].afingerprint == feats["a1b"].afingerprint  # batch-invariant
    assert feats["a1"].afingerprint != feats["a2"].afingerprint
    assert feats["a2"].n_windows == len(feats["a2"].rms_db) > 1
    import re
    assert re.fullmatch(r"[0-9a-f]{16}", feats["a1"].afingerprint)


def test_audio_decode_strict_raises():
    import pytest as _pytest

    from dedup_domains_spark.functions.multimodal import decode_audio

    with _pytest.raises(NotImplementedError):
        decode_audio(b"x", strict=True)
