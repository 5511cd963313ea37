"""Multimodal plumbing: schema, Arrow batch shape, deterministic fake
decode, frame-sample plan, and the explicit real-decode seam.
"""

from __future__ import annotations

import pytest

from vector_spark.dataops.multimodal import (
    extract_features,
    frame_sample_plan,
    synthetic_media,
)


def test_extract_features_fake(spark):
    media = synthetic_media(spark, 32)
    out = extract_features(media).toPandas()
    assert len(out) == 32
    assert out.content_hash.str.len().eq(64).all()
    assert out.feature.map(len).eq(8).all()
    assert (out.n_bytes > 0).all()
    # deterministic across runs
    out2 = extract_features(synthetic_media(spark, 32)).toPandas()
    assert out.sort_values("media_id").content_hash.tolist() == \
        out2.sort_values("media_id").content_hash.tolist()


def test_real_decode_raises(spark):
    media = synthetic_media(spark, 4)
    with pytest.raises(Exception, match="NotImplementedError|decode"):
        extract_features(media, decode="real").collect()


def test_frame_sample_plan(spark):
    media = synthetic_media(spark, 30)
    plan = frame_sample_plan(media, every_ms=1000).toPandas()
    videos = media.filter("kind = 'video'").toPandas()
    assert set(plan.media_id.unique()) == set(videos.media_id)
    # durations 1..5s -> 1..5 frames
    per = plan.groupby("media_id").size()
    assert per.min() >= 1 and per.max() <= 5
