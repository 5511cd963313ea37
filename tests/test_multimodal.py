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


def test_resize_images(spark):
    from vector_spark.dataops.multimodal import resize_images, synthetic_media

    media = synthetic_media(spark, 12)
    out = resize_images(media, 128, 128)
    rows = out.collect()
    assert len(rows) == 12
    imgs = [r for r in rows if r["kind"] == "image"]
    assert imgs and all(r["meta"]["width"] == 128 for r in imgs)
    target = max(1, (128 * 128) // 1024)
    assert all(len(r["payload"]) == target for r in imgs)
    # non-images pass through untouched
    others = [r for r in rows if r["kind"] != "image"]
    assert all(r["meta"]["width"] is None for r in others)


def test_resize_real_seam_raises(spark):
    import pytest
    from vector_spark.dataops.multimodal import resize_images, synthetic_media

    with pytest.raises(Exception):  # NotImplementedError surfaces via Py4J
        resize_images(synthetic_media(spark, 3), 64, 64, decode="real").collect()


def test_real_video_features_and_frame_table(spark):
    from vector_spark.dataops.multimodal import (
        extract_features,
        frame_sample_container,
        synthetic_media,
    )

    media = synthetic_media(spark, 12, real_payloads=True)
    vids = media.filter("kind = 'video'")
    # real decode path: raw-RGB24 MP4 containers decode end-to-end
    feats = extract_features(vids, decode="real").collect()
    assert feats and all(len(r["feature"]) == 8 for r in feats)
    # container-driven frame table: true timestamps and byte ranges
    table = frame_sample_container(media, every_ms=500).toPandas()
    assert set(table.codec.unique()) == {"raw "}
    assert (table.n_bytes == 8 * 8 * 3).all()
    # fps=2 -> one sample every 500 ms, all kept at every_ms=500
    per = table.groupby("media_id").size()
    vrows = vids.toPandas()
    n_frames = {r.media_id: 2 + r.media_id % 4 for r in vrows.itertuples()}
    assert {m: int(c) for m, c in per.items()} == n_frames


def test_probe_media_from_payload_bytes(spark):
    from vector_spark.dataops.multimodal import probe_media, synthetic_media

    media = synthetic_media(spark, 18, real_payloads=True)
    probed = probe_media(media).toPandas().set_index("media_id")
    assert probed.probe_error.isna().all()
    # formats sniffed from magic bytes, not the meta struct
    assert set(probed.format.unique()) >= {"png", "ppm", "wav", "mp4"}
    vids = probed[probed.kind == "video"]
    assert (vids.codec == "raw").all()
    assert (vids.n_samples == vids.index.map(lambda i: 2 + i % 4)).all()
    assert (vids.duration_ms == vids.n_samples * 500).all()
    wavs = probed[probed.kind == "audio"]
    assert (wavs.sample_rate == 8000).all()
    assert (wavs.duration_ms == 100).all()  # 100 ms tones


def test_probe_media_poison_pill_rows_not_failures(spark):
    from vector_spark.dataops.multimodal import probe_media, synthetic_media

    # fake payloads are garbage bytes: every row must come back as a
    # probe_error, and the job must not fail
    media = synthetic_media(spark, 9, real_payloads=False)
    probed = probe_media(media).toPandas()
    assert len(probed) == 9
    assert probed.probe_error.notna().all()


def test_frame_sample_container_respects_every_ms(spark):
    # every_ms NOT a multiple of the 500 ms sample grid: a
    # grid-advanced threshold drifts behind the timeline and keeps
    # frames closer together than every_ms; the kept-sample-anchored
    # threshold never does
    from vector_spark.dataops.multimodal import (
        frame_sample_container,
        synthetic_media,
    )

    media = synthetic_media(spark, 12, real_payloads=True)
    table = frame_sample_container(media, every_ms=750).toPandas()
    for _, grp in table.groupby("media_id"):
        ts = sorted(grp.frame_ts_ms)
        gaps = [b - a for a, b in zip(ts, ts[1:])]
        assert all(g >= 750 for g in gaps), (ts, gaps)
