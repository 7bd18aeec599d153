"""Fuzzy broadcast join + multimodal plumbing."""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F

from ocr_auto_label_spark.labelcore.canonical import canonical_labels
from ocr_auto_label_spark.operators.fuzzy_join import canonical_dim, fuzzy_canonical_join
from ocr_auto_label_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_media_batch,
    extract_features,
    resize_metadata,
    sample_frames,
    synth_media,
)


def test_fuzzy_join_exact_and_near(spark):
    canon = canonical_labels()[50][0]
    corrupted = canon[:-1] + ("9" if canon[-1] != "9" else "8")
    rows = [(1, canon), (2, corrupted), (3, "ZZZ.9.9"), (4, f"  {canon.lower()} ")]
    df = spark.createDataFrame(rows, "code_id: int, code: string")
    out = {r.code_id: (r.canonical, r.distance) for r in fuzzy_canonical_join(df).collect()}
    assert out[1] == (canon, 0)
    assert out[2][0] is not None and out[2][1] == 1
    assert out[3] == (None, None)
    assert out[4] == (canon, 0)  # trim+upper before matching
    assert len(out) == 4  # argmin window keeps exactly one row per input


def test_fuzzy_join_is_broadcast(spark):
    df = spark.createDataFrame([(1, "MWI.1.2")], "code_id: int, code: string")
    plan = fuzzy_canonical_join(df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_canonical_dim_size(spark):
    assert canonical_dim(spark).count() == len(canonical_labels())


def test_decode_stub_raises_without_fake():
    import pandas as pd

    with pytest.raises(NotImplementedError):
        decode_media_batch(pd.Series([b"x"]), pd.Series(["image"]))


def test_extract_features_shape_and_determinism(spark):
    media = synth_media(spark, n=30)
    out = extract_features(media).collect()
    assert len(out) == 30
    for r in out:
        assert len(r.feature) == FEATURE_DIM
        assert all(0.0 <= v <= 1.0 for v in r.feature)
        assert r.payload_bytes > 0
    again = {r.media_id: tuple(r.feature) for r in extract_features(media).collect()}
    first = {r.media_id: tuple(r.feature) for r in out}
    assert again == first  # byte-derived features are deterministic


def test_extract_features_plan_is_narrow_arrow(spark):
    media = synth_media(spark, n=6)
    plan = extract_features(media)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert "Exchange" not in plan  # partition-preserving, no shuffle


def test_sample_frames_fanout(spark):
    media = synth_media(spark, n=30)
    frames = sample_frames(media, every_ms=5000)
    rows = frames.collect()
    assert rows, "videos must produce frames"
    by_media = {}
    for r in rows:
        by_media.setdefault(r.media_id, []).append(r.frame_idx)
        assert len(bytes(r.frame_payload)) > 0
    videos = {r.media_id: r.meta["duration_ms"] for r in media.collect() if r.media_type == "video"}
    for mid, idxs in by_media.items():
        assert sorted(idxs) == list(range(len(idxs)))  # dense frame indices
        assert len(idxs) == max(1, videos[mid] // 5000)


def test_resize_metadata_rule(spark):
    media = synth_media(spark, n=30)
    out = {r.media_id: r for r in resize_metadata(media, max_side=1024).collect()}
    src = {r.media_id: r for r in media.collect()}
    for mid, r in out.items():
        w, h = src[mid].meta["width"], src[mid].meta["height"]
        if max(w, h) > 1024:
            assert r.needs_resize == 1
            assert max(r.target_width, r.target_height) <= 1024
        else:
            assert (r.target_width, r.target_height) == (w, h)


def test_codec_protocol_pluggable(spark):
    """A custom MediaCodec drops in without touching the Spark plumbing;
    the Pillow slot raises cleanly in this image-library-free container."""
    import numpy as np
    import pytest

    from ocr_auto_label_spark.operators.multimodal import (
        FEATURE_DIM,
        MediaCodec,
        PillowImageCodec,
        extract_features,
        synth_media,
    )

    class ConstCodec(MediaCodec):
        def decode_batch(self, payloads, media_types):
            return np.full((len(payloads), FEATURE_DIM), 0.25, dtype=np.float32)

    rows = extract_features(synth_media(spark, n=6), codec=ConstCodec()).collect()
    assert all(abs(v - 0.25) < 1e-6 for r in rows for v in r.feature)
    with pytest.raises(NotImplementedError):
        PillowImageCodec()


def test_media_profile_combines_three_pipelines(spark):
    from ocr_auto_label_spark.operators.multimodal import media_profile, synth_media

    out = media_profile(synth_media(spark, n=12)).collect()
    assert len(out) == 12
    by_type = {}
    for r in out:
        by_type.setdefault(r.media_type, []).append(r)
        assert r.payload_bytes > 0 and r.target_width >= 1
    assert all(r.n_frames >= 1 for r in by_type["video"])
    assert all(r.n_frames == 0 for r in by_type["image"])


def test_wav_codec_decodes_real_audio(spark):
    """Audio payloads are genuine WAV/PCM16 and the stdlib codec recovers
    a meaningful RMS envelope: a pure sine's per-segment RMS ≈ A/√2."""
    import io
    import wave

    import numpy as np

    from ocr_auto_label_spark.operators.multimodal import (
        FEATURE_DIM,
        WavAudioCodec,
        extract_features,
        synth_media,
    )

    # known signal: 0.5-amplitude sine → RMS 0.5/√2 ≈ 0.3536 per segment
    sr, n = 8000, 3200
    t = np.arange(n) / sr
    pcm = np.clip(0.5 * np.sin(2 * np.pi * 440 * t) * 32767, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1); w.setsampwidth(2); w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    feats = WavAudioCodec.decode_wav(buf.getvalue())
    assert feats.shape == (FEATURE_DIM,)
    assert all(abs(v - 0.3536) < 0.02 for v in feats)

    # the synthetic table's audio rows decode for real end-to-end
    out = extract_features(synth_media(spark, n=9), codec=WavAudioCodec()).collect()
    audio = [r for r in out if r.media_type == "audio"]
    assert audio and all(0.0 < max(r.feature) < 1.0 for r in audio)
