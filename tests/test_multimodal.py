"""Multimodal actor-pool stage tests: real Ray plumbing (schemas, actor
signatures, fan-out layout), stubbed codecs (deterministic fakes)."""

import pyarrow as pa
import pytest

from airbyte_destination_ray.stages.multimodal import (
    AudioFeatureStage,
    ImageDecodeStage,
    ImageResizeStage,
    VideoFrameSampleStage,
    decode_images,
    sample_video_frames,
    synthesize_media_table,
)


def test_synthesize_media_deterministic():
    a = synthesize_media_table(4)
    b = synthesize_media_table(4)
    assert a.equals(b)
    assert a.column("payload").to_pylist()[0] is not None


def test_image_decode_stage_local():
    t = synthesize_media_table(5)
    out = ImageDecodeStage()(t)
    assert out.column_names == ["media_id", "kind", "mime", "width", "height", "channels", "mean_luma"]
    assert all(64 <= w <= 2048 for w in out.column("width").to_pylist())
    # deterministic: same payload → same fake decode
    out2 = ImageDecodeStage()(synthesize_media_table(5))
    assert out.equals(out2)


def test_image_decode_strict_marks_stub():
    t = synthesize_media_table(1)
    with pytest.raises(NotImplementedError):
        ImageDecodeStage(strict=True)(t)


def test_resize_stage_byte_budget():
    t = synthesize_media_table(3)
    out = ImageResizeStage(width=8, height=8)(t)
    for p in out.column("payload").to_pylist():
        assert len(p) == 8 * 8 * 3


def test_audio_features_fixed_dim():
    t = synthesize_media_table(3, kind="audio", payload_bytes=32000)
    out = AudioFeatureStage(dim=16)(t)
    assert all(len(f) == 16 for f in out.column("features").to_pylist())
    assert out.column("duration_sec").to_pylist()[0] == pytest.approx(1.0)


def test_video_fan_out_layout():
    t = synthesize_media_table(2, kind="video", payload_bytes=8192)
    out = VideoFrameSampleStage(frames_per_video=4, frame_bytes=1024)(t)
    assert out.num_rows == 8
    assert out.column_names == ["media_id", "frame_idx", "frame"]
    assert all(len(f) == 1024 for f in out.column("frame").to_pylist())


def test_actor_pool_decode_on_ray(ray_session):
    import ray.data

    ds = ray.data.from_arrow(synthesize_media_table(40))
    out = decode_images(ds, concurrency=2, batch_size=8)
    t = pa.concat_tables(list(out.iter_batches(batch_format="pyarrow")))
    assert t.num_rows == 40
    assert "mean_luma" in t.column_names


def test_actor_pool_frame_sampling_on_ray(ray_session):
    import ray.data

    ds = ray.data.from_arrow(synthesize_media_table(10, kind="video", payload_bytes=8192))
    out = sample_video_frames(ds, frames_per_video=3, concurrency=2)
    t = pa.concat_tables(list(out.iter_batches(batch_format="pyarrow")))
    assert t.num_rows == 30
