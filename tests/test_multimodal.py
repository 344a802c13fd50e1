"""Multimodal stage plumbing + sessionization + tokenizer actor tests."""

import numpy as np
import pyarrow as pa
import pytest

from parquet_go_ray.ops.multimodal import (
    FrameSample,
    MediaDecode,
    MediaFeatures,
    MediaResize,
    MediaStage,
    media_pipeline,
    synthetic_media_table,
)


def test_synthetic_media_deterministic():
    a = synthetic_media_table(50, seed=1)
    b = synthetic_media_table(50, seed=1)
    assert a.equals(b)


def test_media_blob_roundtrip():
    """Binary media columns flow through the engine's codec layer."""
    from parquet_go_ray.state.blob import decode_table, encode_table

    t = synthetic_media_table(100, seed=2)
    blob, meta = encode_table(t)
    out = decode_table(blob)
    assert out.combine_chunks().column("payload").equals(
        t.combine_chunks().column("payload")
    )
    assert meta["columns"]["payload"]["codec"] in ("plain", "delta_length", "dict", "fsst")


def test_strict_mode_raises():
    t = synthetic_media_table(4, seed=3)
    with pytest.raises(NotImplementedError):
        MediaDecode(strict=True)(t)
    with pytest.raises(NotImplementedError):
        MediaFeatures(strict=True)(t)


def test_stub_stages_shapes():
    t = synthetic_media_table(20, seed=4)
    d = MediaDecode()(t)
    assert d.column("decode_ok").type == pa.bool_()
    f = MediaFeatures()(d)
    feats = f.column("features")
    assert pa.types.is_fixed_size_list(feats.type) and feats.type.list_size == 32
    # Feature vectors are L2-normalized.
    v = np.array(feats[0].as_py())
    assert abs(np.linalg.norm(v) - 1.0) < 1e-5
    r = MediaResize(target=(64, 64))(t)
    assert r.column("width").to_pylist() == [64] * 20
    fs = FrameSample(frames_per_clip=3)(t)
    n_videos = sum(1 for x in t.column("media_type").to_pylist() if x == "video/mp4")
    assert fs.num_rows == 3 * n_videos
    assert fs.column_names == ["media_id", "frame_idx", "frame"]


def test_recommended_sizing():
    bs, conc = MediaStage.recommended(avg_payload_bytes=10 << 20)
    assert 1 <= bs <= 256


def test_media_pipeline_end_to_end(ray_session):
    import ray

    ds = ray.data.from_arrow(synthetic_media_table(60, seed=5))
    out = media_pipeline(ds, MediaFeatures, batch_size=16, concurrency=(1, 2))
    got = out.take_batch(60, batch_format="pyarrow")
    assert "features" in got.column_names
    assert got.num_rows == 60


def test_sessionize(ray_session):
    import ray

    from parquet_go_ray.ops.sessions import sessionize

    base = 1_700_000_000_000_000
    rows = {
        "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "ts": pa.array(
            [
                base,
                base + 60_000_000,  # +1 min: same session
                base + 3_700_000_000,  # +61 min gap: new session
                base,
                base + 10_000_000_000,  # +166 min: new session
            ],
            pa.timestamp("us"),
        ),
    }
    ds = ray.data.from_arrow(pa.table(rows))
    out = {r["user_id"]: r for r in sessionize(ds).iter_rows()}
    assert out[1]["n_events"] == 3 and out[1]["n_sessions"] == 2
    assert out[2]["n_events"] == 2 and out[2]["n_sessions"] == 2


def test_bpe_tokenizer_actor(ray_session):
    import ray

    from parquet_go_ray.ops.text import BpeishTokenCounter, apply_actor

    t = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["it's a test-case, really 42 times", ""]),
        }
    )
    out = apply_actor(
        ray.data.from_arrow(t), BpeishTokenCounter, concurrency=(1, 2)
    ).to_pandas()
    counts = out.sort_values("doc_id")["n_bpe_tokens"].tolist()
    direct = BpeishTokenCounter()(t).column("n_bpe_tokens").to_pylist()
    assert counts == direct
    assert counts[0] > 5 and counts[1] == 0
