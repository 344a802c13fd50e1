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
    # Rows 4, 9, ... carry library-dependent formats (png/jpeg/mp4):
    # strict mode must refuse them rather than faking a decode.
    t = synthetic_media_table(10, seed=3)
    with pytest.raises(NotImplementedError):
        MediaDecode(strict=True)(t)
    with pytest.raises(NotImplementedError):
        MediaFeatures(strict=True)(t)


def test_ppm_and_wav_codecs_roundtrip():
    from parquet_go_ray.ops.multimodal import (
        clip_encode,
        clip_frames,
        ppm_decode,
        ppm_encode,
        resize_nearest,
        wav_decode_pcm16,
        wav_encode_pcm16,
    )

    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, (13, 17, 3)).astype(np.uint8)
    assert (ppm_decode(ppm_encode(img)) == img).all()
    with pytest.raises(ValueError):
        ppm_decode(b"P6\n3 3\n255\nshort")
    small = resize_nearest(img, 5, 4)
    assert small.shape == (4, 5, 3)

    s = (np.sin(np.arange(4000) / 20.0) * 20000).astype(np.int16)
    out, rate = wav_decode_pcm16(wav_encode_pcm16(s, 8000))
    assert rate == 8000 and (out == s).all()
    with pytest.raises(ValueError):
        wav_decode_pcm16(b"RIFFxxxxNOPE")

    frames = [np.full((4, 6, 3), v, np.uint8) for v in (1, 2, 3)]
    back = clip_frames(clip_encode(frames))
    assert len(back) == 3 and all((a == b).all() for a, b in zip(frames, back))

    # A fmt chunk whose declared size overruns the payload (truncated WAV)
    # must raise ValueError — the media stages' undecodable-row contract —
    # not leak struct.error and crash the whole map_batches task.
    good = wav_encode_pcm16(s, 8000)
    truncated = good[:20]  # RIFF + 'fmt ' header, body cut mid-fields
    with pytest.raises(ValueError):
        wav_decode_pcm16(truncated)


def test_truncated_wav_marks_row_undecodable():
    """One corrupt WAV payload must not crash the decode/feature stages."""
    from parquet_go_ray.ops.multimodal import (
        MEDIA_SCHEMA,
        WAV_TYPE,
        wav_encode_pcm16,
    )

    s = (np.sin(np.arange(800) / 9.0) * 15000).astype(np.int16)
    good = wav_encode_pcm16(s, 8000)
    t = pa.Table.from_pylist(
        [
            {"media_id": 0, "media_type": WAV_TYPE, "payload": good,
             "width": 0, "height": 0, "duration_ms": 100},
            {"media_id": 1, "media_type": WAV_TYPE, "payload": good[:20],
             "width": 0, "height": 0, "duration_ms": 100},
        ],
        schema=MEDIA_SCHEMA,
    )
    d = MediaDecode()(t)
    assert d.column("decode_ok").to_pylist() == [True, False]
    f = MediaFeatures()(t)  # falls back to byte features, doesn't raise
    assert f.num_rows == 2


def test_clip_frames_offset_parse():
    """Clip walk parses headers at offsets (no tail copy) incl. comments."""
    from parquet_go_ray.ops.multimodal import ppm_decode, ppm_payload_size

    img = np.arange(4 * 5 * 3, dtype=np.uint8).reshape(4, 5, 3)
    with_comment = b"P6\n# hi\n5 4\n255\n" + img.tobytes()
    blob = b"XX" + with_comment  # frame at a nonzero offset
    assert ppm_payload_size(blob, 2) == len(with_comment)
    assert (ppm_decode(blob, 2) == img).all()


def test_real_decode_stage():
    t = synthetic_media_table(20, seed=4)
    d = MediaDecode()(t)
    ok = d.column("decode_ok").to_pylist()
    types = t.column("media_type").to_pylist()
    for o, mt in zip(ok, types):
        if mt in ("image/x-portable-pixmap", "audio/wav", "video/x-ppm-seq",
                  "video/mp4"):
            # mp4 container metadata parses for real (ISO-BMFF box walk);
            # frame decode remains the codec stub (FrameSample).
            assert o, f"real format {mt} must decode"
        else:
            assert not o, f"stub format {mt} must be marked undecodable"


def test_mp4_container_metadata():
    """ISO-BMFF box walk: dimensions/duration/tracks come from the
    parsed container, not the metadata columns; garbage rejected."""
    import pytest

    from parquet_go_ray.ops.multimodal import mp4_encode_meta, mp4_parse

    b = mp4_encode_meta(1280, 720, 12_345, mdat=b"xyz" * 50)
    info = mp4_parse(b)
    assert (info["width"], info["height"]) == (1280, 720)
    assert info["n_tracks"] == 1 and info["brand"] == "isom"
    assert abs(info["duration_ms"] - 12_345) <= 1
    for bad in (b"", b"\x00" * 20, b"\x00\x00\x00\x08ftyp",
                b[:40]):  # truncated moov
        with pytest.raises(ValueError):
            mp4_parse(bad)
    # MediaDecode reports parsed dims for mp4 rows
    t = synthetic_media_table(20, seed=4)
    d = MediaDecode()(t)
    for i in range(t.num_rows):
        if t.column("media_type")[i].as_py() == "video/mp4":
            assert (d.column("decoded_w")[i].as_py()
                    == t.column("width")[i].as_py())
            assert (d.column("decoded_h")[i].as_py()
                    == t.column("height")[i].as_py())


def test_decoded_dims_from_pixels():
    # Decoded dimensions come from the parsed pixels, not the metadata.
    import parquet_go_ray.ops.multimodal as mm

    t = synthetic_media_table(20, seed=4)
    d = MediaDecode()(t)
    types = t.column("media_type").to_pylist()
    first_ppm = types.index("image/x-portable-pixmap")
    img = mm.ppm_decode(t.column("payload")[first_ppm].as_py())
    assert d.column("decoded_w")[first_ppm].as_py() == img.shape[1]
    assert d.column("decoded_h")[first_ppm].as_py() == img.shape[0]

    f = MediaFeatures()(d)
    feats = f.column("features")
    assert pa.types.is_fixed_size_list(feats.type) and feats.type.list_size == 32
    v = np.array(feats[0].as_py())
    assert abs(np.linalg.norm(v) - 1.0) < 1e-5

    r = MediaResize(target=(64, 64))(t)
    for i, mt in enumerate(types):
        if mt == "image/x-portable-pixmap":
            assert r.column("width")[i].as_py() == 64
            resized = mm.ppm_decode(r.column("payload")[i].as_py())
            assert resized.shape == (64, 64, 3)

    fs = FrameSample(frames_per_clip=3)(t)
    assert fs.column_names == ["media_id", "frame_idx", "frame"]
    n_clips = sum(1 for x in types if x == "video/x-ppm-seq")
    assert fs.num_rows >= n_clips  # >=1 real frame per clip
    # Every sampled frame is itself a valid standalone PPM.
    for fr in fs.column("frame").to_pylist():
        mm.ppm_decode(fr)


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


def test_pil_probe_absent_keeps_stub_boundary():
    """Without Pillow (this container), png/jpeg stay at the explicit
    stub boundary: probe returns None, rows marked undecodable."""
    import parquet_go_ray.ops.multimodal as mm

    if mm.pil_image_module() is not None:
        pytest.skip("Pillow present in this environment")
    t = synthetic_media_table(30, seed=7)
    d = MediaDecode()(t)
    mask = np.array(
        [m in ("image/png", "image/jpeg") for m in t.column("media_type").to_pylist()]
    )
    ok = np.array(d.column("decode_ok").to_pylist())
    assert not ok[mask].any()


def test_pil_probe_plumbing_with_fake_module(monkeypatch):
    """Drive the Pillow code path end-to-end with a minimal fake Image
    module whose wire format is PPM — verifies decode/resize/feature
    plumbing (open/convert/fromarray/save calls, dimension flow) without
    the real dependency. With real Pillow installed the same code path
    runs against real png/jpeg (covered by the absent-path test's skip
    symmetry)."""
    import io

    import parquet_go_ray.ops.multimodal as mm

    class FakePilImage:
        def __init__(self, arr):
            self.arr = arr

        def convert(self, mode):
            assert mode == "RGB"
            return self.arr

        def save(self, sink, format=None):
            assert format in ("PNG", "JPEG")
            sink.write(mm.ppm_encode(self.arr))

    class FakeImageModule:
        @staticmethod
        def open(fp):
            return FakePilImage(mm.ppm_decode(fp.read()))

        @staticmethod
        def fromarray(arr):
            return FakePilImage(np.asarray(arr))

    monkeypatch.setattr(mm, "_PIL_TRIED", True)
    monkeypatch.setattr(mm, "_PIL_IMAGE", FakeImageModule)

    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (20, 30, 3), dtype=np.uint8)
    t = pa.Table.from_pylist(
        [
            {
                "media_id": 1,
                "media_type": "image/png",
                "payload": mm.ppm_encode(img),
                "width": 30,
                "height": 20,
                "duration_ms": 0,
            },
            {
                "media_id": 2,
                "media_type": "image/jpeg",
                "payload": b"\x00corrupt",
                "width": 1,
                "height": 1,
                "duration_ms": 0,
            },
        ],
        schema=mm.MEDIA_SCHEMA,
    )
    d = MediaDecode()(t)
    assert d.column("decode_ok").to_pylist() == [True, False]
    assert d.column("decoded_w").to_pylist()[0] == 30
    assert d.column("decoded_h").to_pylist()[0] == 20

    r = mm.MediaResize(target=(8, 6))(t)
    out = mm.ppm_decode(r.column("payload")[0].as_py())
    assert out.shape == (6, 8, 3)
    assert r.column("width").to_pylist() == [8, 1]  # corrupt row untouched

    f = MediaFeatures()(t)
    v = np.array(f.column("features")[0].as_py(), dtype=np.float32)
    assert np.isfinite(v).all() and abs(np.linalg.norm(v) - 1.0) < 1e-5
