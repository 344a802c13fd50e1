"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The engine treats media as ``binary`` columns (they flow through the same
codec layer — the auto-selector lands on plain/zstd for high-entropy
payloads and dict for repeated assets) with a ``media_type`` metadata
column. Decode / feature-extract / resize / frame-sample are actor-pool
``map_batches`` stages.

REAL decode paths (pure numpy, no external media libraries needed):

- ``image/x-portable-pixmap`` — binary PPM (P6): header parse + pixel
  buffer → (h, w, 3) uint8; resize = vectorized nearest-neighbor.
- ``audio/wav`` — RIFF/PCM16: chunk walk → int16 sample array + rate;
  features = RMS / zero-crossing rate / FFT band energies (np.fft).
- ``video/x-ppm-seq`` — a concatenated sequence of PPM frames (the
  deterministic stand-in clip container); frame sampling parses and
  returns REAL frames.

Library-dependent formats: png/jpeg decode/resize/features use Pillow
WHEN IMPORTABLE (optional-dependency probe, once per actor — see
``pil_image_module``); without it, and always for mp4, the explicit
stub boundary applies: ``strict=True`` raises NotImplementedError,
otherwise the stages mark the row undecodable — honest, not
fake-successful.

At 100 TB: media batches are large; callers should pass a small
``batch_size`` (bytes dominate rows) and size ``concurrency`` so
batch_bytes × pool_size fits worker heaps — see MediaStage.recommended().
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

import ray

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("media_type", pa.string()),  # 'image/x-portable-pixmap', ...
        pa.field("payload", pa.binary()),
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("duration_ms", pa.int32()),
    ]
)

PPM_TYPE = "image/x-portable-pixmap"
WAV_TYPE = "audio/wav"
CLIP_TYPE = "video/x-ppm-seq"

_PIL_IMAGE = None
_PIL_TRIED = False


def pil_image_module():
    """Optional-dependency probe: Pillow's ``Image`` module when
    importable, else ``None`` (probed once per process). When present,
    the media stages decode/resize png+jpeg for real; when absent, the
    explicit stub boundary stays authoritative — a deployment gets real
    decode simply by installing Pillow, with no hard dependency here."""
    global _PIL_IMAGE, _PIL_TRIED
    if not _PIL_TRIED:
        _PIL_TRIED = True
        try:
            from PIL import Image  # type: ignore

            _PIL_IMAGE = Image
        except ImportError:
            _PIL_IMAGE = None
    return _PIL_IMAGE


# ---------------------------------------------------------------------------
# Pure-numpy codecs


def ppm_encode(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary PPM (P6)."""
    h, w, c = img.shape
    if c != 3:
        raise ValueError("PPM requires 3 channels")
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def _ppm_header(data: bytes, pos: int = 0) -> tuple[int, int, int]:
    """Parse a P6 header starting at byte offset ``pos``: magic, width,
    height, maxval — whitespace-separated (comments allowed), then exactly
    one whitespace byte before the pixel data. Returns (width, height,
    absolute_pixel_offset); raises ValueError on corrupt input (the
    column-codec error contract). Parsing at an offset avoids copying the
    payload tail per frame in clip walks."""
    if data[pos : pos + 2] != b"P6":
        raise ValueError("not a P6 PPM")
    fields: list[int] = []
    pos += 2
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if pos < len(data) and data[pos : pos + 1] == b"#":  # comment
            nl = data.find(b"\n", pos)
            if nl < 0:
                raise ValueError("truncated PPM comment")
            pos = nl + 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        fields.append(int(data[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255 or w <= 0 or h <= 0:
        raise ValueError(f"unsupported PPM (w={w} h={h} maxval={maxval})")
    return w, h, pos


def ppm_decode(data: bytes, pos: int = 0) -> np.ndarray:
    """Binary PPM (P6) starting at ``pos`` → (h, w, 3) uint8."""
    w, h, px = _ppm_header(data, pos)
    need = w * h * 3
    if len(data) - px < need:
        raise ValueError("truncated PPM pixel data")
    return (
        np.frombuffer(data, dtype=np.uint8, count=need, offset=px)
        .reshape(h, w, 3)
        .copy()
    )


def ppm_payload_size(data: bytes, pos: int = 0) -> int:
    """Byte length of the PPM frame starting at ``pos`` (for clip walks)."""
    w, h, px = _ppm_header(data, pos)
    return (px - pos) + w * h * 3


def resize_nearest(img: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Vectorized nearest-neighbor resize of (h, w, 3) → (th, tw, 3)."""
    h, w, _ = img.shape
    ys = (np.arange(th) * h // th).clip(0, h - 1)
    xs = (np.arange(tw) * w // tw).clip(0, w - 1)
    return img[ys[:, None], xs[None, :]]


def wav_encode_pcm16(samples: np.ndarray, rate: int) -> bytes:
    """int16 mono samples → RIFF/WAVE PCM16 bytes."""
    data = samples.astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF",
        36 + len(data),
        b"WAVE",
        b"fmt ",
        16,
        1,  # PCM
        1,  # mono
        rate,
        rate * 2,
        2,
        16,
        b"data",
        len(data),
    )
    return hdr + data


def wav_decode_pcm16(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 → (int16 samples, sample_rate). Walks the chunk
    list like a real parser (fmt may not be first)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    rate = None
    channels = None
    bits = None
    samples = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if size < 16 or len(body) < 16:
                # len(body) < 16 ⇔ the declared size overruns the payload
                # (truncated WAV): still a ValueError, not struct.error —
                # the media stages' undecodable-row contract depends on it.
                raise ValueError("short or truncated fmt chunk")
            fmt, channels, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if fmt != 1 or bits != 16:
                raise ValueError(f"unsupported WAV (fmt={fmt}, bits={bits})")
        elif cid == b"data":
            samples = np.frombuffer(body[: len(body) - (len(body) % 2)], dtype="<i2")
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    if channels and channels > 1:
        samples = samples[:: channels]  # take channel 0
    return samples.astype(np.int16), int(rate)


def clip_encode(frames: list[np.ndarray]) -> bytes:
    """List of (h, w, 3) frames → concatenated-PPM clip payload."""
    return b"".join(ppm_encode(f) for f in frames)


def clip_frames(data: bytes) -> list[np.ndarray]:
    """Parse every PPM frame of a clip payload. Headers are parsed at an
    offset into the shared buffer — no per-frame tail copy (O(total bytes)
    for the whole walk, not O(frames × clip_bytes))."""
    out = []
    pos = 0
    while pos < len(data):
        w, h, px = _ppm_header(data, pos)
        need = w * h * 3
        if len(data) - px < need:
            raise ValueError("truncated PPM pixel data")
        out.append(
            np.frombuffer(data, dtype=np.uint8, count=need, offset=px)
            .reshape(h, w, 3)
            .copy()
        )
        pos = px + need
    return out


# --- minimal ISO-BMFF (mp4) container ------------------------------------
#
# Frame DECODE needs real codecs (ffmpeg et al. — the documented stub
# boundary), but the container is pure structure: a box walk over
# [u32 size][4cc type][payload] with ftyp / moov{mvhd, trak{tkhd}}.
# mp4_parse makes metadata extraction REAL (duration, timescale, track
# count, first video track's 16.16-fixed dimensions); mp4_encode_meta
# emits a valid minimal container for the synthetic corpus.


def _box(typ: bytes, body: bytes) -> bytes:
    return (len(body) + 8).to_bytes(4, "big") + typ + body


_MP4_UNITY_MATRIX = (
    (0x00010000).to_bytes(4, "big") + bytes(4) * 2
    + bytes(4) + (0x00010000).to_bytes(4, "big") + bytes(4)
    + bytes(4) * 2 + (0x40000000).to_bytes(4, "big")
)


def mp4_encode_meta(width: int, height: int, duration_ms: int,
                    timescale: int = 1000, mdat: bytes = b"") -> bytes:
    """Minimal valid mp4: ftyp + moov{mvhd, trak{tkhd}} + mdat."""
    dur = duration_ms * timescale // 1000
    ftyp = _box(b"ftyp", b"isom" + (0x200).to_bytes(4, "big") + b"isomiso2")
    mvhd = _box(b"mvhd", bytes(4)                       # version 0 + flags
                + bytes(8)                              # ctime, mtime
                + timescale.to_bytes(4, "big")
                + dur.to_bytes(4, "big")
                + (0x00010000).to_bytes(4, "big")       # rate 1.0
                + (0x0100).to_bytes(2, "big")           # volume 1.0
                + bytes(10)                             # reserved
                + _MP4_UNITY_MATRIX
                + bytes(24)                             # pre_defined
                + (2).to_bytes(4, "big"))               # next_track_ID
    tkhd = _box(b"tkhd", b"\x00\x00\x00\x07"            # v0, enabled
                + bytes(8)                              # ctime, mtime
                + (1).to_bytes(4, "big")                # track_ID
                + bytes(4)
                + dur.to_bytes(4, "big")
                + bytes(8) + bytes(2) * 4               # layer/group/vol/rsv
                + _MP4_UNITY_MATRIX
                + (width << 16).to_bytes(4, "big")      # 16.16 fixed
                + (height << 16).to_bytes(4, "big"))
    moov = _box(b"moov", mvhd + _box(b"trak", tkhd))
    return ftyp + moov + _box(b"mdat", mdat)


def _walk_boxes(data, pos: int, end: int):
    while pos + 8 <= end:
        size = int.from_bytes(data[pos:pos + 4], "big")
        typ = bytes(data[pos + 4:pos + 8])
        body = pos + 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                raise ValueError("truncated mp4 largesize box")
            size = int.from_bytes(data[pos + 8:pos + 16], "big")
            body = pos + 16
        elif size == 0:  # to end of enclosing box
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError("malformed mp4 box size")
        yield typ, body, pos + size
        pos += size


def mp4_parse(data: bytes) -> dict:
    """Container metadata from the box structure (no codec work):
    ``{brand, timescale, duration_ms, n_tracks, width, height}``."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an mp4 (missing ftyp)")
    out = {"brand": bytes(data[8:12]).decode("latin1"), "timescale": 0,
           "duration_ms": 0, "n_tracks": 0, "width": 0, "height": 0}
    moov = None
    for typ, body, nxt in _walk_boxes(data, 0, len(data)):
        if typ == b"moov":
            moov = (body, nxt)
    if moov is None:
        raise ValueError("mp4 without moov")
    for typ, body, nxt in _walk_boxes(data, moov[0], moov[1]):
        if typ == b"mvhd":
            v = data[body]
            off = body + 4 + (16 if v == 1 else 8)
            ts = int.from_bytes(data[off:off + 4], "big")
            dur_off = off + 4
            dur = int.from_bytes(
                data[dur_off:dur_off + (8 if v == 1 else 4)], "big"
            )
            out["timescale"] = ts
            out["duration_ms"] = (dur * 1000 // ts) if ts else 0
        elif typ == b"trak":
            out["n_tracks"] += 1
            for t2, b2, _ in _walk_boxes(data, body, nxt):
                if t2 == b"tkhd":
                    v = data[b2]
                    # width/height are the last 8 bytes, 16.16 fixed
                    # (v0 body: 4+4+4+4+4+4+8+2+2+2+2+36 = 76; v1: 88)
                    whoff = b2 + (88 if v == 1 else 76)
                    w = int.from_bytes(data[whoff:whoff + 4], "big") >> 16
                    h = int.from_bytes(data[whoff + 4:whoff + 8], "big") >> 16
                    if not out["width"]:
                        out["width"], out["height"] = w, h
    return out


# ---------------------------------------------------------------------------


def synthetic_media_table(n: int, seed: int = 0) -> pa.Table:
    """Deterministic synthetic media corpus with REAL decodable payloads:
    PPM gradient images, PCM16 sine-wave WAVs, PPM-sequence clips, plus a
    slice of library-dependent types (png/jpeg/mp4 random bytes) that
    exercise the stub boundary."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        kind = i % 5
        if kind in (0, 1):  # PPM image
            w, h = int(rng.integers(8, 48)), int(rng.integers(8, 48))
            x = np.arange(w, dtype=np.uint8)[None, :, None]
            y = np.arange(h, dtype=np.uint8)[:, None, None]
            img = np.concatenate(
                [
                    np.broadcast_to((x * 3 + i) % 256, (h, w, 1)),
                    np.broadcast_to((y * 5 + i) % 256, (h, w, 1)),
                    np.broadcast_to((x + y + i) % 256, (h, w, 1)),
                ],
                axis=2,
            ).astype(np.uint8)
            rows.append((i, PPM_TYPE, ppm_encode(img), w, h, 0))
        elif kind == 2:  # WAV sine
            rate = 8000
            dur_ms = int(rng.integers(50, 400))
            t = np.arange(rate * dur_ms // 1000)
            freq = 100 + (i % 20) * 50
            s = (np.sin(2 * np.pi * freq * t / rate) * 12000).astype(np.int16)
            rows.append((i, WAV_TYPE, wav_encode_pcm16(s, rate), 0, 0, dur_ms))
        elif kind == 3:  # PPM-sequence clip
            w, h = 16, 12
            frames = [
                np.full((h, w, 3), (i + f * 17) % 256, dtype=np.uint8)
                for f in range(int(rng.integers(4, 9)))
            ]
            rows.append((i, CLIP_TYPE, clip_encode(frames), w, h, len(frames) * 40))
        elif i % 3 == 2:  # REAL minimal mp4 container (metadata parses;
            # frame decode stays the codec stub boundary)
            w, h = int(rng.integers(64, 1920)), int(rng.integers(64, 1080))
            dur_ms = int(rng.integers(500, 60_000))
            filler = rng.integers(0, 256, int(rng.integers(64, 512))).astype(
                np.uint8
            ).tobytes()
            rows.append((i, "video/mp4",
                         mp4_encode_meta(w, h, dur_ms, mdat=filler),
                         w, h, dur_ms))
        else:  # library-dependent formats: stub boundary
            mt = ["image/png", "image/jpeg"][i % 2]
            payload = rng.integers(0, 256, int(rng.integers(256, 2048))).astype(
                np.uint8
            ).tobytes()
            rows.append((i, mt, payload, 0, 0, 0))
    cols = list(zip(*rows))
    return pa.Table.from_arrays(
        [
            pa.array(cols[0], pa.int64()),
            pa.array(cols[1], pa.string()),
            pa.array(cols[2], pa.binary()),
            pa.array(np.array(cols[3], dtype=np.int32)),
            pa.array(np.array(cols[4], dtype=np.int32)),
            pa.array(np.array(cols[5], dtype=np.int32)),
        ],
        schema=MEDIA_SCHEMA,
    )


class MediaStage:
    """Base actor for media map_batches stages.

    __init__ runs ONCE per actor (the place a real deployment would load
    libjpeg/ffmpeg/a model); __call__ runs per batch. ``strict=True``
    raises NotImplementedError at the stub boundary (library-dependent
    formats) instead of marking the row undecodable.
    """

    def __init__(self, strict: bool = False):
        self.strict = strict
        # Optional decoders probe ONCE per actor (the actor-pool __init__
        # pattern); per-batch work never re-imports.
        self._pil = pil_image_module()
        self._setup_done = True

    def _pil_decode(self, b: bytes) -> np.ndarray | None:
        """png/jpeg bytes → (h, w, 3) uint8 via Pillow, or None if the
        payload is not decodable (Pillow raises a zoo of exception types
        on corrupt input; all map to the row-level undecodable mark)."""
        if self._pil is None:
            return None
        import io

        try:
            return np.asarray(self._pil.open(io.BytesIO(b)).convert("RGB"))
        except Exception:
            return None

    def _stub(self, what: str, media_type: str):
        if self.strict:
            raise NotImplementedError(
                f"{what} for {media_type}: no codec library in this "
                "environment; wire a real decoder here"
            )

    @staticmethod
    def recommended(avg_payload_bytes: int, worker_heap_bytes: int = 2 << 30):
        """Suggested (batch_size, concurrency) so batches fit the heap."""
        batch_size = max(1, min(256, worker_heap_bytes // (8 * avg_payload_bytes)))
        return batch_size, (1, 8)


class MediaDecode(MediaStage):
    """payload → decode status + content checksum + true dimensions.

    PPM/WAV/clip payloads are REALLY decoded (dimensions/duration come
    from the parsed media, not the metadata columns); png/jpeg/mp4 hit
    the stub boundary.
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        ok, checksums, widths, heights = [], [], [], []
        for mid, mtype, p in zip(
            batch.column("media_id"),
            batch.column("media_type"),
            batch.column("payload"),
        ):
            b = p.as_py() or b""
            mt = mtype.as_py()
            checksums.append(hashlib.sha1(b).hexdigest()[:16])
            try:
                if mt == PPM_TYPE:
                    img = ppm_decode(b)
                    heights.append(img.shape[0])
                    widths.append(img.shape[1])
                    ok.append(True)
                elif mt == WAV_TYPE:
                    samples, _ = wav_decode_pcm16(b)
                    widths.append(len(samples))
                    heights.append(0)
                    ok.append(True)
                elif mt == CLIP_TYPE:
                    frames = clip_frames(b)
                    heights.append(frames[0].shape[0] if frames else 0)
                    widths.append(frames[0].shape[1] if frames else 0)
                    ok.append(bool(frames))
                elif mt == "video/mp4":
                    # Container metadata is REAL (box walk: mvhd/tkhd);
                    # frame decode stays the codec stub boundary.
                    info = mp4_parse(b)
                    widths.append(info["width"])
                    heights.append(info["height"])
                    ok.append(info["n_tracks"] > 0)
                elif mt in ("image/png", "image/jpeg") and self._pil is not None:
                    img = self._pil_decode(b)
                    heights.append(img.shape[0] if img is not None else 0)
                    widths.append(img.shape[1] if img is not None else 0)
                    ok.append(img is not None)
                else:
                    self._stub("decode", mt)
                    widths.append(0)
                    heights.append(0)
                    ok.append(False)  # honestly undecodable here
            except ValueError:
                widths.append(0)
                heights.append(0)
                ok.append(False)
        out = batch.append_column("decode_ok", pa.array(ok, pa.bool_()))
        out = out.append_column("checksum", pa.array(checksums, pa.string()))
        out = out.append_column("decoded_w", pa.array(widths, pa.int32()))
        return out.append_column("decoded_h", pa.array(heights, pa.int32()))


class MediaFeatures(MediaStage):
    """payload → fixed-size L2-normalized feature vector.

    Images: per-channel means + 3-level luminance pyramid energies.
    Audio: RMS, zero-crossing rate, and FFT band energies (np.fft).
    Other/undecodable: byte histogram (documented fallback).
    """

    DIM = 32

    def _image_features(self, img: np.ndarray) -> np.ndarray:
        v = np.zeros(self.DIM, dtype=np.float32)
        lum = img.mean(axis=2)
        v[0:3] = img.reshape(-1, 3).mean(axis=0)
        v[3] = lum.std()
        # 4x4 luminance grid → 16 dims of real spatial structure.
        g = resize_nearest(img, 4, 4).mean(axis=2).reshape(-1)
        v[4:20] = g
        v[20:23] = img.reshape(-1, 3).std(axis=0)
        return v

    def _audio_features(self, samples: np.ndarray, rate: int) -> np.ndarray:
        v = np.zeros(self.DIM, dtype=np.float32)
        x = samples.astype(np.float32) / 32768.0
        if len(x):
            v[0] = np.sqrt(np.mean(x * x))  # RMS
            v[1] = np.mean(np.abs(np.diff(np.signbit(x).astype(np.int8))))  # ZCR
            spec = np.abs(np.fft.rfft(x[: 1 << 12]))
            bands = np.array_split(spec, 16)
            v[2:18] = [float(b.mean()) for b in bands]
        return v

    def _byte_features(self, b: bytes) -> np.ndarray:
        arr = np.frombuffer(b or b"\x00", dtype=np.uint8)
        return np.bincount(arr >> 3, minlength=self.DIM)[: self.DIM].astype(
            np.float32
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for mtype, p in zip(batch.column("media_type"), batch.column("payload")):
            b = p.as_py() or b""
            mt = mtype.as_py()
            try:
                if mt == PPM_TYPE:
                    v = self._image_features(ppm_decode(b))
                elif mt == WAV_TYPE:
                    v = self._audio_features(*wav_decode_pcm16(b))
                elif mt == CLIP_TYPE:
                    frames = clip_frames(b)
                    v = (
                        np.mean([self._image_features(f) for f in frames], axis=0)
                        if frames
                        else self._byte_features(b)
                    )
                elif mt in ("image/png", "image/jpeg") and self._pil is not None:
                    img = self._pil_decode(b)
                    v = (
                        self._image_features(img)
                        if img is not None
                        else self._byte_features(b)
                    )
                else:
                    self._stub("feature-extract", mt)
                    v = self._byte_features(b)
            except ValueError:
                v = self._byte_features(b)
            n = np.linalg.norm(v)
            feats.append((v / n if n else v).astype(np.float32))
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(np.concatenate(feats), pa.float32()), self.DIM
        )
        return batch.append_column("features", col)


class MediaResize(MediaStage):
    """REAL nearest-neighbor resize for PPM images (payload is rewritten
    with the resized pixels); other formats hit the stub boundary and
    pass through unchanged."""

    def __init__(self, target: tuple[int, int] = (224, 224), strict: bool = False):
        super().__init__(strict)
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        tw, th = self.target
        payloads, widths, heights = [], [], []
        for mtype, p, w0, h0 in zip(
            batch.column("media_type"),
            batch.column("payload"),
            batch.column("width"),
            batch.column("height"),
        ):
            b = p.as_py() or b""
            mt = mtype.as_py()
            if mt == PPM_TYPE:
                try:
                    img = resize_nearest(ppm_decode(b), tw, th)
                    payloads.append(ppm_encode(img))
                    widths.append(tw)
                    heights.append(th)
                    continue
                except ValueError:
                    pass
            elif mt in ("image/png", "image/jpeg"):
                img = self._pil_decode(b)
                if img is not None:
                    # Re-encode via Pillow in the ORIGINAL format so the
                    # payload stays self-describing under its media_type.
                    import io

                    fmt = "PNG" if mt == "image/png" else "JPEG"
                    pimg = self._pil.fromarray(resize_nearest(img, tw, th))
                    sink = io.BytesIO()
                    pimg.save(sink, format=fmt)
                    payloads.append(sink.getvalue())
                    widths.append(tw)
                    heights.append(th)
                    continue
                self._stub("resize", mt)
            payloads.append(b)
            widths.append(w0.as_py())
            heights.append(h0.as_py())
        out = batch.set_column(
            batch.column_names.index("payload"), "payload", pa.array(payloads, pa.binary())
        )
        out = out.set_column(
            out.column_names.index("width"), "width", pa.array(widths, pa.int32())
        )
        return out.set_column(
            out.column_names.index("height"), "height", pa.array(heights, pa.int32())
        )


class FrameSample(MediaStage):
    """clip → sampled frame rows (flat_map shape: one row per frame).
    PPM-sequence clips yield REAL parsed frames (re-encoded as standalone
    PPM payloads); mp4 hits the stub boundary."""

    def __init__(self, frames_per_clip: int = 4, strict: bool = False):
        super().__init__(strict)
        self.k = frames_per_clip

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, fidx, frames = [], [], []
        for mid, mtype, p in zip(
            batch.column("media_id"),
            batch.column("media_type"),
            batch.column("payload"),
        ):
            mt = mtype.as_py()
            if mt == CLIP_TYPE:
                all_frames = clip_frames(p.as_py() or b"")
                if not all_frames:
                    continue
                step = max(1, len(all_frames) // self.k)
                for j, i in enumerate(range(0, len(all_frames), step)[: self.k]):
                    ids.append(mid.as_py())
                    fidx.append(j)
                    frames.append(ppm_encode(all_frames[i]))
            elif mt == "video/mp4":
                self._stub("frame-sample", mt)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(fidx, pa.int32()),
                "frame": pa.array(frames, pa.binary()),
            }
        )


def media_pipeline(
    ds: ray.data.Dataset,
    stage_cls,
    batch_size: int = 64,
    concurrency=(1, 8),
    **stage_kwargs,
) -> ray.data.Dataset:
    """Attach a media actor-pool stage with media-appropriate sizing."""
    return ds.map_batches(
        stage_cls,
        fn_constructor_kwargs=stage_kwargs,
        batch_size=batch_size,  # bytes dominate rows for media columns
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        num_cpus=1,
    )
