"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The engine treats media as ``binary`` columns (they flow through the same
codec layer — the auto-selector lands on plain/zstd for high-entropy
payloads and dict for repeated assets) with a ``media_type`` metadata
column. Decode / feature-extract / resize / frame-sample are actor-pool
``map_batches`` stages: the Ray-side plumbing (schemas, constructor-time
setup, batch sizing, output layout) is real and tested; the pixel/sample
work itself is STUBBED because no image/audio library exists in this
container — each stage either raises ``NotImplementedError`` (strict
mode) or produces a clearly-marked deterministic fake so pipelines can be
exercised end-to-end.

At 100 TB: media batches are large; callers should pass a small
``batch_size`` (bytes dominate rows) and size ``concurrency`` so
batch_bytes × pool_size fits worker heaps — see MediaStage.recommended().
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("media_type", pa.string()),  # 'image/png', 'audio/wav', ...
        pa.field("payload", pa.binary()),
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
        pa.field("duration_ms", pa.int32()),
    ]
)


def synthetic_media_table(n: int, seed: int = 0) -> pa.Table:
    """Deterministic fake media corpus for tests/benchmarks."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image/png", "image/jpeg", "audio/wav", "video/mp4"])
    types = kinds[rng.integers(0, len(kinds), n)]
    sizes = rng.integers(256, 8192, n)
    payloads = [rng.integers(0, 256, s).astype(np.uint8).tobytes() for s in sizes]
    return pa.Table.from_arrays(
        [
            pa.array(np.arange(n), pa.int64()),
            pa.array(types, pa.string()),
            pa.array(payloads, pa.binary()),
            pa.array(rng.integers(16, 1024, n).astype(np.int32)),
            pa.array(rng.integers(16, 1024, n).astype(np.int32)),
            pa.array(rng.integers(0, 60_000, n).astype(np.int32)),
        ],
        schema=MEDIA_SCHEMA,
    )


class MediaStage:
    """Base actor for media map_batches stages.

    __init__ runs ONCE per actor (the place a real deployment loads
    libjpeg/ffmpeg/a model); __call__ runs per batch. ``strict=True``
    raises NotImplementedError at the stub boundary instead of faking.
    """

    def __init__(self, strict: bool = False):
        self.strict = strict
        # Real deployments load decoders/models here, once per actor.
        self._setup_done = True

    def _stub(self, what: str):
        if self.strict:
            raise NotImplementedError(
                f"{what}: media libraries are not available in this "
                "environment; wire a real decoder here"
            )

    @staticmethod
    def recommended(avg_payload_bytes: int, worker_heap_bytes: int = 2 << 30):
        """Suggested (batch_size, concurrency) so batches fit the heap."""
        batch_size = max(1, min(256, worker_heap_bytes // (8 * avg_payload_bytes)))
        return batch_size, (1, 8)


class MediaDecode(MediaStage):
    """payload → decoded dims + validity. STUB: parses nothing; emits a
    deterministic fake decode status from the payload hash."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        self._stub("decode")
        payloads = batch.column("payload")
        ok = []
        checksums = []
        for p in payloads:
            b = p.as_py() or b""
            h = hashlib.sha1(b).digest()
            checksums.append(h.hex()[:16])
            ok.append(len(b) > 0 and h[0] != 0)  # FAKE decode success flag
        out = batch.append_column("decode_ok", pa.array(ok, pa.bool_()))
        return out.append_column("checksum", pa.array(checksums, pa.string()))


class MediaFeatures(MediaStage):
    """payload → fixed-size feature vector. STUB: 32-bin byte histogram
    (deterministic, vectorized) standing in for a real embedding model."""

    DIM = 32

    def __call__(self, batch: pa.Table) -> pa.Table:
        self._stub("feature-extract")
        feats = []
        for p in batch.column("payload"):
            b = np.frombuffer(p.as_py() or b"\x00", dtype=np.uint8)
            hist = np.bincount(b >> 3, minlength=self.DIM)[: self.DIM]
            v = hist.astype(np.float32)
            n = np.linalg.norm(v)
            feats.append(v / n if n else v)
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(np.concatenate(feats), pa.float32()), self.DIM
        )
        return batch.append_column("features", col)


class MediaResize(MediaStage):
    """image resize stage. STUB: passes payload through and rewrites the
    dimension metadata deterministically."""

    def __init__(self, target: tuple[int, int] = (224, 224), strict: bool = False):
        super().__init__(strict)
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        self._stub("resize")
        n = batch.num_rows
        w = pa.array(np.full(n, self.target[0], dtype=np.int32))
        h = pa.array(np.full(n, self.target[1], dtype=np.int32))
        out = batch.set_column(batch.column_names.index("width"), "width", w)
        return out.set_column(out.column_names.index("height"), "height", h)


class FrameSample(MediaStage):
    """video → sampled frame rows (flat_map shape: one row per frame).
    STUB: deterministic byte-slices of the payload stand in for frames."""

    def __init__(self, frames_per_clip: int = 4, strict: bool = False):
        super().__init__(strict)
        self.k = frames_per_clip

    def __call__(self, batch: pa.Table) -> pa.Table:
        self._stub("frame-sample")
        ids, fidx, frames = [], [], []
        for mid, mtype, p in zip(
            batch.column("media_id"),
            batch.column("media_type"),
            batch.column("payload"),
        ):
            if mtype.as_py() != "video/mp4":
                continue
            b = p.as_py() or b""
            step = max(1, len(b) // self.k)
            for i in range(self.k):
                ids.append(mid.as_py())
                fidx.append(i)
                frames.append(b[i * step : (i + 1) * step])  # FAKE frame bytes
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
