"""Block compression over encoded column segments.

Mirrors the reference's BlockCompressor registry
(/root/reference/compression/compressor.go:3-6, registry at
file-reader.go:316-325; codecs compression/{snappy,gzip,brotli,lz4,zstd}.go)
using pyarrow's C++ codecs — same algorithms, no extra dependencies.
LZO stays unimplemented exactly as in the reference (enum only,
parquet/parquet.go:449).

Compressed segments record their uncompressed size in the blob manifest
(pyarrow decompression requires it, and the reference's page reader
validates it the same way at layout/block.go:17-47).
"""

from __future__ import annotations

import pyarrow as pa

__all__ = ["compress", "decompress", "available_codecs", "NONE"]

import os

NONE = "none"
_NAMES = ("zstd", "snappy", "gzip", "brotli", "lz4")
# zstd level 3: measured 17% smaller than level 1 on transcript text at
# still-sequential-read-friendly 150+ MB/s; levels ≥6 gain <1% more.
# Env-overridable so benchmark children can sweep it (workers re-read it).
# r4 A/B on the full 32-CPU pipeline: level 2 saves no wall time there
# (the encode stage isn't the bottleneck at bench sizes) but costs
# +4.6% blob size (44.98 -> 47.06 B/turn) — keep 3; PGR_ZSTD_LEVEL
# remains the knob for compute-bound deployments.
_LEVELS = {"zstd": int(os.environ.get("PGR_ZSTD_LEVEL", "3"))}


def available_codecs() -> list[str]:
    out = [NONE]
    for name in _NAMES:
        try:
            if pa.Codec.is_available(name):
                out.append(name)
        except Exception:
            pass
    return out


def compress(data: bytes, codec: str) -> bytes:
    if codec == NONE:
        return data
    level = _LEVELS.get(codec)
    c = pa.Codec(codec, compression_level=level) if level else pa.Codec(codec)
    return c.compress(data, asbytes=True)


def decompress(data: bytes, codec: str, uncompressed_size: int) -> bytes:
    if codec == NONE:
        return data
    if uncompressed_size < 0:
        raise ValueError(f"invalid uncompressed size {uncompressed_size}")
    try:
        out = pa.Codec(codec).decompress(data, uncompressed_size, asbytes=True)
    except (OSError, pa.ArrowException) as e:
        # Normalize codec-library failures on corrupt blocks into the
        # decoder error contract (never a raw OSError to the caller —
        # the size validation the reference does at layout/block.go:17-47).
        raise ValueError(f"corrupt {codec} block: {e}") from e
    if len(out) != uncompressed_size:
        raise ValueError(
            f"decompressed size mismatch: {len(out)} != {uncompressed_size}"
        )
    return out
