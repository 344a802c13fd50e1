"""Decode pipeline: partition blobs → a streaming ray.data.Dataset."""

from __future__ import annotations

import os

import ray

from ..stages.encoder import DecoderActor
from ..state import manifest as mf


def decode_pipeline(
    checkpoint_dir: str, concurrency: int | tuple[int, int] | None = None
) -> ray.data.Dataset:
    """Stream-decode every completed partition blob back to Arrow rows.

    One blob per input block; decode is a map_batches stage so the
    streaming executor pipelines I/O with the numpy decode kernels.
    """
    pids = sorted(mf.completed_partitions(checkpoint_dir))
    if not pids:
        raise FileNotFoundError(f"no completed partitions under {checkpoint_dir}")
    paths = [mf.blob_path(checkpoint_dir, pid) for pid in pids]
    ds = ray.data.read_binary_files(paths)
    return ds.map_batches(
        DecoderActor,
        batch_size=1,  # one blob per call; a blob is already ~250k rows
        batch_format="pyarrow",
        concurrency=concurrency or (1, 32),
        num_cpus=1,
    )
