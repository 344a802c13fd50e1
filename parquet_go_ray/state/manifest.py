"""Checkpoint / lineage manifest: per-partition resume support.

The reference has no checkpointing (SURVEY.md §4.1); the north rule
requires it: every partition records lineage (input fragment ids, codec
choice per column, symbol-table hashes, byte counts) so an interrupted
``ray job submit`` run resumes without re-encoding completed partitions.

Layout (all writes atomic via write-tmp + rename; safe under concurrent
Ray tasks because each partition writes only its own pair of files):

    <checkpoint_dir>/blobs/part-<pid>.blob
    <checkpoint_dir>/manifest/part-<pid>.json

A partition counts as completed only when its manifest JSON exists — the
blob is renamed into place first, so a crash between the two leaves a
re-doable partition, never a dangling manifest entry.
"""

from __future__ import annotations

import json
import os
import time
import uuid

__all__ = [
    "blob_path",
    "entry_path",
    "completed_partitions",
    "write_partition",
    "read_entry",
    "read_manifest",
]


def _ensure_dirs(checkpoint_dir: str) -> None:
    os.makedirs(os.path.join(checkpoint_dir, "blobs"), exist_ok=True)
    os.makedirs(os.path.join(checkpoint_dir, "manifest"), exist_ok=True)


def blob_path(checkpoint_dir: str, pid: str) -> str:
    return os.path.join(checkpoint_dir, "blobs", f"part-{pid}.blob")


def entry_path(checkpoint_dir: str, pid: str) -> str:
    return os.path.join(checkpoint_dir, "manifest", f"part-{pid}.json")


def completed_partitions(checkpoint_dir: str) -> set[str]:
    mdir = os.path.join(checkpoint_dir, "manifest")
    if not os.path.isdir(mdir):
        return set()
    out = set()
    for name in os.listdir(mdir):
        if name.startswith("part-") and name.endswith(".json"):
            out.add(name[len("part-") : -len(".json")])
    return out


def _atomic_write(path: str, data: bytes) -> None:
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "wb") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def write_partition(
    checkpoint_dir: str,
    pid: str,
    blob: bytes,
    meta: dict,
    input_fragments: list[str] | None = None,
    raw_bytes: int | None = None,
) -> dict:
    """Atomically persist a partition blob + its lineage entry."""
    _ensure_dirs(checkpoint_dir)
    entry = {
        "partition_id": pid,
        "input_fragments": input_fragments or [],
        "raw_bytes": raw_bytes,
        "finished_at": time.time(),
        **meta,
    }
    _atomic_write(blob_path(checkpoint_dir, pid), blob)
    _atomic_write(
        entry_path(checkpoint_dir, pid),
        json.dumps(entry, separators=(",", ":")).encode(),
    )
    return entry


def read_entry(checkpoint_dir: str, pid: str) -> dict:
    with open(entry_path(checkpoint_dir, pid), "rb") as f:
        return json.loads(f.read().decode())


def read_manifest(checkpoint_dir: str) -> dict[str, dict]:
    return {
        pid: read_entry(checkpoint_dir, pid)
        for pid in sorted(completed_partitions(checkpoint_dir))
    }
