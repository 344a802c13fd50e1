"""The flagship pipeline: transcript Parquet → encoded partition blobs.

Lifecycle (SURVEY.md §3.4):

    read_parquet (column-pruned, fragment-sharded)
      → map_batches(assign_buckets)        # salted conv_id hash, zero-copy Arrow
      → [resume] map_batches(filter)       # drop rows of completed partitions
      → groupby(_bucket).map_groups(EncoderActor, concurrency=N)
           # one all-to-all shuffle; per group: sort (conv_id, turn_idx),
           # auto-select codecs, encode, atomically write blob + lineage
      → summaries (one tiny row per partition) → driver aggregate

The ONLY full-data shuffle is the groupby; everything else is streaming
map_batches over zero-copy Arrow blocks. Skew is handled in the bucket
key itself (stages/salt.py). Memory: a group is bounded by
rows_per_partition plus the per-conversation salt cap.

This module never calls ray.init() — the driver owns the session.
"""

from __future__ import annotations

import json
import os
import time

import pyarrow as pa

import ray

from ..stages.encoder import EncoderActor
from ..stages.salt import BUCKET_COL, DEFAULT_TURNS_PER_SALT, assign_buckets
from ..state import manifest as mf

DEFAULT_ROWS_PER_PARTITION = 250_000


def encode_pipeline(
    input_path: str | list[str] | ray.data.Dataset,
    checkpoint_dir: str,
    *,
    columns: list[str] | None = None,
    key: str = "conv_id",
    turn_col: str = "turn_idx",
    rows_per_partition: int = DEFAULT_ROWS_PER_PARTITION,
    turns_per_salt: int = DEFAULT_TURNS_PER_SALT,
    num_buckets: int | None = None,
    concurrency: int | tuple[int, int] | None = None,
    choices: dict | None = None,
    lineage_paths: bool = True,
    two_phase: bool = True,
    fragment_refs: bool = True,
    page_rows: int | None = None,
    read_blocks: int | None = None,
) -> dict:
    """Run the encode job; returns the run summary (also written to
    ``<checkpoint_dir>/run.json``). Safe to re-run after interruption:
    completed partitions are filtered out before the shuffle.

    ``fragment_refs`` (default, requires ``two_phase``): the all-to-all
    ships ~200-byte ObjectRefs per fragment; fragment bytes move
    point-to-point producer→merge-actor through the object store (one
    plasma write + one pull) instead of riding through the sort
    barrier's copy chain. Measured at 8M turns / 2 CPUs: the exchange
    operator's wall drops from ~26s to sub-second, and blobs stay
    byte-identical across all three exchange modes (pinned test)."""
    t0 = time.time()
    if isinstance(input_path, ray.data.Dataset):
        ds = input_path
        input_files = ds.input_files()
        total_rows = ds.count()
    else:
        probe = ray.data.read_parquet(input_path, columns=columns)
        input_files = probe.input_files()
        total_rows = probe.count()  # parquet metadata only — no data read
        if num_buckets is None:
            num_buckets = max(1, -(-total_rows // rows_per_partition))
        # Shuffle cost scales with block COUNT, not just bytes. Two-phase
        # (compressed-fragment) exchange wants FEW, LARGE blocks — each
        # block emits one IPC fragment per bucket, so block count drives
        # both fragment count and all-to-all orchestration (measured
        # 184k→270k turns/s going 124→32 blocks at 32 CPUs). The raw-row
        # single-phase shuffle keeps the old 2-blocks-per-bucket shape.
        cpus = int(ray.cluster_resources().get("CPU", 8))
        if read_blocks is not None:
            # Fixed plan regardless of cluster size — the cluster-faithful
            # setting (a real deployment's block count comes from the data
            # layout, not the node count); scaling benchmarks use this so
            # both legs run the identical task graph.
            blocks = read_blocks
        elif two_phase:
            blocks = min(max(cpus, num_buckets // 4), 2 * cpus)
        else:
            blocks = max(cpus, 2 * num_buckets)
        blocks = min(blocks, max(1, total_rows // 5000))
        ds = ray.data.read_parquet(
            input_path,
            columns=columns,
            override_num_blocks=blocks,
            # per-partition lineage (compacted to int32 in the salt stage)
            include_paths=lineage_paths,
        )
    if num_buckets is None:
        num_buckets = max(1, -(-total_rows // rows_per_partition))

    os.makedirs(checkpoint_dir, exist_ok=True)
    run_path = os.path.join(checkpoint_dir, "run.json")
    run_cfg = {
        "num_buckets": num_buckets,
        "turns_per_salt": turns_per_salt,
        "key": key,
        "input_files": input_files,
    }
    if os.path.exists(run_path):
        with open(run_path) as f:
            prev = json.load(f)
        if prev["num_buckets"] != num_buckets or prev["turns_per_salt"] != turns_per_salt:
            raise ValueError(
                "resume config mismatch: partitioning params changed "
                f"({prev['num_buckets']}/{prev['turns_per_salt']} -> "
                f"{num_buckets}/{turns_per_salt}); use a fresh checkpoint dir"
            )
    else:
        with open(run_path, "w") as f:
            json.dump(run_cfg, f)

    completed = mf.completed_partitions(checkpoint_dir)

    path_index = {p: i for i, p in enumerate(input_files)} if lineage_paths else None
    ds = ds.map_batches(
        assign_buckets,
        fn_kwargs={
            "num_buckets": num_buckets,
            "key": key,
            "turn_col": turn_col,
            "turns_per_salt": turns_per_salt,
            "path_index": path_index,
        },
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    if completed:
        done_ids = {int(p) for p in completed}

        def _drop_done(batch: pa.Table) -> pa.Table:
            import numpy as np

            b = batch.column(BUCKET_COL).to_numpy(zero_copy_only=False)
            mask = ~np.isin(b, list(done_ids))
            return batch.filter(pa.array(mask))

        ds = ds.map_batches(_drop_done, batch_format="pyarrow", zero_copy_batch=True)

    actor_kwargs = {
        "checkpoint_dir": checkpoint_dir,
        "sort_keys": (key, turn_col),
        "choices": choices,
        "input_files": input_files,
        "page_rows": page_rows,
    }
    if concurrency is None:
        # A (1, N) autoscaling pool ramps from ONE actor and leaves most
        # cores idle through the whole merge stage (measured 78k→156k
        # turns/s at 32 CPUs); a fully-reserved pool starves the upstream
        # read/fragment tasks and deadlocks. Warm a quarter of the cores
        # up front and cap 2 below the cluster so tasks always fit.
        cpus = int(ray.cluster_resources().get("CPU", 8))
        if cpus <= 4:
            # Degenerate pool sizes: cpus-2 would cap the merge stage at
            # ONE actor on a 2-CPU box — post-barrier the map side is
            # done, so the full box may merge (autoscaler only adds the
            # extra actor once fragments queue; no upstream starvation —
            # measured 74.5s → 56s at 2 CPUs / 8M turns).
            concurrency = (1, cpus)
        else:
            concurrency = (max(1, cpus // 4), max(1, cpus - 2))
    holder = None
    if two_phase:
        # Two-phase shuffle (NOTES r1 item 4): compress (block, bucket)
        # fragments to zstd Arrow IPC BEFORE the all-to-all, so the
        # groupby moves ~blob-sized bytes instead of raw rows; the merge
        # actor re-sorts per partition, preserving the stable turn
        # ordering invariant. With fragment_refs the groupby moves only
        # refs and the bytes take one direct plasma hop.
        from ..stages.encoder import (
            FragmentRefHolder,
            MergeEncoderActor,
            encode_fragments,
            encode_fragments_refs,
        )

        if fragment_refs:
            holder = FragmentRefHolder.remote()
            # ray.put(_owner=holder) needs a LIVE owner: block until the
            # actor is scheduled ("worker_id is empty" race otherwise).
            ray.get(holder.add.remote([]))
            ds = ds.map_batches(
                encode_fragments_refs,
                fn_kwargs={"holder": holder},
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            actor_kwargs = {**actor_kwargs, "fragment_refs": True}
        else:
            ds = ds.map_batches(
                encode_fragments, batch_format="pyarrow", zero_copy_batch=True
            )
        summaries = ds.groupby(BUCKET_COL).map_groups(
            MergeEncoderActor,
            fn_constructor_kwargs=actor_kwargs,
            batch_format="pyarrow",
            concurrency=concurrency,
            num_cpus=1,
        )
    else:
        summaries = ds.groupby(BUCKET_COL).map_groups(
            EncoderActor,
            fn_constructor_kwargs=actor_kwargs,
            batch_format="pyarrow",
            # Autoscaling actor pool; encode is CPU-bound -> 1 CPU per actor.
            concurrency=concurrency,
            num_cpus=1,
        )
    try:
        rows = summaries.take_all()  # tiny: one row per partition
    finally:
        if holder is not None:
            # Release every pinned fragment object at once. The blobs are
            # on disk by now; nothing downstream reads the fragments.
            ray.kill(holder)
    try:  # per-stage wall/UDF times for throughput tuning (observability)
        with open(os.path.join(checkpoint_dir, "stats.txt"), "w") as f:
            f.write(summaries.stats())
    except Exception:
        pass

    encoded_rows = sum(r["rows"] for r in rows if not r["skipped"])
    blob_bytes = sum(r["blob_bytes"] for r in rows)
    raw_bytes = sum(r["raw_bytes"] for r in rows)
    elapsed = time.time() - t0
    summary = {
        "partitions": len(rows),
        "partitions_skipped": sum(1 for r in rows if r["skipped"]),
        "rows_total": int(sum(r["rows"] for r in rows)),
        "rows_encoded": int(encoded_rows),
        "raw_bytes": int(raw_bytes),
        "blob_bytes": int(blob_bytes),
        "elapsed_sec": elapsed,
        "turns_per_sec": (encoded_rows / elapsed) if elapsed > 0 else 0.0,
        "bytes_per_turn": (blob_bytes / max(1, sum(r["rows"] for r in rows))),
        "num_buckets": num_buckets,
    }
    with open(os.path.join(checkpoint_dir, "metrics.json"), "w") as f:
        json.dump(summary, f, indent=2)
    return summary
