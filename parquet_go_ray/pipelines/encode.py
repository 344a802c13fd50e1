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


def _list_parquet_files(input_path: str | list[str]) -> list[str]:
    """Expand dir / file / list-of-either into a sorted file list
    (local filesystem; remote URIs take the unfused read path)."""
    paths = [input_path] if isinstance(input_path, str) else list(input_path)
    out: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            out += sorted(
                os.path.join(p, f)
                for f in os.listdir(p)
                if f.endswith(".parquet")
            )
        else:
            out.append(p)
    return out


def _read_footers(input_files: list[str]) -> list[list[int]]:
    """Per-file row-group row counts. Footers are read driver-side in a
    small thread pool — one ~8 KB tail read per file; at real scale this
    planning would itself shard over files, but it is metadata-only."""
    from concurrent.futures import ThreadPoolExecutor

    import pyarrow.parquet as pq

    def rg_rows(p: str) -> list[int]:
        md = pq.ParquetFile(p).metadata
        return [md.row_group(i).num_rows for i in range(md.num_row_groups)]

    with ThreadPoolExecutor(max(1, min(16, len(input_files)))) as ex:
        return list(ex.map(rg_rows, input_files))


def _plan_read_splits(
    per_file: list[list[int]], total_rows: int, target_splits: int
) -> list[dict]:
    """Row-group-aligned read splits of ~equal row counts (the fused
    analogue of the reference's row-group iterator walk,
    file-reader.go:193-253)."""
    per_split = max(1, total_rows // max(1, target_splits))
    items: list[dict] = []
    for src, rows in enumerate(per_file):
        cur: list[int] = []
        cur_rows = 0
        for g, n in enumerate(rows):
            cur.append(g)
            cur_rows += n
            if cur_rows >= per_split:
                items.append({"_src": src, "_rgs": cur, "_rows": cur_rows})
                cur, cur_rows = [], 0
        if cur:
            items.append({"_src": src, "_rgs": cur, "_rows": cur_rows})
    return items


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
    fused_read: bool = True,
    exchange: str | None = None,
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
    byte-identical across all exchange modes (pinned test).

    ``fused_read`` (default; local-path inputs with ``two_phase``):
    parquet decode + bucket assignment + fragment encode run in ONE
    task per row-group-aligned split, so raw rows never materialize in
    the object store — see ``stages/encoder.py:fused_read_fragments``
    for the measured kernel-contention rationale."""
    t0 = time.time()
    read_items = None
    if isinstance(input_path, ray.data.Dataset):
        fused_read = False
        ds = input_path
        input_files = ds.input_files()
        total_rows = ds.count()
    else:
        if fused_read and two_phase:
            files = _list_parquet_files(input_path)
            fused_read = bool(files) and all(os.path.exists(p) for p in files)
        else:
            fused_read = False
        if fused_read:
            input_files = files
            per_file = _read_footers(files)
            total_rows = sum(sum(r) for r in per_file)
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
        if fused_read:
            # Fused source: read splits become descriptor rows; the
            # parquet decode happens inside the fragment task (see
            # stages/encoder.py:fused_read_fragments) so raw rows never
            # enter the object store.
            read_items = _plan_read_splits(per_file, total_rows, blocks)
        else:
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

    if read_items is None:
        path_index = (
            {p: i for i, p in enumerate(input_files)} if lineage_paths else None
        )
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

            ds = ds.map_batches(
                _drop_done, batch_format="pyarrow", zero_copy_batch=True
            )

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
            fused_read_fragments,
        )

        if fragment_refs:
            holder = FragmentRefHolder.remote()
            # ray.put(_owner=holder) needs a LIVE owner: block until the
            # actor is scheduled ("worker_id is empty" race otherwise).
            ray.get(holder.add.remote([]))
            actor_kwargs = {**actor_kwargs, "fragment_refs": True}
        if exchange is None:
            # Auto: the ref exchange ships only metadata through the
            # all-to-all, so the direct (map-output-tracker) exchange
            # replaces the sort shuffle's fixed coordination barrier
            # with a driver-side dict + elastic merge tasks.
            exchange = "direct" if fragment_refs else "sort"
        if exchange == "direct" and not fragment_refs:
            raise ValueError(
                "exchange='direct' requires fragment_refs=True — inline "
                "fragments would materialize the data on the driver"
            )
        if read_items is not None:
            ds = ray.data.from_items(
                read_items, override_num_blocks=len(read_items)
            ).map_batches(
                fused_read_fragments,
                fn_kwargs={
                    "paths": input_files,
                    "columns": columns,
                    "num_buckets": num_buckets,
                    "key": key,
                    "turn_col": turn_col,
                    "turns_per_salt": turns_per_salt,
                    "lineage": lineage_paths,
                    "done_ids": sorted(int(p) for p in completed) or None,
                    "holder": holder,
                },
                batch_size=1,
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
        elif holder is not None:
            ds = ds.map_batches(
                encode_fragments_refs,
                fn_kwargs={"holder": holder},
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
        else:
            ds = ds.map_batches(
                encode_fragments, batch_format="pyarrow", zero_copy_batch=True
            )
        if exchange == "direct":
            from ..stages.encoder import merge_encode_task

            # Map-output tracker: collect the METADATA-ONLY ref tables
            # (~250 B per (split, bucket) fragment), group by bucket on
            # the driver, launch one merge task per partition. Fragment
            # BYTES never touch the driver — merge tasks pull them
            # peer-to-peer from plasma (see merge_encode_task).
            meta_rows = ds.take_all()
            phase1_stats = ds.stats()
            phase1_cpu = sum(float(r.get("_cpu_s") or 0.0) for r in meta_rows)
            by_bucket: dict[int, list[dict]] = {}
            for r in meta_rows:
                by_bucket.setdefault(int(r[BUCKET_COL]), []).append(r)
            futs = [
                merge_encode_task.remote(rows_b, actor_kwargs)
                for _, rows_b in sorted(by_bucket.items())
            ]
            try:
                rows = ray.get(futs)
            finally:
                if holder is not None:
                    _release_holder(holder)
                    holder = None
            try:
                with open(os.path.join(checkpoint_dir, "stats.txt"), "w") as f:
                    f.write(phase1_stats)
            except Exception:
                pass
            merge_cpu = sum(float(r.get("cpu_s") or 0.0) for r in rows)
            return _finish(
                checkpoint_dir, rows, t0, num_buckets,
                extra={
                    # UDF CPU seconds (process_time inside the task
                    # bodies): the wall-noise-immune scaling signal —
                    # flat per row across cluster sizes ⇔ no
                    # contention-induced work inflation (VERDICT r2 #1).
                    "phase1_cpu_s": round(phase1_cpu, 3),
                    "merge_cpu_s": round(merge_cpu, 3),
                    "udf_cpu_s": round(phase1_cpu + merge_cpu, 3),
                },
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
            _release_holder(holder)
    try:  # per-stage wall/UDF times for throughput tuning (observability)
        with open(os.path.join(checkpoint_dir, "stats.txt"), "w") as f:
            f.write(summaries.stats())
    except Exception:
        pass
    return _finish(checkpoint_dir, rows, t0, num_buckets)


def _release_holder(holder) -> None:
    """Release the fragment objects pinned by the holder actor.

    Graceful (``clear()`` + handle drop → normal actor exit), NOT
    ``ray.kill``: abruptly killing an actor that owns objects while
    late fire-and-forget ``add`` replies are still in flight has been
    observed to corrupt driver task-manager state in this Ray build
    (fatal ``CompletePendingTask`` check during later datasets)."""
    try:
        ray.get(holder.clear.remote(), timeout=30)
    except Exception:
        ray.kill(holder)  # last resort: reclaim the pinned memory


def _finish(checkpoint_dir: str, rows: list[dict], t0: float,
            num_buckets: int, extra: dict | None = None) -> dict:
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
    if extra:
        summary.update(extra)
    with open(os.path.join(checkpoint_dir, "metrics.json"), "w") as f:
        json.dump(summary, f, indent=2)
    return summary
