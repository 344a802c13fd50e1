"""Benchmark harness. Prints ONE JSON line with per-query seconds.

Headline: the flagship transcripts encode pipeline (turns/sec) over a
deterministic synthetic transcript table sized to the scale factor of
$GRAFT_SF_DIR (cached under /tmp between runs), plus the engine ops over
the driver testdata tables.

  python bench.py              # bench at $GRAFT_SF_DIR (default sf0.1)
  python bench.py --scaling    # same encode job at 8 and 32 CPUs in
                               # fresh processes -> scaling efficiency

RAY_GRAFT_CPUS controls num_cpus (default 32). This script OWNS its Ray
session (init + shutdown) — library code never does.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
TURNS_PER_SF = 5_000_000  # sf0.1 -> 500k turns (headline bench)
SCALE_TURNS_PER_SF = int(os.environ.get("PGR_SCALE_TURNS", "20000000"))  # sf0.1 -> 2M turns (scaling runs need a
# compute-dominated job — tens of CPU-seconds of encode vs ~2s fixed
# pipeline cost — while keeping the 2-CPU leg inside the time budget)
SEED = 42


def sf_from_dir(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    if base.startswith("sf"):
        try:
            return float(base[2:])
        except ValueError:
            pass
    return 0.1


def transcripts_input_dir(sf: float, turns_per_sf: int = TURNS_PER_SF) -> str:
    """Generate (once, cached) the sharded transcript parquet for this sf.
    Shards generate as parallel Ray tasks when a session is active."""
    from parquet_go_ray.sources.transcripts import write_transcripts_parquet

    turns = max(2000, int(turns_per_sf * sf))
    path = f"/tmp/pgr_bench_transcripts_t{turns}_s{SEED}"
    marker = os.path.join(path, "_DONE")
    if not os.path.exists(marker):
        shutil.rmtree(path, ignore_errors=True)
        write_transcripts_parquet(path, turns, seed=SEED, shards=16)
        with open(marker, "w") as f:
            f.write(str(turns))
    return path


def run_encode(
    input_dir: str,
    concurrency=None,
    rows_per_partition: int = 100_000,
    choices: dict | None = None,
    read_blocks: int | None = None,
) -> dict:
    from parquet_go_ray.pipelines.encode import encode_pipeline

    ckpt = tempfile.mkdtemp(prefix="pgr_bench_ckpt_")
    try:
        return encode_pipeline(
            input_dir,
            ckpt,
            rows_per_partition=rows_per_partition,
            concurrency=concurrency,
            choices=choices,
            read_blocks=read_blocks,
        )
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


def bench_queries(sf_dir: str) -> tuple[dict, dict]:
    """Time the headline + op pipelines; returns (seconds, extras)."""
    import ray

    q: dict[str, float] = {}
    extras: dict = {}

    sf = sf_from_dir(sf_dir)
    tdir = transcripts_input_dir(sf)

    # Untimed warmup on the same input: Ray worker processes fault their
    # pages / import libraries on first use, then get reused warm. The
    # headline is the best of two steady-state runs (same as --scaling),
    # which shields against VM background noise.
    run_encode(tdir)

    best = None
    for _ in range(2):
        t0 = time.time()
        summary = run_encode(tdir)
        el = time.time() - t0
        best = el if best is None else min(best, el)
    q["encode_transcripts"] = best
    extras["turns_per_sec"] = summary["rows_encoded"] / best
    extras["bytes_per_turn"] = summary["bytes_per_turn"]
    extras["rows_encoded"] = summary["rows_encoded"]

    # Decode+verify throughput over a fresh checkpoint (kept this time).
    from parquet_go_ray.pipelines.decode import decode_pipeline
    from parquet_go_ray.pipelines.encode import encode_pipeline

    ckpt = tempfile.mkdtemp(prefix="pgr_bench_dec_")
    encode_pipeline(tdir, ckpt, rows_per_partition=100_000)
    t0 = time.time()
    decoded_rows = decode_pipeline(ckpt).count()
    q["decode_transcripts"] = time.time() - t0
    extras["decoded_rows"] = decoded_rows
    shutil.rmtree(ckpt, ignore_errors=True)

    import __ray_entry__ as em

    def consume(result):
        if isinstance(result, ray.data.Dataset):
            n = 0
            for b in result.iter_batches(batch_format="pyarrow"):
                n += b.num_rows
            return n
        return len(result)

    queries = em.queries()
    for name in (
        "roundtrip_documents",
        "roundtrip_lineitem",
        "dedup_exact_documents",
        "dedup_minhash_documents",
        "token_count_documents",
        "quality_documents",
        "langid_documents",
        "ann_cosine_embeddings",
    ):
        t0 = time.time()
        consume(queries[name](sf_dir))
        q[name] = time.time() - t0
    return q, extras


def _quiet_ray_data() -> None:
    """Keep stdout to exactly one JSON line (progress bars off)."""
    try:
        from ray.data import DataContext

        DataContext.get_current().enable_progress_bars = False
    except Exception:
        pass


def run_bench() -> dict:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False)
    _quiet_ray_data()
    try:
        q, extras = bench_queries(SF_DIR)
    finally:
        ray.shutdown()
    total = sum(q.values())
    return {
        "metric": "graft_bench_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in q.items()},
        "sf": sf_from_dir(SF_DIR),
        "num_cpus": NUM_CPUS,
        **{k: (round(v, 3) if isinstance(v, float) else v) for k, v in extras.items()},
    }


# N vs 4N CPUs (the sandbox stand-in for N- vs 4N-node clusters). 2→8
# keeps the fixed pipeline costs (metadata probe, shuffle barrier, actor
# spin-up) small relative to per-core work at sandbox data sizes; the
# partition grain (32k rows) gives both runs ≥2 waves per core.
SCALE_LO = int(os.environ.get("PGR_SCALE_LO", "2"))
SCALE_HI = int(os.environ.get("PGR_SCALE_HI", "8"))
SCALE_ROWS_PER_PART = 32_000
# PGR_SCALE_FSST=1 forces the FSST codec on the text column: the job
# becomes ALU-bound (~10x more CPU per byte) instead of memcpy-bound, so
# scaling legs beyond the sandbox VM's ~15 GB/s aggregate memory wall
# (see BASELINE.md) measure the ENGINE's parallel efficiency rather than
# the box's bandwidth ceiling.
SCALE_FSST = os.environ.get("PGR_SCALE_FSST", "") == "1"


def _scaling_child(cpus: int) -> dict:
    """Run only the headline encode at a given CPU count, fresh process.
    A small warmup encode (excluded from timing) pre-imports and spins up
    Ray workers, so the measurement is steady-state throughput."""
    code = f"""
import json, os, sys, time
sys.path.insert(0, '/root/repo')
import ray
ray.init(address='local', num_cpus={cpus}, include_dashboard=False)
import bench
bench._quiet_ray_data()
turns = bench.SCALE_TURNS_PER_SF // (4 if bench.SCALE_FSST else 1)
tdir = bench.transcripts_input_dir(bench.sf_from_dir({SF_DIR!r}), turns)
choices = {{"text": ("fsst", "none")}} if bench.SCALE_FSST else None
# Both legs run the IDENTICAL plan: a fixed block count (2x the high
# leg's CPUs) so only the resources differ, as on a real N vs 4N cluster.
blocks = 2 * {SCALE_HI}
bench.run_encode(tdir, rows_per_partition={SCALE_ROWS_PER_PART}, choices=choices, read_blocks=blocks)  # warmup
best = None
for _ in range(2):  # best-of-2: shields against VM background noise
    t0 = time.time()
    s = bench.run_encode(tdir, rows_per_partition={SCALE_ROWS_PER_PART}, choices=choices, read_blocks=blocks)
    el = time.time() - t0
    if best is None or el < best:
        best = el
print(json.dumps({{'cpus': {cpus}, 'elapsed': best, 'rows': s['rows_encoded'],
                  'turns_per_sec': s['rows_encoded'] / best}}))
ray.shutdown()
"""
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=3600,
        cwd="/root/repo",
    )
    for line in reversed(out.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    raise RuntimeError(f"scaling child failed: {out.stderr[-2000:]}")


def run_scaling() -> dict:
    # Pre-generate the inputs once (parallel Ray tasks) so neither timed
    # child pays for it; the parent session is shut down before the
    # children start theirs.
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False)
    try:
        transcripts_input_dir(
            sf_from_dir(SF_DIR), SCALE_TURNS_PER_SF // (4 if SCALE_FSST else 1)
        )
        transcripts_input_dir(0.001)
    finally:
        ray.shutdown()
    lo = _scaling_child(SCALE_LO)
    hi = _scaling_child(SCALE_HI)
    factor = SCALE_HI / SCALE_LO
    speedup = hi["turns_per_sec"] / lo["turns_per_sec"]
    efficiency = speedup / factor
    return {
        "metric": f"scaling_efficiency_{SCALE_LO}_to_{SCALE_HI}_cpus"
        + ("_fsst" if SCALE_FSST else ""),
        "value": round(efficiency, 3),
        "unit": "ratio",
        "queries": {
            f"encode_transcripts_{SCALE_LO}cpu": round(lo["elapsed"], 3),
            f"encode_transcripts_{SCALE_HI}cpu": round(hi["elapsed"], 3),
        },
        "sf": sf_from_dir(SF_DIR),
        "num_cpus": SCALE_HI,
        f"turns_per_sec_{SCALE_LO}cpu": round(lo["turns_per_sec"], 1),
        f"turns_per_sec_{SCALE_HI}cpu": round(hi["turns_per_sec"], 1),
        "speedup": round(speedup, 3),
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
