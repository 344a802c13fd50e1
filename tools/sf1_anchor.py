"""One healthy-interval encode anchor at sf1 scale (VERDICT r4 item 9):
5M transcript turns (the sf1 headline size; the per-round bench corpus
is sf0.1 = 500k) at 32 CPUs, cold + warm runs with the same memcpy
calibration discipline as bench.py. Prints one JSON line for
BASELINE.md.

Run from /root/repo: ``python tools/sf1_anchor.py``.
"""

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402


def main() -> None:
    import ray

    probe_pre = round(bench.hw_mem_probe(2, seconds=3.0), 1)
    ray.init(address="local", num_cpus=32, include_dashboard=False)
    bench._quiet_ray_data()
    try:
        tdir = bench.transcripts_input_dir(1.0)  # 5M turns
        wdir = bench.transcripts_input_dir(1.0, bench.TURNS_PER_SF // 20)
        bench.run_encode(wdir)  # warmup: spin-up + imports
        t0 = time.perf_counter()
        s = bench.run_encode(tdir)
        cold = time.perf_counter() - t0
        warm = []
        for _ in range(2):
            t0 = time.perf_counter()
            s = bench.run_encode(tdir)
            warm.append(time.perf_counter() - t0)
    finally:
        ray.shutdown()
    probe_post = round(bench.hw_mem_probe(2, seconds=3.0), 1)
    med = statistics.median(warm)
    print(json.dumps({
        "metric": "sf1_encode_anchor",
        "turns": s["rows_encoded"],
        "cold_s": round(cold, 3),
        "warm_s_median": round(med, 3),
        "warm_s": [round(w, 3) for w in warm],
        "turns_per_sec_warm": round(s["rows_encoded"] / med, 0),
        "bytes_per_turn": round(s["bytes_per_turn"], 3),
        "num_cpus": 32,
        "probe_pre_gibs": probe_pre,
        "probe_post_gibs": probe_post,
        "healthy": min(probe_pre, probe_post) >= bench.SCALE_HEALTHY_GIBS,
    }))


if __name__ == "__main__":
    main()
