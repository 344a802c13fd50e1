"""CLI surface smoke tests (subprocess — the CLI owns its own Ray
session, so it cannot run inside the suite's session fixture)."""

from __future__ import annotations

import json
import subprocess
import sys


def _run(args, timeout=240):
    return subprocess.run(
        [sys.executable, "-m", "parquet_go_ray.cli"] + args,
        capture_output=True, text=True, timeout=timeout,
        cwd="/root/repo",
    )


class TestCli:
    def test_curate_subcommand(self, tmp_path):
        out = str(tmp_path / "curated")
        r = _run([
            "curate",
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--out", out,
            "--near-dup-threshold", "0.8",
        ])
        assert r.returncode == 0, r.stderr[-2000:]
        rep = json.loads(r.stdout.strip().splitlines()[-1])
        assert rep["before"]["docs"] == 500
        assert 0 < rep["after"]["docs"] <= 500
        assert rep["docs_removed"] == \
            rep["before"]["docs"] - rep["after"]["docs"]
        import pyarrow.parquet as pq

        got = pq.read_table(out)
        assert got.num_rows == rep["after"]["docs"]
        assert "text" in got.column_names

    def test_bad_subcommand_exits_nonzero(self):
        r = _run(["frobnicate"], timeout=60)
        assert r.returncode != 0
