"""Partition blob container + checkpoint manifest tests."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from parquet_go_ray.sources.transcripts import generate_transcripts
from parquet_go_ray.state import manifest as mf
from parquet_go_ray.state.blob import decode_table, encode_table, read_header


def assert_tables_equal(a: pa.Table, b: pa.Table):
    assert a.schema.equals(b.schema)
    a, b = a.combine_chunks(), b.combine_chunks()
    for col in a.column_names:
        assert a.column(col).equals(b.column(col)), col


def test_transcripts_bit_exact_roundtrip():
    t = generate_transcripts(3000, seed=7)
    blob, meta = encode_table(t)
    assert_tables_equal(t, decode_table(blob))
    assert meta["rows"] == t.num_rows
    assert set(meta["columns"]) == set(t.column_names)


def test_beats_parquet_zstd_baseline():
    # The compressed-size criterion: ≤ the reference stand-in
    # (pyarrow parquet dict+zstd; see BASELINE.md).
    import io

    t = generate_transcripts(20_000, seed=42)
    blob, _ = encode_table(t)
    buf = io.BytesIO()
    pq.write_table(t, buf, compression="zstd", use_dictionary=True)
    assert len(blob) <= buf.tell()


def test_testdata_tables_roundtrip():
    for name in ("documents", "events", "region"):
        t = pq.read_table(f"/root/testdata/sf0.001/{name}.parquet")
        blob, _ = encode_table(t)
        assert_tables_equal(t, decode_table(blob))


def test_explicit_choices_respected():
    t = generate_transcripts(1000, seed=1)
    blob, meta = encode_table(
        t, choices={"text": ("fsst", "none"), "role": ("plain", "none")}
    )
    assert meta["columns"]["text"]["codec"] == "fsst"
    assert meta["columns"]["role"]["codec"] == "plain"
    assert_tables_equal(t, decode_table(blob))


def test_dict_symtab_hash_in_meta():
    t = pa.table({"role": pa.array(["user", "assistant"] * 100)})
    blob, meta = encode_table(t, choices={"role": ("dict", "none")})
    assert "symtab_hash" in meta["columns"]["role"]


def test_bad_magic_rejected():
    with pytest.raises(ValueError):
        read_header(b"NOTABLOB" + b"\x00" * 100)


def test_empty_table():
    t = generate_transcripts(100, seed=3).slice(0, 0)
    blob, meta = encode_table(t)
    out = decode_table(blob)
    assert out.num_rows == 0 and out.schema.equals(t.schema)


class TestManifest:
    def test_write_and_resume(self, tmp_path):
        ckpt = str(tmp_path / "ckpt")
        t = generate_transcripts(500, seed=5)
        blob, meta = encode_table(t)
        entry = mf.write_partition(
            ckpt, "00042", blob, meta, input_fragments=["f1", "f2"], raw_bytes=123
        )
        assert mf.completed_partitions(ckpt) == {"00042"}
        got = mf.read_entry(ckpt, "00042")
        assert got["input_fragments"] == ["f1", "f2"]
        assert got["columns"]["text"]["codec"]
        with open(mf.blob_path(ckpt, "00042"), "rb") as f:
            assert_tables_equal(t, decode_table(f.read()))

    def test_incomplete_blob_not_listed(self, tmp_path):
        ckpt = str(tmp_path / "ckpt2")
        assert mf.completed_partitions(ckpt) == set()

    def test_idempotent_rewrite(self, tmp_path):
        ckpt = str(tmp_path / "ckpt3")
        t = generate_transcripts(200, seed=6)
        blob, meta = encode_table(t)
        mf.write_partition(ckpt, "p0", blob, meta)
        mf.write_partition(ckpt, "p0", blob, meta)  # retry-safe overwrite
        assert mf.completed_partitions(ckpt) == {"p0"}


def test_generator_deterministic():
    a = generate_transcripts(1000, seed=9)
    b = generate_transcripts(1000, seed=9)
    assert_tables_equal(a, b)
    c = generate_transcripts(1000, seed=10)
    assert not a.column("text").equals(c.column("text"))
