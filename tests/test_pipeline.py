"""End-to-end Ray Data pipeline tests: encode → decode → verify, resume,
salting. Ray is initialised once per session (conftest.ray_session)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from parquet_go_ray.sources.transcripts import generate_transcripts
from parquet_go_ray.stages.salt import assign_buckets, stable_hash_strings
from parquet_go_ray.state import manifest as mf
from parquet_go_ray.state.blob import decode_table


@pytest.fixture(scope="module")
def transcripts_parquet(tmp_path_factory):
    path = tmp_path_factory.mktemp("input")
    t = generate_transcripts(8000, seed=42)
    pq.write_table(t, str(path / "transcripts-0000.parquet"), row_group_size=2048)
    return str(path), t


def test_salting_is_deterministic_and_splits_hot_keys():
    t = generate_transcripts(5000, seed=11)
    b1 = assign_buckets(t, num_buckets=8, turns_per_salt=16)
    b2 = assign_buckets(t, num_buckets=8, turns_per_salt=16)
    assert b1.column("_bucket").equals(b2.column("_bucket"))
    # A conversation longer than turns_per_salt lands in >1 bucket.
    df = b1.select(["conv_id", "_bucket"]).to_pandas()
    sizes = df.groupby("conv_id")["_bucket"].nunique()
    lens = df.groupby("conv_id").size()
    hot = lens[lens > 16 * 4]
    if len(hot):
        assert (sizes[hot.index] > 1).any()


def test_stable_hash_cross_call():
    a = stable_hash_strings(["conv-1", "conv-2"])
    b = stable_hash_strings(np.array(["conv-1", "conv-2"], dtype=object))
    assert (a == b).all()


def test_encode_decode_verify(ray_session, transcripts_parquet, tmp_path):
    import ray

    from parquet_go_ray.pipelines.decode import decode_pipeline
    from parquet_go_ray.pipelines.encode import encode_pipeline
    from parquet_go_ray.pipelines.verify import verify_roundtrip

    input_dir, original = transcripts_parquet
    ckpt = str(tmp_path / "ckpt")
    summary = encode_pipeline(
        input_dir, ckpt, rows_per_partition=2000, concurrency=(1, 2)
    )
    assert summary["rows_encoded"] == original.num_rows
    assert summary["partitions"] >= 4
    assert summary["blob_bytes"] < summary["raw_bytes"]

    decoded = decode_pipeline(ckpt, concurrency=(1, 2))
    result = verify_roundtrip(
        ray.data.read_parquet(input_dir), decoded
    )
    assert result["match"], result

    # Per-key bit-exactness, driver-side on the small test table.
    df_in = original.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    df_out = (
        decoded.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    for col in original.column_names:
        assert df_in[col].equals(df_out[col]), col


def test_resume_skips_completed(ray_session, transcripts_parquet, tmp_path):
    from parquet_go_ray.pipelines.encode import encode_pipeline

    input_dir, original = transcripts_parquet
    ckpt = str(tmp_path / "ckpt_resume")
    s1 = encode_pipeline(input_dir, ckpt, rows_per_partition=2000, concurrency=(1, 2))
    assert s1["partitions_skipped"] == 0

    # Simulate a partial run: delete one partition's blob+entry.
    victim = sorted(mf.completed_partitions(ckpt))[0]
    os.remove(mf.blob_path(ckpt, victim))
    os.remove(mf.entry_path(ckpt, victim))

    s2 = encode_pipeline(input_dir, ckpt, rows_per_partition=2000, concurrency=(1, 2))
    # Only the victim partition re-encodes; all others are filtered out
    # before the shuffle (their rows never reach the encoder).
    assert s2["partitions"] == 1
    assert s2["rows_encoded"] < original.num_rows
    assert mf.completed_partitions(ckpt) == mf.completed_partitions(ckpt) | {victim}

    # And a third run is a full no-op.
    s3 = encode_pipeline(input_dir, ckpt, rows_per_partition=2000, concurrency=(1, 2))
    assert s3["rows_encoded"] == 0


def test_resume_rejects_partitioning_change(ray_session, transcripts_parquet, tmp_path):
    from parquet_go_ray.pipelines.encode import encode_pipeline

    input_dir, _ = transcripts_parquet
    ckpt = str(tmp_path / "ckpt_cfg")
    encode_pipeline(input_dir, ckpt, rows_per_partition=2000, concurrency=(1, 2))
    with pytest.raises(ValueError, match="resume config mismatch"):
        encode_pipeline(input_dir, ckpt, rows_per_partition=999, concurrency=(1, 2))


def test_hot_conversation_splits_across_partitions(ray_session, tmp_path):
    """North-rule skew case: one conversation far bigger than
    turns_per_salt must land in multiple partitions (no partition takes
    the whole hot key), and the per-(conv_id, turn_idx) invariant must
    survive the split."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray

    from parquet_go_ray.pipelines.decode import decode_pipeline
    from parquet_go_ray.pipelines.encode import encode_pipeline

    # 1 hot conversation of 3000 turns + background chatter.
    hot = pa.table(
        {
            "conv_id": pa.array(["conv-hot"] * 3000),
            "turn_idx": pa.array(np.arange(3000, dtype=np.int32)),
            "role": pa.array(["user", "assistant"] * 1500),
            "text": pa.array([f"turn {i} payload" for i in range(3000)]),
            "tool": pa.array([None] * 3000, pa.string()),
            "ts": pa.array(
                1_700_000_000_000_000 + np.arange(3000) * 1_000_000,
                pa.timestamp("us"),
            ),
        }
    )
    bg = generate_transcripts(1000, seed=21)
    t = pa.concat_tables([hot, bg.select(hot.column_names)])
    input_dir = tmp_path / "hot_in"
    input_dir.mkdir()
    pq.write_table(t, str(input_dir / "t.parquet"))
    ckpt = str(tmp_path / "hot_ck")
    encode_pipeline(
        str(input_dir),
        ckpt,
        rows_per_partition=800,
        turns_per_salt=500,  # hot conv must split into ~6 salt blocks
        concurrency=(1, 2),
    )
    # The hot conversation appears in more than one partition blob.
    from parquet_go_ray.state import manifest as mf
    from parquet_go_ray.state.blob import decode_table

    parts_with_hot = 0
    for pid in sorted(mf.completed_partitions(ckpt)):
        with open(mf.blob_path(ckpt, pid), "rb") as f:
            tab = decode_table(f.read(), columns=["conv_id", "turn_idx"])
        if pc.sum(pc.equal(tab.column("conv_id"), "conv-hot")).as_py():
            parts_with_hot += 1
            # Within a partition, the hot conv's turns stay sorted.
            sel = tab.filter(pc.equal(tab.column("conv_id"), "conv-hot"))
            ti = sel.column("turn_idx").to_numpy()
            assert (np.diff(ti) > 0).all()
    assert parts_with_hot > 1

    # Full decode reassembles every turn exactly once.
    decoded = decode_pipeline(ckpt, concurrency=(1, 2))
    df = decoded.to_pandas()
    hot_rows = df[df["conv_id"] == "conv-hot"].sort_values("turn_idx")
    assert hot_rows["turn_idx"].tolist() == list(range(3000))
    assert hot_rows["text"].tolist() == [f"turn {i} payload" for i in range(3000)]


def test_partition_blobs_are_sorted_within(ray_session, transcripts_parquet, tmp_path):
    from parquet_go_ray.pipelines.encode import encode_pipeline

    input_dir, _ = transcripts_parquet
    ckpt = str(tmp_path / "ckpt_sorted")
    encode_pipeline(input_dir, ckpt, rows_per_partition=2000, concurrency=(1, 2))
    pid = sorted(mf.completed_partitions(ckpt))[0]
    with open(mf.blob_path(ckpt, pid), "rb") as f:
        t = decode_table(f.read())
    df = t.select(["conv_id", "turn_idx"]).to_pandas()
    assert df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True).equals(
        df.reset_index(drop=True)
    )
    # Lineage entry carries codec choices + bucket id + input file paths.
    entry = mf.read_entry(ckpt, pid)
    assert entry["input_fragments"][0] == f"bucket={int(pid)}"
    assert any(f.endswith(".parquet") for f in entry["input_fragments"][1:])
    assert "codec" in entry["columns"]["text"]


def test_fragment_exchange_compresses_shuffled_bytes():
    """Two-phase phase 1 must ship substantially fewer bytes than the raw
    rows it replaces (the point of the compressed-fragment exchange)."""
    import numpy as np

    from parquet_go_ray.sources.transcripts import generate_transcripts
    from parquet_go_ray.stages.encoder import FRAG_COL, encode_fragments
    from parquet_go_ray.stages.salt import assign_buckets

    t = generate_transcripts(20000, seed=21)
    batch = assign_buckets(t.combine_chunks(), num_buckets=8)
    frags = encode_fragments(batch)
    frag_bytes = sum(len(f.as_py()) for f in frags.column(FRAG_COL))
    assert frag_bytes < t.nbytes / 2, (frag_bytes, t.nbytes)


def test_blobs_byte_identical_across_exchange_modes(
    ray_session, transcripts_parquet, tmp_path
):
    """Pin the invariant (VERDICT r2 #6): single-phase, two-phase inline
    fragments, and the ref-based exchange all produce byte-identical
    partition blobs — exchange topology must never leak into the stored
    format. (Holds when the sort keys are unique per row, as in
    transcripts; pc.sort_indices is stable, so fragment arrival order
    cancels out.)"""
    import hashlib

    from parquet_go_ray.pipelines.encode import encode_pipeline

    input_dir, _ = transcripts_parquet

    def blob_hashes(ckpt: str, **kw) -> dict[str, str]:
        encode_pipeline(input_dir, ckpt, rows_per_partition=2000,
                        concurrency=(1, 2), **kw)
        out = {}
        for name in os.listdir(os.path.join(ckpt, "blobs")):
            if name.endswith(".blob"):
                with open(os.path.join(ckpt, "blobs", name), "rb") as f:
                    out[name] = hashlib.sha256(f.read()).hexdigest()
        return out

    single = blob_hashes(str(tmp_path / "c1"), two_phase=False)
    inline = blob_hashes(str(tmp_path / "c2"), two_phase=True,
                         fragment_refs=False, fused_read=False)
    refs = blob_hashes(str(tmp_path / "c3"), two_phase=True,
                       fragment_refs=True, fused_read=False)
    fused = blob_hashes(str(tmp_path / "c4"), two_phase=True,
                        fragment_refs=True, fused_read=True)
    fused_inline = blob_hashes(str(tmp_path / "c5"), two_phase=True,
                               fragment_refs=False, fused_read=True)
    assert single and single == inline == refs == fused == fused_inline
