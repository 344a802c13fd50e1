"""Hypothesis property tests — the engine's replacement for the
reference's go-fuzz harness (encoding/delta-binary-packed-decoder_fuzz.go,
SURVEY.md §5.4): encode→decode == input over adversarially-shrunk inputs."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from parquet_go_ray.functions.bytearray import (
    delta_length_decode,
    delta_length_encode,
    delta_prefix_decode,
    delta_prefix_encode,
)
from parquet_go_ray.functions.delta import delta_decode, delta_encode
from parquet_go_ray.functions.for_bitpack import for_decode, for_encode
from parquet_go_ray.functions.fsst import fsst_decode, fsst_encode
from parquet_go_ray.functions.hybrid import hybrid_decode, hybrid_encode

MAX = 50  # examples per property; enough to shrink, cheap to run


@settings(max_examples=MAX, deadline=None)
@given(
    st.lists(st.integers(0, 2**20 - 1), max_size=600),
    st.just(20),
)
def test_hybrid_roundtrip(values, width):
    v = np.array(values, dtype=np.uint64)
    dec, pos = hybrid_decode(hybrid_encode(v, width), width, len(v))
    assert (dec == v).all()


@settings(max_examples=MAX, deadline=None)
@given(st.lists(st.integers(-(2**62), 2**62), max_size=400))
def test_delta_roundtrip_int64(values):
    v = np.array(values, dtype=np.int64)
    dec, _ = delta_decode(delta_encode(v, dtype=np.int64), dtype=np.int64)
    assert (dec == v).all()


@settings(max_examples=MAX, deadline=None)
@given(st.lists(st.integers(-(2**31), 2**31 - 1), max_size=300))
def test_delta_roundtrip_int32_wraparound(values):
    v = np.array(values, dtype=np.int32)
    dec, _ = delta_decode(delta_encode(v, dtype=np.int32), dtype=np.int32)
    assert (dec == v).all()


@settings(max_examples=MAX, deadline=None)
@given(st.lists(st.integers(-(2**40), 2**40), max_size=300))
def test_for_roundtrip(values):
    v = np.array(values, dtype=np.int64)
    dec, _ = for_decode(for_encode(v, dtype=np.int64), dtype=np.int64)
    assert (dec == v).all()


def _parts(blobs):
    lens = np.array([len(b) for b in blobs], dtype=np.int64)
    data = (
        np.frombuffer(b"".join(blobs), dtype=np.uint8)
        if blobs
        else np.empty(0, dtype=np.uint8)
    )
    return lens, data


@settings(max_examples=MAX, deadline=None)
@given(st.lists(st.binary(max_size=200), max_size=60))
def test_delta_length_roundtrip(blobs):
    lens, data = _parts(blobs)
    dl, dd, _ = delta_length_decode(delta_length_encode(lens, data), len(lens))
    assert (dl == lens).all() and dd.tobytes() == data.tobytes()


@settings(max_examples=MAX, deadline=None)
@given(st.lists(st.binary(max_size=120), max_size=50))
def test_delta_prefix_roundtrip(blobs):
    lens, data = _parts(blobs)
    dl, dd, _ = delta_prefix_decode(delta_prefix_encode(lens, data), len(lens))
    assert (dl == lens).all() and dd.tobytes() == data.tobytes()


@settings(max_examples=30, deadline=None)
@given(st.lists(st.binary(max_size=300), max_size=40))
def test_fsst_roundtrip(blobs):
    lens, data = _parts(blobs)
    dl, dd, pos = fsst_decode(fsst_encode(lens, data), len(lens))
    assert (dl == lens).all() and dd.tobytes() == data.tobytes()
