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


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 2**31),
    n=st.integers(1, 400),
    codec=st.sampled_from(["none", "zstd", "snappy", "lz4_raw"]),
    page_version=st.sampled_from([1, 2]),
    checksum=st.booleans(),
    page_rows=st.integers(7, 200),
)
def test_native_writer_fuzz_roundtrip(
    tmp_path_factory, seed, n, codec, page_version, checksum, page_rows
):
    """Random tables x codec x page dialect x CRC x page size through
    the full native write -> (pyarrow AND native) read loop, with BSS
    on the float column and a bloom on the int column every time —
    the features must compose, not just pass their own tests."""
    import pyarrow.parquet as pq

    from parquet_go_ray.sources.parquet_pages import (
        read_bloom_filter,
        read_row_group_native,
    )
    from parquet_go_ray.sources.parquet_write import write_parquet_native

    rng = np.random.default_rng(seed)
    mask = rng.random(n) < 0.2
    t = __import__("pyarrow").table({
        "i": __import__("pyarrow").array(
            [None if m else int(v) for m, v in
             zip(mask, rng.integers(-(2**50), 2**50, n))],
            __import__("pyarrow").int64(),
        ),
        "f": __import__("pyarrow").array(rng.normal(size=n)),
        "s": __import__("pyarrow").array(
            [f"k{int(v) % 23}" for v in rng.integers(0, 100, n)]
        ),
    })
    path = str(tmp_path_factory.mktemp("fuzz") / "f.parquet")
    write_parquet_native(
        t, path, codec=codec, page_version=page_version,
        write_page_checksum=checksum, data_page_rows=page_rows,
        encodings={"f": "byte_stream_split"},
        bloom_filter_columns=["i"],
    )
    assert pq.read_table(path).equals(t)
    assert read_row_group_native(path, 0).equals(t)
    bf = read_bloom_filter(path, 0, 0)
    assert bf is not None
