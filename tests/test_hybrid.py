"""RLE/bit-packed hybrid tests mirroring the reference's golden-vector
strategy (encoding/hybrid-encoder_test.go, hybrid-decoder_test.go;
distributions per FIXTURES.md F2)."""

import numpy as np
import pytest

from parquet_go_ray.functions.hybrid import (
    hybrid_decode,
    hybrid_decode_sized,
    hybrid_encode,
    hybrid_encode_sized,
)


def roundtrip(values, width):
    values = np.asarray(values)
    enc = hybrid_encode(values, width)
    dec, pos = hybrid_decode(enc, width, len(values))
    assert pos == len(enc)
    assert (dec == values.astype(np.uint64)).all()
    return enc


def test_golden_const_run():
    # 100 x value 4 at width 3 -> RLE header uvarint(100<<1)=200 + byte 4
    # (mirrors hybrid-encoder_test.go:15-54).
    enc = roundtrip(np.full(100, 4), 3)
    assert enc == bytes([0xC8, 0x01, 0x04])


def test_golden_rle_two_runs():
    enc = roundtrip(np.concatenate([np.full(100, 4), np.full(100, 5)]), 3)
    assert enc == bytes([0xC8, 0x01, 0x04, 0xC8, 0x01, 0x05])


def test_width_zero_yields_zeros():
    # bit width 0 = the reference's ConstDecoder case (const.go:7-19).
    enc = hybrid_encode(np.zeros(10, dtype=np.int64), 0)
    assert enc == b""
    dec, pos = hybrid_decode(b"", 0, 10)
    assert (dec == 0).all() and pos == 0


def test_bitpack_run_cap_504():
    # 1000 values of i%3: no run >= 8, so pure bit-packed runs capped at
    # 63 groups (504 values) each (ref hybrid-encoder.go:36-41).
    vals = np.arange(1000) % 3
    enc = roundtrip(vals, 2)
    # First header: 63 groups -> (63<<1)|1 = 127.
    assert enc[0] == 127


def test_mode_switch():
    vals = np.concatenate(
        [np.full(25, 17), np.full(7, 7), [8, 9, 10], np.full(25, 6), np.full(8, 5)]
    )
    roundtrip(vals, 5)


def test_partial_final_group():
    roundtrip(np.arange(1, 10), 4)  # nine values -> padded final group


def test_rle_multi_byte_value():
    roundtrip(np.full(20, 70000), 17)


@pytest.mark.parametrize("seed", range(5))
def test_random_roundtrip(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 3000))
    width = int(rng.integers(1, 33))
    vals = rng.integers(0, 1 << width, size=n, dtype=np.uint64)
    # Inject runs
    if n > 50:
        vals[10:40] = vals[10]
    roundtrip(vals, width)


def test_sized_stream():
    vals = np.arange(50) % 4
    enc = hybrid_encode_sized(vals, 2)
    assert int.from_bytes(enc[:4], "little") == len(enc) - 4
    dec, pos = hybrid_decode_sized(enc, 2, 50)
    assert pos == len(enc) and (dec == vals).all()


def test_truncated_rle_value_raises():
    with pytest.raises(ValueError):
        hybrid_decode(bytes([0xC8, 0x01]), 3, 100)  # header but no value byte


def test_truncated_bitpack_raises():
    with pytest.raises(ValueError):
        hybrid_decode(bytes([0x03]), 8, 8)  # 1 group promised, 0 bytes
