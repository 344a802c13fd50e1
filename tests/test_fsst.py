"""FSST codec tests (engine-new; FSST VLDB 2020)."""

import numpy as np
import pytest

from parquet_go_ray.functions.fsst import build_symbol_table, fsst_decode, fsst_encode
from tests.conftest import make_string_parts


def roundtrip(strings):
    lens, data = make_string_parts(strings)
    enc = fsst_encode(lens, data)
    dl, dd, pos = fsst_decode(enc, len(lens))
    assert pos == len(enc)
    assert (dl == lens).all()
    assert dd.tobytes() == data.tobytes()
    return enc, data


def test_basic_roundtrip(rng):
    vocab = ["the", "quick", "assistant", "tool_call", "response", "函数", "🎉"]
    docs = [" ".join(rng.choice(vocab, size=int(rng.integers(1, 60)))) for _ in range(300)]
    docs += ["", "x", "\xff escape bytes ÿ" * 3]
    enc, data = roundtrip(docs)
    assert len(enc) < len(data)  # compresses redundant text


def test_edge_cases():
    roundtrip([])
    roundtrip([""])
    roundtrip(["", "", ""])
    roundtrip(["a"])
    roundtrip(["aaaa" * 100] * 10)


def test_escape_byte_values():
    raw = [bytes([255] * k) for k in range(1, 20)] + [b"\xff ab\xff\xff cd"]
    roundtrip(raw)


def test_random_binary(rng):
    raw = [rng.integers(0, 256, int(rng.integers(0, 200))).astype(np.uint8).tobytes() for _ in range(100)]
    roundtrip(raw)


def test_deterministic():
    docs = ["hello world"] * 50 + ["foo bar baz"] * 50
    lens, data = make_string_parts(docs)
    assert fsst_encode(lens, data) == fsst_encode(lens, data)


def test_symbol_table_limits():
    lens, data = make_string_parts(["abcdefgh" * 10, "ijklmnop" * 10] * 20)
    table = build_symbol_table(lens, data)
    assert len(table) <= 255
    assert all(1 <= len(s) <= 8 for s in table)


def test_matches_never_cross_value_boundaries():
    # 'ab'+'cd' adjacency is frequent across values but must not merge.
    docs = ["ab", "cd"] * 200
    roundtrip(docs)
