"""Block compressor tests (ref compression/*.go via pyarrow codecs)."""

import pytest

from parquet_go_ray.functions.block import available_codecs, compress, decompress


def test_registry_has_core_codecs():
    codecs = available_codecs()
    assert "none" in codecs
    assert "zstd" in codecs  # north-rule default


@pytest.mark.parametrize("codec", available_codecs())
def test_roundtrip(codec):
    data = b"transcript turn text " * 500
    enc = compress(data, codec)
    assert decompress(enc, codec, len(data)) == data
    if codec != "none":
        assert len(enc) < len(data)


def test_size_mismatch_rejected():
    data = b"x" * 100
    enc = compress(data, "zstd")
    with pytest.raises(Exception):
        decompress(enc, "zstd", 99)
