"""C wire kernels (functions/_wire_native.py) vs their numpy twins:
byte-identical encode, value-identical decode, identical error paths,
and calibration-gated perf bars (VERDICT r3 items 1 + 8 pattern)."""

from __future__ import annotations

import os
import time

import numpy as np
import pytest

from parquet_go_ray.functions import _wire_native as W
from parquet_go_ray.functions.bitpack import pack, unpack
from parquet_go_ray.functions.delta import delta_decode, delta_encode
from parquet_go_ray.functions.hybrid import hybrid_decode, hybrid_encode

HAVE = W.lib() is not None


def _force_numpy(monkeypatch):
    for name in ("pack", "unpack", "hybrid_encode", "hybrid_decode",
                 "delta_encode", "delta_decode"):
        monkeypatch.setattr(W, name, lambda *a, **k: None)


def _corpora(rng):
    """Adversarial value streams: runs, alternations, full-range."""
    out = []
    for n in (0, 1, 7, 8, 9, 504, 505, 1000, 4096):
        out.append(rng.integers(0, 8, n))
        out.append(np.repeat(rng.integers(0, 100, max(1, n // 10)), 10)[:n])
        out.append(np.arange(n) % 2)
        out.append(np.full(n, 5))
    out.append(rng.integers(0, 2**63, 3000).astype(np.uint64))
    out.append(np.repeat([3, 3, 3, 9], [500, 4, 120, 300]))
    return out


@pytest.mark.skipif(not HAVE, reason="no C compiler")
class TestByteIdentity:
    def test_pack_unpack_all_widths(self, rng, monkeypatch):
        for width in list(range(1, 65)):
            vals = rng.integers(
                0, 2 ** min(width, 63), 97, dtype=np.uint64
            )
            if width == 64:
                vals[:5] = [2**64 - 1, 2**63, 0, 1, 2**63 + 12345]
            native = pack(vals, width)
            with monkeypatch.context() as m:
                _force_numpy(m)
                ref = pack(vals, width)
            assert native == ref, width
            got = unpack(native, width, len(vals))
            with monkeypatch.context() as m:
                _force_numpy(m)
                ref_v = unpack(native, width, len(vals))
            assert (got == ref_v).all() and (got == vals).all(), width

    def test_hybrid_encode_identical(self, rng, monkeypatch):
        for vals in _corpora(rng):
            for width in (1, 3, 7, 20, 64):
                v = np.asarray(vals, dtype=np.uint64) & (
                    (np.uint64(1) << np.uint64(width)) - np.uint64(1)
                    if width < 64 else np.uint64(2**64 - 1)
                )
                native = hybrid_encode(v, width)
                with monkeypatch.context() as m:
                    _force_numpy(m)
                    ref = hybrid_encode(v, width)
                assert native == ref, (width, len(v))
                out, pos = hybrid_decode(native, width, len(v))
                assert (out == v).all()
                with monkeypatch.context() as m:
                    _force_numpy(m)
                    out2, pos2 = hybrid_decode(native, width, len(v))
                assert (out == out2).all() and pos == pos2

    def test_delta_identical(self, rng, monkeypatch):
        cases = [
            (np.int64, rng.integers(-(2**62), 2**62, 777)),
            (np.int64, np.arange(1000) * 37),
            (np.int64, np.array([], dtype=np.int64)),
            (np.int64, np.array([42])),
            (np.int32, rng.integers(-(2**31), 2**31, 1500, dtype=np.int64)),
            (np.int32, (np.arange(2000, dtype=np.uint64) * 2654435761
                        % (2**32)).astype(np.uint32).astype(np.int32)),
            (np.int64, np.repeat(rng.integers(0, 10, 40), 50)),
        ]
        for dt, vals in cases:
            native = delta_encode(vals, dtype=dt)
            with monkeypatch.context() as m:
                _force_numpy(m)
                ref = delta_encode(vals, dtype=dt)
            assert native == ref, (dt, len(vals))
            got, pos = delta_decode(native, 0, dtype=dt, expect=len(vals))
            with monkeypatch.context() as m:
                _force_numpy(m)
                ref_v, ref_pos = delta_decode(
                    native, 0, dtype=dt, expect=len(vals)
                )
            assert (got == ref_v).all() and pos == ref_pos
            assert got.dtype == np.dtype(dt)

    def test_decode_errors_match_numpy(self, monkeypatch):
        """Corrupt streams raise the NUMPY error (native falls back)."""
        enc = hybrid_encode(np.arange(100, dtype=np.uint64) % 7, 3)
        with pytest.raises(ValueError, match="truncated"):
            hybrid_decode(enc[: len(enc) // 2], 3, 100)
        d = delta_encode(np.arange(500), dtype=np.int64)
        with pytest.raises(ValueError, match="value count mismatch"):
            delta_decode(d, 0, dtype=np.int64, expect=400)
        bad = bytearray(d)
        bad[0] = 0x03  # block size 3: % 128 != 0
        with pytest.raises(ValueError, match="invalid block size"):
            delta_decode(bytes(bad), 0, dtype=np.int64, expect=500)


def test_numpy_fallback_roundtrip(monkeypatch, rng):
    """With the native kernels forced off, the numpy paths still run
    (the no-compiler deployment story)."""
    _force_numpy(monkeypatch)
    v = rng.integers(0, 100, 1000).astype(np.uint64)
    assert (hybrid_decode(hybrid_encode(v, 7), 7, len(v))[0] == v).all()
    assert (unpack(pack(v, 7), 7, len(v)) == v).all()
    sv = v.astype(np.int64)
    assert (
        delta_decode(delta_encode(sv), 0, expect=len(sv))[0] == sv
    ).all()


@pytest.mark.skipif(not HAVE, reason="no C compiler")
def test_native_wire_speed():
    """Perf bars for the C kernels, gated on the host memcpy calibration
    (VERDICT r3 item 8 pattern): a starved host interval skips with the
    probe reading instead of red-failing the suite."""
    from conftest import memcpy_gibs

    gibs = memcpy_gibs()
    if gibs < 4.0:
        pytest.skip(f"host starved: memcpy {gibs:.1f} GiB/s < 4")
    rng = np.random.default_rng(11)
    v = rng.integers(0, 2**17, 2_000_000).astype(np.uint64)
    runs = np.repeat(rng.integers(0, 50, 200_000), 10).astype(np.uint64)

    def best_mvps(fn, payload_vals, tries=3):
        best = 0.0
        for _ in range(tries):
            t0 = time.perf_counter()
            fn()
            best = max(best, payload_vals / (time.perf_counter() - t0) / 1e6)
            if best >= 100:
                break
        return best

    enc = hybrid_encode(v, 17)
    assert best_mvps(lambda: hybrid_encode(v, 17), len(v)) >= 40
    assert best_mvps(lambda: hybrid_decode(enc, 17, len(v)), len(v)) >= 40
    enc_r = hybrid_encode(runs, 6)
    assert best_mvps(lambda: hybrid_encode(runs, 6), len(runs)) >= 40
    sv = v.astype(np.int64)
    d = delta_encode(sv)
    assert best_mvps(lambda: delta_encode(sv), len(sv)) >= 40
    assert best_mvps(
        lambda: delta_decode(d, 0, expect=len(sv)), len(sv)
    ) >= 40


class TestHostileInput:
    """ADVICE r4 (high): a file-controlled varint header used to
    overflow ``groups * width`` to a negative nbytes that passed the
    bounds check — OOB reads and a potential infinite loop in the C
    decoder. Both paths must now reject cleanly."""

    @staticmethod
    def _uvarint(x: int) -> bytes:
        out = bytearray()
        while x >= 0x80:
            out.append((x & 0x7F) | 0x80)
            x >>= 7
        out.append(x)
        return bytes(out)

    def test_huge_bitpack_group_count(self):
        for groups in (1 << 60, (1 << 62) + 12345, (1 << 63) - 1):
            buf = self._uvarint((groups << 1) | 1) + b"\x00" * 64
            with pytest.raises(ValueError):
                hybrid_decode(buf, 7, 1000)

    def test_large_but_valid_group_count_rejected_by_bounds(self):
        # groups small enough not to overflow but larger than the buffer
        buf = self._uvarint((10**6 << 1) | 1) + b"\x00" * 16
        with pytest.raises(ValueError):
            hybrid_decode(buf, 32, 10)

    def test_width_validated_at_wrapper(self):
        from parquet_go_ray.functions import _wire_native

        if _wire_native.lib() is None:
            pytest.skip("no compiler")
        # the dict-index bit-width byte comes straight from the file
        assert _wire_native.hybrid_decode(b"\x02\x00\x00", 65, 4) is None
        assert _wire_native.hybrid_decode(b"\x02\x00\x00", -1, 4) is None
        assert _wire_native.unpack(b"\x00\x00", 65, 2) is None
        assert _wire_native.unpack(b"\x00", 8, 100) is None  # short buf


class TestKernelCache:
    def test_cache_dir_is_private_and_owned(self):
        import stat

        from parquet_go_ray.functions._native_cache import cache_dir

        d = cache_dir()
        st = os.lstat(d)
        assert st.st_uid == os.getuid()
        assert not (st.st_mode & 0o077)

    def test_safe_cdll_rejects_symlink(self, tmp_path):
        from parquet_go_ray.functions._native_cache import safe_cdll

        link = tmp_path / "evil.so"
        link.symlink_to("/bin/true")
        with pytest.raises(OSError):
            safe_cdll(str(link))
