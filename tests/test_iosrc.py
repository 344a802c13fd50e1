"""Byte-source backends (iosrc): mem:// registry, HTTP range reader,
and the native reader running end-to-end over both — the engine's
counterpart of the reference's pluggable sources (source/http/http.go,
source/memory, source/local)."""

from __future__ import annotations

import http.server
import os
import threading

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from parquet_go_ray.sources import iosrc
from parquet_go_ray.sources.iosrc import (
    HttpRangeFile,
    open_source,
    put_blob,
    stat_source,
)
from parquet_go_ray.sources.parquet_pages import (
    read_page_index,
    read_row_group_native,
)
from parquet_go_ray.sources.parquet_write import write_parquet_native


class _RangeHandler(http.server.BaseHTTPRequestHandler):
    """Minimal static server with RFC-7233 single-range support;
    records bytes actually served for the windowed-read spy."""

    root = "/tmp"
    served = {"bytes": 0, "requests": 0}
    honor_range = True

    def log_message(self, *a):  # quiet
        pass

    def _file(self):
        p = os.path.join(self.root, self.path.lstrip("/"))
        if not os.path.isfile(p):
            self.send_error(404)
            return None
        return p

    def do_HEAD(self):
        p = self._file()
        if p is None:
            return
        self.send_response(200)
        self.send_header("Content-Length", str(os.path.getsize(p)))
        self.send_header("ETag", f'"{os.path.getmtime(p)}"')
        self.end_headers()

    def do_GET(self):
        p = self._file()
        if p is None:
            return
        size = os.path.getsize(p)
        rng = self.headers.get("Range")
        start, stop = 0, size
        status = 200
        if rng and self.honor_range:
            spec = rng.split("=", 1)[1].strip()
            a, b = spec.split("-", 1)
            if a == "":  # suffix range: bytes=-N
                start = max(0, size - int(b))
            else:
                start = int(a)
                stop = min(size, int(b) + 1) if b else size
            status = 206
        with open(p, "rb") as f:
            f.seek(start)
            body = f.read(stop - start)
        self.send_response(status)
        if status == 206:
            self.send_header(
                "Content-Range", f"bytes {start}-{start + len(body) - 1}/{size}"
            )
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)
        cls = type(self)
        cls.served["bytes"] += len(body)
        cls.served["requests"] += 1


@pytest.fixture(scope="module")
def http_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("httpsrc")
    _RangeHandler.root = str(root)
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _RangeHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield root, f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _sample_table(n=5000):
    rng = np.random.default_rng(7)
    return pa.table({
        "id": pa.array(np.arange(n, dtype=np.int64)),
        "v": pa.array(rng.integers(0, 50, n, dtype=np.int32)),
        "s": pa.array([f"row-{i % 97}" for i in range(n)]),
    })


class TestMemScheme:
    def test_roundtrip_and_stat(self):
        uri = put_blob("t1.bin", b"hello world")
        with open_source(uri) as f:
            assert f.read() == b"hello world"
            f.seek(-5, 2)
            assert f.read() == b"world"
        size, gen1 = stat_source(uri)
        assert size == 11
        put_blob("t1.bin", b"other")
        _, gen2 = stat_source(uri)
        assert gen2 != gen1  # overwrite visible to the footer cache

    def test_missing_blob(self):
        with pytest.raises(FileNotFoundError):
            open_source("mem://nope")

    def test_native_read_over_mem(self, tmp_path):
        t = _sample_table(800)
        p = str(tmp_path / "m.parquet")
        write_parquet_native(t, p, codec="zstd")
        uri = put_blob("m.parquet", open(p, "rb").read())
        got = read_row_group_native(uri, 0)
        assert got.equals(read_row_group_native(p, 0))


class TestHttpRangeFile:
    def test_seek_read_matches_local(self, http_root):
        root, base = http_root
        data = bytes(np.random.default_rng(1).integers(
            0, 256, 700_000, dtype=np.uint8))
        (root / "blob.bin").write_bytes(data)
        f = HttpRangeFile(f"{base}/blob.bin", block=64 * 1024)
        assert f.size == len(data)
        f.seek(-8, 2)
        assert f.read(8) == data[-8:]
        f.seek(100_000)
        assert f.read(200_000) == data[100_000:300_000]  # spans blocks
        assert f.read(0) == b""
        f.seek(len(data) - 3)
        assert f.read(100) == data[-3:]  # clamped at EOF
        # block cache: re-reading the same window adds no wire bytes
        before = f.bytes_fetched
        f.seek(100_000)
        assert f.read(1000) == data[100_000:101_000]
        assert f.bytes_fetched == before
        f.close()

    def test_server_ignoring_range_still_works(self, http_root):
        root, base = http_root
        data = b"0123456789" * 1000
        (root / "norange.bin").write_bytes(data)
        _RangeHandler.honor_range = False
        try:
            f = HttpRangeFile(f"{base}/norange.bin")
            f.seek(500)
            assert f.read(20) == data[500:520]
            f.close()
        finally:
            _RangeHandler.honor_range = True

    def test_404(self, http_root):
        _, base = http_root
        with pytest.raises(FileNotFoundError):
            HttpRangeFile(f"{base}/missing.bin")


class TestNativeReadOverHttp:
    def test_row_group_equality(self, http_root):
        root, base = http_root
        t = _sample_table()
        p = str(root / "t.parquet")
        write_parquet_native(t, p, codec="zstd", data_page_rows=500)
        got = read_row_group_native(f"{base}/t.parquet", 0)
        assert got.equals(read_row_group_native(p, 0))
        assert got.equals(pq.read_table(p))

    def test_page_index_over_http(self, http_root):
        root, base = http_root
        p = str(root / "t.parquet")
        local = read_page_index(p, 0, 0)
        remote = read_page_index(f"{base}/t.parquet", 0, 0)
        assert remote == local
        assert len(remote["offset_index"]) > 1

    def test_windowed_read_fetches_a_fraction(self, http_root):
        """A small row window over HTTP must leave most of the file on
        the server: footer + OffsetIndex + dictionary prefix + the
        overlapping pages only."""
        root, base = http_root
        n = 200_000
        rng = np.random.default_rng(3)
        # incompressible payload so the file dwarfs the 256 KiB block
        # granularity the range reader fetches at
        t = pa.table({
            "id": pa.array(np.arange(n, dtype=np.int64)),
            "payload": pa.array(
                rng.integers(0, 2**63, n, dtype=np.int64)),
            "blob": pa.array(
                [bytes(x) for x in rng.integers(
                    0, 256, (n, 24), dtype=np.uint8)], pa.binary()),
        })
        p = str(root / "big.parquet")
        write_parquet_native(t, p, codec="zstd", data_page_rows=2000)
        fsize = os.path.getsize(p)
        _RangeHandler.served["bytes"] = 0
        got = read_row_group_native(
            f"{base}/big.parquet", 0, columns=["id"],
            row_range=(1000, 1500))
        assert got.num_rows == 500
        assert got.column("id").to_pylist() == list(range(1000, 1500))
        served = _RangeHandler.served["bytes"]
        assert served < fsize * 0.35, (served, fsize)


class TestReadParquetNativeHttpRay:
    @pytest.mark.usefixtures("ray_session")
    def test_distributed_read_over_http(self, http_root):
        from parquet_go_ray.sources.parquet_pages import read_parquet_native

        root, base = http_root
        t = _sample_table(4000)
        p = str(root / "d.parquet")
        write_parquet_native(t, p, codec="zstd", data_page_rows=500)
        ds = read_parquet_native(
            f"{base}/d.parquet", columns=["id", "v"],
            filters=[("v", "<", 10)], max_rows_per_task=1000)
        got = pa.concat_tables(
            list(ds.iter_batches(batch_format="pyarrow")))
        want = pq.read_table(p, columns=["id", "v"])
        want = want.filter(pa.compute.less(want.column("v"), 10))
        assert got.sort_by("id").equals(want.sort_by("id"))


class TestMultipart:
    """HTTP-upload (multipart/form-data) source — the reference's
    source/http/http.go re-expressed over the mem:// seam."""

    @staticmethod
    def _body(parts):
        b = "pgrbound7"
        out = []
        for name, filename, data in parts:
            disp = f'form-data; name="{name}"'
            if filename:
                disp += f'; filename="{filename}"'
            out.append(
                f"--{b}\r\nContent-Disposition: {disp}\r\n"
                f"Content-Type: application/octet-stream\r\n\r\n"
                .encode() + data + b"\r\n"
            )
        out.append(f"--{b}--\r\n".encode())
        return b"".join(out), f"multipart/form-data; boundary={b}"

    def test_parquet_through_multipart(self, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from parquet_go_ray.sources.iosrc import open_multipart

        t = pa.table({"x": pa.array(range(100), pa.int64())})
        p = str(tmp_path / "f.parquet")
        pq.write_table(t, p)
        raw = open(p, "rb").read()
        body, ctype = self._body([
            ("note", None, b"metadata field"),
            ("file", "f.parquet", raw),
        ])
        f = open_multipart(body, ctype)
        assert f.read() == raw
        # seekable per the reference's Reader contract
        f.seek(-8, 2)
        assert f.read(4) == raw[-8:-4]
        # and the whole native reader works on the extracted part
        back = pq.read_table(io_like := open_multipart(body, ctype))
        assert back.equals(t)

    def test_field_selection_and_errors(self):
        from parquet_go_ray.sources.iosrc import open_multipart

        body, ctype = self._body([
            ("a", "a.bin", b"AAA"),
            ("b", "b.bin", b"BBB"),
        ])
        assert open_multipart(body, ctype, field="b").read() == b"BBB"
        # default: first part with a filename
        assert open_multipart(body, ctype).read() == b"AAA"
        import pytest as _pytest
        with _pytest.raises(ValueError, match="no part named"):
            open_multipart(body, ctype, field="zzz")
        with _pytest.raises(ValueError, match="boundary"):
            open_multipart(body, "text/plain")
