"""Pluggable byte sources for the native Parquet reader.

The reference abstracts its file I/O behind a seekable-reader
interface with one adapter per backend — local files
(``source/local``), an in-memory buffer (``source/memory``), and
HTTP-uploaded files (``source/http/http.go:9-38``), plus cloud
backends (s3/gcs/azblob/hdfs) that delegate to vendor SDKs. This
module is the same seam, Ray-shaped: ``open_source(uri)`` returns a
seekable binary file-like for any registered scheme, and every
byte-touching site in :mod:`parquet_pages` routes through it, so a
``read_parquet_native("http://host/f.parquet")`` task fetches ONLY
the byte windows the footer / OffsetIndex demand (two small range
requests per pruned chunk instead of the whole file) — the property
that matters when the bytes live behind a network hop.

Backends here:

- local filesystem (default — any uri without a registered scheme);
- ``mem://name`` — a process-local blob registry, the test seam the
  reference's ``source/memory`` provides. Single-process by design:
  distributed stages exchange bytes through the Ray object store,
  never through ``mem://``.
- ``http://`` / ``https://`` — :class:`HttpRangeFile`, a seekable
  reader over stdlib ``Range:`` requests with an aligned-block LRU
  cache and a kept-alive connection per open file.

Cloud schemes (s3/gcs/azblob/hdfs) stay delegated exactly as
SURVEY.md §2.3 records — their SDKs are not in this container — but
``register_scheme`` is the one-line plug point: any fsspec-style
opener that returns a seekable file-like makes the whole native
reader (footer walk, page index, blooms, windowed chunk reads) work
against that store unchanged.
"""

from __future__ import annotations

import collections
import io
import os
import threading
import urllib.parse
from typing import BinaryIO, Callable

# scheme -> (opener(uri) -> BinaryIO, stat(uri) -> (size, version_token))
_SCHEMES: dict[str, tuple[Callable[[str], BinaryIO],
                          Callable[[str], tuple[int, int]]]] = {}


def register_scheme(scheme: str,
                    opener: Callable[[str], BinaryIO],
                    stat: Callable[[str], tuple[int, int]]) -> None:
    """Register a uri scheme. ``opener`` must return a seekable binary
    file-like (read/seek/tell; seek supports whence=2 for the footer
    walk). ``stat`` returns ``(size_bytes, version_token)`` — the
    version token keys the per-file footer cache, so it must change
    whenever the bytes do (mtime_ns locally, ETag/Last-Modified hash
    over HTTP, a generation counter for mem://)."""
    _SCHEMES[scheme] = (opener, stat)


def _scheme_of(uri: str) -> str | None:
    # Windows drive letters ("C:\\...") are not schemes; every real
    # scheme here is >= 2 chars and followed by "://".
    i = uri.find("://")
    if i <= 1:
        return None
    return uri[:i].lower()


def is_remote(uri: str) -> bool:
    """True when ``uri`` has a registered non-local scheme (the caller
    should hand ``pyarrow.parquet`` a file object, not the string)."""
    return _scheme_of(uri) in _SCHEMES


def open_source(uri: str) -> BinaryIO:
    """Open ``uri`` for seekable binary reads via its scheme's backend;
    plain paths (and file:// uris) open the local filesystem."""
    s = _scheme_of(uri)
    if s in _SCHEMES:
        return _SCHEMES[s][0](uri)
    if s == "file":
        return open(urllib.parse.urlparse(uri).path, "rb")
    return open(uri, "rb")


def stat_source(uri: str) -> tuple[int, int]:
    """``(size, version_token)`` of ``uri`` — the footer-cache key."""
    s = _scheme_of(uri)
    if s in _SCHEMES:
        return _SCHEMES[s][1](uri)
    if s == "file":
        uri = urllib.parse.urlparse(uri).path
    st = os.stat(uri)
    return st.st_size, st.st_mtime_ns


# ---------------------------------------------------------------- mem://

class _MemStore:
    """Process-local blob registry behind ``mem://<name>`` — the
    reference's ``source/memory`` test seam. Generation counters make
    overwrites visible to the footer cache."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._blobs: dict[str, tuple[bytes, int]] = {}
        self._gen = 0

    def put(self, name: str, data: bytes) -> str:
        with self._lock:
            self._gen += 1
            self._blobs[name] = (bytes(data), self._gen)
        return f"mem://{name}"

    def get(self, name: str) -> tuple[bytes, int]:
        with self._lock:
            if name not in self._blobs:
                raise FileNotFoundError(f"mem://{name}")
            return self._blobs[name]

    def delete(self, name: str) -> None:
        with self._lock:
            self._blobs.pop(name, None)


MEM = _MemStore()


def put_blob(name: str, data: bytes) -> str:
    """Store ``data`` under ``mem://name`` and return the uri."""
    return MEM.put(name, data)


def _mem_open(uri: str) -> BinaryIO:
    data, _ = MEM.get(uri[len("mem://"):])
    return io.BytesIO(data)


def _mem_stat(uri: str) -> tuple[int, int]:
    data, gen = MEM.get(uri[len("mem://"):])
    return len(data), gen


register_scheme("mem", _mem_open, _mem_stat)


# ------------------------------------------------------------- http(s)://

_HTTP_BLOCK = 256 * 1024   # aligned fetch unit
_HTTP_CACHE_BLOCKS = 64    # per-open LRU (16 MiB ceiling)


class HttpRangeFile(io.RawIOBase):
    """Seekable read-only file over HTTP ``Range:`` requests.

    One kept-alive connection per open file; reads fetch
    ``_HTTP_BLOCK``-aligned windows and LRU-cache them, so the footer
    walk (a seek to EOF-8 then a short read) costs one small request,
    and an OffsetIndex-windowed chunk read fetches only the dictionary
    prefix + the overlapping pages — never the whole object.
    ``bytes_fetched`` counts wire bytes for the range-read spy tests.

    Servers that ignore Range (respond 200 with the full body) still
    work: the full body becomes one cached block. A server that can't
    report Content-Length on HEAD gets one ranged probe instead.
    """

    def __init__(self, url: str, block: int = _HTTP_BLOCK,
                 cache_blocks: int = _HTTP_CACHE_BLOCKS) -> None:
        super().__init__()
        import http.client

        self.url = url
        self._block = int(block)
        self._cache: collections.OrderedDict[int, bytes] = \
            collections.OrderedDict()
        self._cache_blocks = int(cache_blocks)
        self.bytes_fetched = 0
        self._pos = 0
        self._whole: bytes | None = None  # 200-fallback full body
        u = urllib.parse.urlparse(url)
        cls = (http.client.HTTPSConnection if u.scheme == "https"
               else http.client.HTTPConnection)
        self._path = (u.path or "/") + (f"?{u.query}" if u.query else "")
        self._conn = cls(u.netloc, timeout=60)
        self._size, self._etag = self._probe()

    # -- wire ---------------------------------------------------------
    def _request(self, method: str, headers: dict[str, str]):
        # one silent reconnect: keep-alive peers may close idle sockets
        for attempt in (0, 1):
            try:
                self._conn.request(method, self._path, headers=headers)
                return self._conn.getresponse()
            except (ConnectionError, BrokenPipeError, OSError):
                if attempt:
                    raise
                self._conn.close()

    def _probe(self) -> tuple[int, int]:
        r = self._request("HEAD", {})
        body = r.read()  # drain for keep-alive
        if r.status >= 400:
            raise FileNotFoundError(f"{self.url}: HTTP {r.status}")
        etag = r.getheader("ETag") or r.getheader("Last-Modified") or ""
        clen = r.getheader("Content-Length")
        if clen is not None:
            return int(clen), hash(etag) & 0x7FFFFFFFFFFFFFFF
        # HEAD without length: one ranged probe reads the size off
        # Content-Range (suffix range keeps it cheap).
        r = self._request("GET", {"Range": "bytes=-1"})
        body = r.read()
        cr = r.getheader("Content-Range", "")
        if r.status == 206 and "/" in cr:
            return int(cr.rsplit("/", 1)[1]), hash(etag) & 0x7FFFFFFFFFFFFFFF
        # no range support at all: the body IS the object
        self._whole = body
        self.bytes_fetched += len(body)
        return len(body), hash(etag) & 0x7FFFFFFFFFFFFFFF

    def _fetch(self, start: int, stop: int) -> bytes:
        r = self._request(
            "GET", {"Range": f"bytes={start}-{stop - 1}"})
        body = r.read()
        if r.status == 200:
            # server ignored Range — keep the whole body, slice locally
            self._whole = body
            self.bytes_fetched += len(body)
            return body[start:stop]
        if r.status != 206:
            raise OSError(f"{self.url}: HTTP {r.status} for range read")
        self.bytes_fetched += len(body)
        return body

    def _block_at(self, bi: int) -> bytes:
        blk = self._cache.get(bi)
        if blk is not None:
            self._cache.move_to_end(bi)
            return blk
        start = bi * self._block
        stop = min(self._size, start + self._block)
        blk = self._fetch(start, stop)
        self._cache[bi] = blk
        while len(self._cache) > self._cache_blocks:
            self._cache.popitem(last=False)
        return blk

    # -- file-like ------------------------------------------------------
    def readable(self) -> bool:
        return True

    def seekable(self) -> bool:
        return True

    @property
    def size(self) -> int:
        return self._size

    @property
    def version_token(self) -> int:
        return (self._etag * 1_000_003 + self._size) & 0x7FFFFFFFFFFFFFFF

    def seek(self, offset: int, whence: int = 0) -> int:
        if whence == 0:
            self._pos = offset
        elif whence == 1:
            self._pos += offset
        elif whence == 2:
            self._pos = self._size + offset
        else:
            raise ValueError(f"whence {whence}")
        if self._pos < 0:
            raise OSError("negative seek position")
        return self._pos

    def tell(self) -> int:
        return self._pos

    def read(self, n: int = -1) -> bytes:
        if n is None or n < 0:
            n = self._size - self._pos
        n = max(0, min(n, self._size - self._pos))
        if n == 0:
            return b""
        if self._whole is not None:
            out = self._whole[self._pos : self._pos + n]
            self._pos += len(out)
            return out
        parts = []
        pos, end = self._pos, self._pos + n
        while pos < end:
            bi = pos // self._block
            blk = self._block_at(bi)
            off = pos - bi * self._block
            take = min(end - pos, len(blk) - off)
            if take <= 0:
                break  # short block at EOF
            parts.append(blk[off : off + take])
            pos += take
        out = b"".join(parts)
        self._pos += len(out)
        return out

    def readinto(self, b) -> int:  # pragma: no cover - io fallback
        data = self.read(len(b))
        b[: len(data)] = data
        return len(data)

    def close(self) -> None:
        try:
            self._conn.close()
        finally:
            super().close()


def _http_open(uri: str) -> BinaryIO:
    return HttpRangeFile(uri)


def _http_stat(uri: str) -> tuple[int, int]:
    f = HttpRangeFile(uri, cache_blocks=1)
    try:
        return f.size, f.version_token
    finally:
        f.close()


register_scheme("http", _http_open, _http_stat)
register_scheme("https", _http_open, _http_stat)


# ------------------------------------------------------- multipart upload

def open_multipart(body: bytes, content_type: str,
                   field: str | None = None) -> BinaryIO:
    """Seekable reader over a file part of a ``multipart/form-data``
    request body — the reference's HTTP-upload source
    (``/root/reference/source/http/http.go:9-38`` wraps Go's
    ``multipart.FileHeader.Open`` into its seekable-reader interface;
    here the parsed part lands in memory and serves seeks directly,
    the same contract). ``content_type`` is the request's
    ``Content-Type`` header carrying the boundary; ``field`` picks a
    named form field (default: the first part that has a filename,
    else the first part). Raises ``ValueError`` on a missing boundary
    / field / malformed body."""
    import email.parser
    import email.policy

    if "boundary=" not in content_type:
        raise ValueError(f"no boundary in Content-Type {content_type!r}")
    head = (f"Content-Type: {content_type}\r\nMIME-Version: 1.0\r\n"
            "\r\n").encode()
    msg = email.parser.BytesParser(
        policy=email.policy.HTTP
    ).parsebytes(head + body)
    if not msg.is_multipart():
        raise ValueError("body did not parse as multipart")
    parts = list(msg.iter_parts())
    chosen = None
    for p in parts:
        name = p.get_param("name", header="content-disposition")
        if field is not None:
            if name == field:
                chosen = p
                break
        elif p.get_filename():
            chosen = p
            break
    if chosen is None:
        if field is not None:
            raise ValueError(f"no part named {field!r}")
        if not parts:
            raise ValueError("empty multipart body")
        chosen = parts[0]
    payload = chosen.get_payload(decode=True)
    if payload is None:
        raise ValueError("file part has no payload")
    return io.BytesIO(payload)
