"""Shared cache-directory helper for the compile-at-first-use C kernels.

ADVICE r4 (security): the kernels used to dlopen from a predictable
world-writable path (``/tmp/pgr_*_<srchash>.so``) — on a multi-user host
another local user could pre-plant that .so and execute code in every
process that reads parquet. Cache under a per-uid directory created with
mode 0700 and verify both the directory's and the .so's ownership before
``CDLL``.
"""

from __future__ import annotations

import ctypes
import os
import stat
import tempfile


def cache_dir() -> str:
    """Per-uid 0700 cache dir for compiled kernels; raises if unusable."""
    d = os.path.join(tempfile.gettempdir(), f"pgr-{os.getuid()}")
    os.makedirs(d, mode=0o700, exist_ok=True)
    st = os.lstat(d)
    if (
        not stat.S_ISDIR(st.st_mode)
        or st.st_uid != os.getuid()
        or (st.st_mode & 0o077)
    ):
        raise OSError(f"refusing unsafe kernel cache dir {d!r}")
    return d


def safe_cdll(so_path: str) -> ctypes.CDLL:
    """dlopen only files we own (symlinks rejected via lstat)."""
    st = os.lstat(so_path)
    if not stat.S_ISREG(st.st_mode) or st.st_uid != os.getuid():
        raise OSError(f"refusing to dlopen untrusted {so_path!r}")
    return ctypes.CDLL(so_path)
