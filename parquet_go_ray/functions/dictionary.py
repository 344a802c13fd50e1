"""Dictionary encoding: hash symbol table + hybrid-packed index stream.

Wire format matches the reference (SURVEY.md E8/E9/E14):
- dictionary page: the unique values, PLAIN-encoded for their type
  (/root/reference/layout/page-dict.go:28-80)
- index stream: 1 byte bit-width = bit_length(len(dictionary)) followed by
  an RLE/bit-packed hybrid stream of indices
  (/root/reference/types/dict.go:19-57)
- uniques keep first-occurrence order, exactly what the reference's
  hash-table DictStore produces (/root/reference/datastore/dict.go:55-83);
  we get the same order (and C-speed hashing) from
  ``pyarrow.compute.dictionary_encode``.

The symbol-table hash recorded in the manifest is sha1 of the serialized
dictionary page (the engine's analogue of the reference's FNV-64 value
hashing at datastore/dict.go:98-105 — any exact hash works, per SURVEY §7).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .bytearray import (
    arrow_strings_to_parts,
    delta_length_decode,
    delta_length_encode,
    parts_to_arrow_strings,
)
from .hybrid import hybrid_decode, hybrid_encode
from .plain import plain_decode_numeric, plain_encode_numeric

__all__ = ["dict_encode", "dict_decode", "symtab_hash"]


def symtab_hash(dict_page: bytes) -> str:
    return hashlib.sha1(dict_page).hexdigest()


def _encode_dict_values(dictionary: pa.Array) -> tuple[bytes, str]:
    """Serialize unique values. Strings/binary go as delta-length (lengths
    stream + raw bytes); numerics as plain LE. Returns (payload, kind)."""
    typ = dictionary.type
    if pa.types.is_string(typ) or pa.types.is_large_string(typ):
        lens, data = arrow_strings_to_parts(dictionary)
        return delta_length_encode(lens, data), "str"
    if pa.types.is_binary(typ) or pa.types.is_large_binary(typ):
        lens, data = arrow_strings_to_parts(dictionary)
        return delta_length_encode(lens, data), "bin"
    np_vals = dictionary.to_numpy(zero_copy_only=False)
    return plain_encode_numeric(np_vals), str(np_vals.dtype)


def _decode_dict_values(payload: bytes, kind: str, count: int) -> pa.Array:
    if kind in ("str", "bin"):
        lens, data, _ = delta_length_decode(payload, count)
        return parts_to_arrow_strings(lens, data, binary=(kind == "bin"))
    vals = plain_decode_numeric(payload, np.dtype(kind), count)
    return pa.array(vals)


def dict_encode(arr: pa.Array) -> tuple[bytes, dict]:
    """Encode a null-free array. Returns (payload, meta).

    payload = [uvarint dict_count][dict kind byte-len + kind][dict page]
               [1 byte index bit-width][hybrid index stream]
    meta carries the symbol-table hash and sizes for the manifest.
    """
    from .varint import uvarint_encode

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    denc = pc.dictionary_encode(arr)
    dictionary = denc.dictionary
    indices = denc.indices.to_numpy(zero_copy_only=False).astype(np.uint64)
    dict_page, kind = _encode_dict_values(dictionary)
    width = max(1, len(dictionary).bit_length())  # ref types/dict.go bit-width rule
    idx_stream = hybrid_encode(indices, width)
    kind_b = kind.encode()
    payload = (
        uvarint_encode(len(dictionary))
        + bytes([len(kind_b)])
        + kind_b
        + uvarint_encode(len(dict_page))
        + dict_page
        + bytes([width])
        + idx_stream
    )
    meta = {
        "symtab_hash": symtab_hash(dict_page),
        "dict_count": len(dictionary),
        "dict_bytes": len(dict_page),
    }
    return payload, meta


def dict_decode(data, count: int, pos: int = 0) -> tuple[pa.Array, int]:
    from .varint import uvarint_decode

    dict_count, pos = uvarint_decode(data, pos)
    klen = data[pos]
    pos += 1
    kind = bytes(data[pos : pos + klen]).decode()
    pos += klen
    page_len, pos = uvarint_decode(data, pos)
    dictionary = _decode_dict_values(bytes(data[pos : pos + page_len]), kind, dict_count)
    pos += page_len
    width = data[pos]
    pos += 1
    indices, pos = hybrid_decode(data, width, count, pos)
    if count and dict_count == 0:
        raise ValueError("indices with empty dictionary")
    if count and int(indices.max()) >= dict_count:
        raise ValueError("dictionary index out of range")  # ref types/dict.go:98-103
    result = dictionary.take(pa.array(indices.astype(np.int64)))
    return result, pos
