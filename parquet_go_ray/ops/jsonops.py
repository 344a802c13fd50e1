"""Vectorized scalar-field extraction from FLAT JSON string columns —
the metadata/props sidecar every log-derived training corpus carries
(``events.props`` in the test corpus).

The hot path is ONE RE2 kernel per batch (``pc.extract_regex`` —
Arrow C++, no Python per row), the same buffer-level discipline as
``ops/text.py``'s extraction stages. That buys a hard, documented
contract boundary instead of a JSON parser:

- The object must be FLAT (no nested objects/arrays): the pattern
  finds the FIRST ``"key":`` occurrence anywhere in the string, so a
  key repeated inside a nested object would be mis-attributed. Scalar
  values only — a key whose value IS an object/array yields null.
- ``out_type="string"`` unescapes the common single-char escapes
  (``\\" \\\\ \\/ \\n \\t \\r \\b \\f``); a value containing a
  ``\\uXXXX`` escape yields null rather than a silently-wrong string.

For full JSON (nested paths, unicode escapes) route the column
through a real parser in an actor-pool stage instead; this operator
exists because the overwhelmingly common flat-props case shouldn't
pay per-row Python. Extraction failures of every kind are nulls, like
SQL's ``json_extract`` on a missing path.
"""

from __future__ import annotations

import re

import pyarrow as pa

import ray

_TYPES = ("raw", "string", "double", "int64", "bool")

# one alternation covering every JSON scalar token
_SCALAR = (
    r'"(?:[^"\\]|\\.)*"'                # string (escapes opaque here)
    r"|-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?"  # number
    r"|true|false|null"
)

# Applied AFTER escaped backslashes are swapped to _BS_SENTINEL, so a
# pair like ``\\b`` can't be half-eaten by the ``\b`` rule. The
# sentinel is NUL: valid JSON must escape every control char, so a raw
# NUL byte cannot appear inside a string value.
_BS_SENTINEL = "\x00"
_UNESCAPES = [
    ("\\\"", "\""), ("\\/", "/"), ("\\n", "\n"), ("\\t", "\t"),
    ("\\r", "\r"), ("\\b", "\b"), ("\\f", "\f"),
]

# int64 bounds as digit strings for the vectorized overflow gate
_I64_POS = "9223372036854775807"
_I64_NEG = "9223372036854775808"


def json_field(
    ds: ray.data.Dataset,
    col: str,
    key: str,
    out_col: str | None = None,
    out_type: str = "raw",
) -> ray.data.Dataset:
    """Append ``out_col`` = the scalar value of ``key`` in the flat
    JSON object held by string column ``col``.

    ``out_type``: ``raw`` (the JSON token text, quotes and all),
    ``string`` (unquoted + unescaped, non-strings → null), ``double``
    / ``int64`` (numeric tokens, others → null; int64 rejects
    fractional/exponent forms rather than truncating), ``bool``.
    Null rows, missing keys, and JSON ``null`` values are all null.
    """
    if out_type not in _TYPES:
        raise ValueError(f"out_type must be one of {_TYPES}, got {out_type!r}")
    if out_col is None:
        out_col = key
    pattern = rf'"{re.escape(key)}"\s*:\s*(?P<v>{_SCALAR})'

    def f(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        c = batch.column(col)
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        tok = pc.struct_field(pc.extract_regex(c, pattern), "v")
        # JSON null → SQL null, uniformly for every out_type
        tok = pc.if_else(pc.equal(tok, "null"),
                         pa.nulls(len(tok), tok.type), tok)
        if out_type == "raw":
            out = tok
        elif out_type == "string":
            is_str = pc.match_substring_regex(tok, r'^"')
            body = pc.utf8_slice_codeunits(tok, 1, stop=-1)
            # escaped backslashes out of the way FIRST, so the \u
            # probe and the single-char rules below see only real
            # escape introducers (``\\u`` is literal-backslash + u,
            # not a unicode escape)
            body = pc.replace_substring(body, "\\\\", _BS_SENTINEL)
            has_u = pc.match_substring_regex(body, r"\\u")
            for esc, rep in _UNESCAPES:
                body = pc.replace_substring(body, esc, rep)
            body = pc.replace_substring(body, _BS_SENTINEL, "\\")
            ok = pc.and_(is_str, pc.invert(has_u))
            out = pc.if_else(pc.fill_null(ok, False), body,
                             pa.nulls(len(tok), pa.string()))
        elif out_type in ("double", "int64"):
            num_pat = (r"^-?\d+$" if out_type == "int64"
                       else r"^-?\d+(\.\d+)?([eE][+-]?\d+)?$")
            is_num = pc.fill_null(
                pc.match_substring_regex(tok, num_pat), False)
            safe = pc.if_else(is_num, tok, pa.nulls(len(tok), tok.type))
            if out_type == "int64":
                # overflow gate: tokens past ±2^63 are nulls (the
                # module contract), not an ArrowInvalid killing the
                # batch. Valid JSON bans leading zeros, so digit
                # length + one lexicographic compare is exact.
                mag = pc.utf8_ltrim(safe, "-")
                dlen = pc.utf8_length(mag)
                lim = pc.if_else(
                    pc.starts_with(safe, "-"), _I64_NEG, _I64_POS)
                fits = pc.or_(
                    pc.less(dlen, 19),
                    pc.and_(pc.equal(dlen, 19), pc.less_equal(mag, lim)),
                )
                safe = pc.if_else(pc.fill_null(fits, False), safe,
                                  pa.nulls(len(tok), tok.type))
                out = pc.cast(safe, pa.int64())
            else:
                out = pc.cast(safe, pa.float64())
        else:  # bool
            is_b = pc.fill_null(pc.is_in(
                tok, value_set=pa.array(["true", "false"])), False)
            out = pc.if_else(
                is_b, pc.equal(tok, "true"), pa.nulls(len(tok), pa.bool_())
            )
        if out_col in batch.column_names:
            return batch.set_column(
                batch.column_names.index(out_col), out_col, out
            )
        return batch.append_column(out_col, out)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)
