"""General Dremel shredding and record assembly for the native Parquet
file path (arbitrary struct/list nesting over primitive leaves).

The engine's blob container stores nesting as offsets+validity
(functions/column.py); real Parquet stores it as rep/def level streams
per leaf column. The one-level fast paths live in ``parquet_write.py`` /
``parquet_pages.py``; this module generalizes both directions to any
depth of ``struct`` / ``list`` (maps stay delegated to pyarrow):

- :func:`shred_column` — column → leaf streams ``(rep, def, dense
  values)`` exactly as the reference's reader expects to find them on
  the wire (``layout/page-v1.go:69-116`` level+value streams; the
  recursive schema walk mirrors ``schema/column.go:332-379``).
- :func:`assemble_column` — leaf streams → Arrow column. Bottom-up,
  vectorized: list boundaries from ``rep < r`` runs, element slots from
  ``def`` thresholds, struct children zipped over the shared node-level
  entry stream (all leaves under one node agree on it by construction).

Level conventions (standard Parquet): every *optional* node and every
*repeated* node adds one definition level; every repeated node adds one
repetition level. An entry's ``def`` says how deep the path is defined;
``rep`` says at which repeated ancestor the entry starts a new element.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["shred_column", "assemble_column", "column_depth", "Leaf"]


def _is_list(t: pa.DataType) -> bool:
    return pa.types.is_list(t) or pa.types.is_large_list(t)


def column_depth(t: pa.DataType) -> int:
    """Nesting depth: 0 = primitive, 1 = one struct/list level, …"""
    if _is_list(t):
        return 1 + column_depth(t.value_type)
    if pa.types.is_struct(t):
        return 1 + max(
            column_depth(t.field(i).type) for i in range(t.num_fields)
        )
    return 0


@dataclass
class Leaf:
    """One leaf column's shredded streams."""

    path: list[str]          # schema path, e.g. ["a", "list", "element", "c"]
    field: pa.Field          # the primitive Arrow leaf field
    max_rep: int
    max_def: int
    rep: np.ndarray          # uint8, one per entry
    de: np.ndarray           # uint8, one per entry
    dense: pa.Array          # non-null leaf values, in entry order


@dataclass
class _Ctx:
    """Entry context while shredding: one row per current entry."""

    rep: np.ndarray          # uint8
    de: np.ndarray           # uint8
    idx: np.ndarray          # int64 into the current array; -1 = absent
    cur_rep: int
    cur_def: int


def _validity(arr: pa.Array) -> np.ndarray:
    if arr.null_count == 0:
        return np.ones(len(arr), dtype=bool)
    return ~np.asarray(pc.is_null(arr))


def _apply_optional(arr: pa.Array, nullable: bool, ctx: _Ctx,
                    path: list[str]) -> _Ctx:
    """Consume this node's own optionality: +1 def where the value is
    present; absent values drop to idx -1 (their def freezes here)."""
    if not nullable:
        present = ctx.idx >= 0
        if present.any():
            valid = _validity(arr)
            if not valid[ctx.idx[present]].all():
                raise ValueError(
                    f"null value in non-nullable field {'.'.join(path)}"
                )
        return ctx
    valid = _validity(arr)
    present = ctx.idx >= 0
    ok = np.zeros(len(ctx.idx), dtype=bool)
    ok[present] = valid[ctx.idx[present]]
    de = ctx.de + ok.astype(np.uint8)
    idx = np.where(ok, ctx.idx, -1)
    return _Ctx(ctx.rep, de, idx, ctx.cur_rep, ctx.cur_def + 1)


def _shred(field: pa.Field, arr: pa.Array, ctx: _Ctx,
           path: list[str]) -> list[Leaf]:
    t = field.type
    ctx = _apply_optional(arr, field.nullable, ctx, path)

    if pa.types.is_struct(t):
        out: list[Leaf] = []
        for i in range(t.num_fields):
            ch = t.field(i)
            child = arr.field(i)
            out += _shred(ch, child, ctx, path + [ch.name])
        return out

    if _is_list(t):
        offsets = np.asarray(arr.offsets, dtype=np.int64)
        present = ctx.idx >= 0
        lens = np.zeros(len(ctx.idx), dtype=np.int64)
        if present.any():
            pi = ctx.idx[present]
            lens[present] = offsets[pi + 1] - offsets[pi]
        slots = np.maximum(lens, 1)            # absent/empty keep one entry
        total = int(slots.sum())
        starts = np.zeros(len(slots), dtype=np.int64)
        np.cumsum(slots[:-1], out=starts[1:])
        rep_out = np.full(total, ctx.cur_rep + 1, dtype=np.uint8)
        rep_out[starts] = ctx.rep
        # repeated node: +1 def for entries that carry >= 1 element
        has = lens > 0
        de_out = np.repeat(ctx.de + (has).astype(np.uint8), slots)
        idx_out = np.full(total, -1, dtype=np.int64)
        if has.any():
            lh = lens[has]
            base = np.repeat(offsets[ctx.idx[has]], lh)
            intra = np.arange(int(lh.sum()), dtype=np.int64) - np.repeat(
                np.concatenate(([0], np.cumsum(lh[:-1]))), lh
            )
            pos = np.repeat(starts[has], lh) + intra
            idx_out[pos] = base + intra
        nctx = _Ctx(rep_out, de_out, idx_out,
                    ctx.cur_rep + 1, ctx.cur_def + 1)
        elem = t.value_field
        # canonical parquet path component regardless of Arrow's child
        # field name ("item" by default)
        return _shred(elem, arr.values, nctx, path + ["list", "element"])

    # primitive leaf
    present = ctx.idx >= 0
    dense = arr.take(pa.array(ctx.idx[present], pa.int64()))
    return [Leaf(path, field, ctx.cur_rep, ctx.cur_def,
                 ctx.rep.copy(), ctx.de.copy(), dense)]


def shred_column(field: pa.Field, arr) -> list[Leaf]:
    """Shred one top-level column into its Dremel leaf streams."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_large_list(arr.type):
        arr = arr.cast(pa.list_(arr.type.value_field))
        field = pa.field(field.name, arr.type, field.nullable)
    n = len(arr)
    ctx = _Ctx(np.zeros(n, dtype=np.uint8), np.zeros(n, dtype=np.uint8),
               np.arange(n, dtype=np.int64), 0, 0)
    return _shred(field, arr, ctx, [field.name])


# --- record assembly ------------------------------------------------------


@dataclass
class _Node:
    """Assembly-side schema node with its level coordinates."""

    kind: str                # "struct" | "list" | "leaf"
    field: pa.Field
    nullable: bool
    d_before: int            # def level before this node's own levels
    d_self: int              # def level after this node's optional wrapper
    d_after: int             # after optional (+ repeated for lists)
    r_level: int             # repetition level OF this node's elements
    children: list = dc_field(default_factory=list)
    leaf_slot: int = -1      # index into the leaves list (leaf nodes)


def _build_tree(field: pa.Field, d: int, r: int, counter: list) -> _Node:
    t = field.type
    d_self = d + (1 if field.nullable else 0)
    if pa.types.is_struct(t):
        node = _Node("struct", field, field.nullable, d, d_self, d_self, r)
        for i in range(t.num_fields):
            node.children.append(_build_tree(t.field(i), d_self, r, counter))
        return node
    if _is_list(t):
        d_after = d_self + 1
        node = _Node("list", field, field.nullable, d, d_self, d_after, r + 1)
        node.children.append(
            _build_tree(t.value_field, d_after, r + 1, counter)
        )
        return node
    node = _Node("leaf", field, field.nullable, d, d_self, d_self, r)
    node.leaf_slot = counter[0]
    counter[0] += 1
    return node


def _first_leaf(node: _Node) -> _Node:
    while node.kind != "leaf":
        node = node.children[0]
    return node


def _assemble(node: _Node, leaves: list[tuple[np.ndarray, np.ndarray, pa.Array]]) -> pa.Array:
    """Return an array with ONE item per node-level entry (entries of
    any descendant leaf with rep <= node.r_level); items are null when
    the entry's def says this node's value is absent (def < d_self)."""
    if node.kind == "leaf":
        rep, de, dense = leaves[node.leaf_slot]
        sel = rep <= node.r_level
        de = de[sel]
        valid = de >= node.d_self
        if bool(valid.all()):
            out = dense
        elif len(dense) == 0:
            out = pa.nulls(len(valid), dense.type)
        else:
            idx = np.where(valid, np.cumsum(valid) - 1, 0)
            taken = dense.take(pa.array(idx, pa.int64()))
            out = pc.if_else(
                pa.array(valid), taken, pa.nulls(len(valid), dense.type)
            )
        if len(out) != int(sel.sum()):
            raise ValueError("leaf stream inconsistent with dense values")
        if not out.type.equals(node.field.type):
            # wire physical -> declared logical (binary->string,
            # int64->timestamp, …); keep physical when not castable
            try:
                out = out.cast(node.field.type)
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
                pass
        return out

    if node.kind == "struct":
        ref_leaf = _first_leaf(node)
        rep, de, _ = leaves[ref_leaf.leaf_slot]
        sel = rep <= node.r_level
        de = np.minimum(de[sel], node.d_self + 1)
        children = [_assemble(ch, leaves) for ch in node.children]
        fields = [ch.field for ch in node.children]
        mask = None
        if node.nullable:
            valid = de >= node.d_self
            if not bool(valid.all()):
                mask = pa.array(~valid)
        # Children may carry non-null garbage where the struct itself is
        # absent (their defs freeze below d_self) — the mask hides it.
        return pa.StructArray.from_arrays(children, fields=fields, mask=mask)

    # list node: child stream = entries with rep <= child r-level (==
    # node.r_level); element slots have def >= d_after.
    ref_leaf = _first_leaf(node)
    rep, de, _ = leaves[ref_leaf.leaf_slot]
    sel = rep <= node.r_level
    reps_l = rep[sel]
    des_l = de[sel]
    child = _assemble(node.children[0], leaves)
    elem_mask = des_l >= node.d_after
    if len(child) != len(elem_mask):
        raise ValueError("child stream inconsistent with list level")
    elems = child.filter(pa.array(elem_mask)) if not bool(
        elem_mask.all()
    ) else child
    starts = np.flatnonzero(reps_l < node.r_level)
    if len(starts):
        counts = np.add.reduceat(elem_mask.astype(np.int64), starts)
    else:
        counts = np.empty(0, np.int64)
    offsets = np.zeros(len(counts) + 1, dtype=np.int32)
    np.cumsum(counts, out=offsets[1:])
    start_defs = des_l[starts] if len(starts) else des_l[:0]
    valid = start_defs >= node.d_self
    mask = None if bool(valid.all()) else pa.array(~valid)
    # Declare the target type directly — a cast would re-validate child
    # nullability over slots hidden under null ancestors (Arrow keeps
    # children physically present there).
    lt = pa.list_(node.field.type.value_field)
    return pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()), elems, type=lt, mask=mask
    )


def assemble_column(field: pa.Field, leaf_streams: list[tuple]) -> pa.Array:
    """Rebuild one top-level column from its leaves' ``(rep, def,
    dense)`` streams (ordered as :func:`shred_column` emits them /
    as the leaves appear in the Parquet schema)."""
    counter = [0]
    tree = _build_tree(field, 0, 0, counter)
    if counter[0] != len(leaf_streams):
        raise ValueError(
            f"{field.name}: {counter[0]} leaves expected, "
            f"{len(leaf_streams)} streams given"
        )
    return _assemble(tree, leaf_streams)
