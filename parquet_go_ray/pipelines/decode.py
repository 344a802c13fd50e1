"""Decode pipeline: partition blobs → a streaming ray.data.Dataset,
with column projection and manifest-stat partition pruning."""

from __future__ import annotations

import operator

import pyarrow as pa

import ray

from ..state import manifest as mf
from ..state.blob import decode_table

_OPS = {
    "==": operator.eq,
    ">=": operator.ge,
    "<=": operator.le,
    ">": operator.gt,
    "<": operator.lt,
}


def _stats_may_match(stats: dict, op: str, value) -> bool:
    """Zone-map core: can any row with these min/max stats satisfy
    (op value)? Conservative: unknown stats match."""
    mn, mx = stats.get("min"), stats.get("max")
    if mn is None or mx is None:
        return True
    max_trunc = bool(stats.get("max_trunc"))
    try:
        if op in (">", ">="):
            return True if max_trunc else _OPS[op](mx, value)
        if op in ("<", "<="):
            return _OPS[op](mn, value)
        if op == "==":
            return mn <= value and (max_trunc or value <= mx)
    except TypeError:
        return True
    return True


def _partition_may_match(entry: dict, predicate: tuple[str, str, object]) -> bool:
    """Zone-map check: can any row of this partition satisfy (col op value)?
    Uses the per-column min/max recorded in the lineage manifest — the
    engine analogue of the reference's chunk statistics
    (/root/reference/datastore/int32.go:47-67). Conservative: unknown
    stats keep the partition."""
    col, op, value = predicate
    stats = entry.get("columns", {}).get(col, {}).get("stats") or {}
    # A string max capped at 64 chars (functions/column.py _stats) is a
    # prefix of — and thus smaller than — the true max, so it cannot
    # exclude rows on the high side; _stats_may_match keeps the partition
    # for max-side and equality predicates whenever the flag is set.
    return _stats_may_match(stats, op, value)


def matching_page_spans(
    header: dict, predicate: tuple[str, str, object]
) -> list[tuple[int, int]] | None:
    """Page-level zone maps: (row_offset, row_count) spans of the pages
    whose stats may satisfy the predicate, merged when adjacent. Returns
    None when the predicate column is not paged (no page stats to use);
    an empty list means NO page can match. The blob analogue of the
    reference's page-within-chunk statistics skipping."""
    col, op, value = predicate
    meta = next((c for c in header["columns"] if c["name"] == col), None)
    if meta is None or meta.get("codec") != "paged":
        return None
    spans: list[tuple[int, int]] = []
    pos = 0
    for p in meta["pages"]:
        rows = p["rows"]
        if _stats_may_match(p["meta"].get("stats") or {}, op, value):
            if spans and spans[-1][0] + spans[-1][1] == pos:
                spans[-1] = (spans[-1][0], spans[-1][1] + rows)
            else:
                spans.append((pos, rows))
        pos += rows
    return spans


def decode_pipeline(
    checkpoint_dir: str,
    concurrency: int | tuple[int, int] | None = None,
    columns: list[str] | None = None,
    predicate: tuple[str, str, object] | None = None,
) -> ray.data.Dataset:
    """Stream-decode completed partition blobs back to Arrow rows.

    - ``columns``: decode only these columns (unselected segments are
      never read past the header — SURVEY.md §2.4 projection).
    - ``predicate``: (col, op, value); partitions whose manifest min/max
      cannot satisfy it are skipped entirely, and surviving partitions are
      row-filtered after decode.

    One blob per input block; decode is a map_batches stage so the
    streaming executor pipelines file I/O with the numpy decode kernels.
    """
    import ray as _ray

    if concurrency is None:
        # Same pool shape as the encode merge stage: warm a quarter of
        # the cores, leave headroom for the read tasks (see encode.py).
        cpus = int(_ray.cluster_resources().get("CPU", 8))
        concurrency = (max(1, cpus // 4), max(1, cpus - 2))
    pids = sorted(mf.completed_partitions(checkpoint_dir))
    if not pids:
        raise FileNotFoundError(f"no completed partitions under {checkpoint_dir}")
    if predicate is not None:
        entries = {pid: mf.read_entry(checkpoint_dir, pid) for pid in pids}
        pids = [p for p in pids if _partition_may_match(entries[p], predicate)]
        if not pids:
            return ray.data.from_arrow(pa.table({}))
    paths = [mf.blob_path(checkpoint_dir, pid) for pid in pids]
    ds = ray.data.read_binary_files(paths)

    read_cols = columns
    if predicate is not None and columns is not None and predicate[0] not in columns:
        read_cols = [*columns, predicate[0]]

    return ds.map_batches(
        BlobDecoder,
        fn_constructor_kwargs={
            "read_cols": read_cols,
            "columns": columns,
            "predicate": predicate,
        },
        batch_size=1,  # one blob per call; a blob is already ~100k+ rows
        batch_format="pyarrow",
        concurrency=concurrency,
        num_cpus=1,
    )


class BlobDecoder:
    """Actor-pool decode stage: blob bytes → (projected, filtered) rows."""

    def __init__(self, read_cols=None, columns=None, predicate=None):
        self.read_cols = read_cols
        self.columns = columns
        self.predicate = predicate

    def _decode_one(self, blob: bytes) -> pa.Table:
        if self.predicate is None:
            return decode_table(blob, columns=self.read_cols)
        # Page-level zone maps: when the predicate column is paged, only
        # the row spans whose page stats may match are decoded at all.
        from ..state.blob import read_header

        header, _ = read_header(blob)
        spans = matching_page_spans(header, self.predicate)
        if spans is None:
            return decode_table(blob, columns=self.read_cols)
        parts = [
            decode_table(blob, columns=self.read_cols, row_offset=off, row_count=cnt)
            for off, cnt in spans
        ]
        if not parts:
            # Build a zero-row table with the right projected schema.
            return decode_table(blob, columns=self.read_cols, row_count=0)
        return pa.concat_tables(parts)

    def __call__(self, batch: pa.Table):
        tables = [
            self._decode_one(blob.as_py()) for blob in batch.column("bytes")
        ]
        if not tables:
            # Zero-yield on an empty input batch: emitting pa.table({})
            # would inject an empty-schema block into the stream.
            return
        out = pa.concat_tables(tables)
        if self.predicate is not None and out.num_rows:
            import pyarrow.compute as pc

            col, op, value = self.predicate
            mask = {
                "==": pc.equal,
                ">=": pc.greater_equal,
                "<=": pc.less_equal,
                ">": pc.greater,
                "<": pc.less,
            }[op](out.column(col), value)
            out = out.filter(mask)
            if self.columns is not None and col not in self.columns:
                out = out.select(self.columns)
        yield out
