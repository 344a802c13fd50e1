"""One-pass corpus profiling: the summary report a curation run
starts and ends with.

Everything a pipeline owner asks before/after a cleaning pass — how
many docs, how many tokens, what languages, how much exact
duplication — computed in ONE streaming aggregate over the corpus:
each batch contributes a small mergeable partial (counts, sums, a
language histogram from the vectorized langid kernel, and an HLL
register array of the 128-bit text hashes for approximate distinct
docs), tasks combine locally, and the driver folds partials into one
dict. No shuffle; driver memory is the 16 KiB HLL plus a few
counters. The exact-dup rate is the HLL complement
(``1 - distinct/docs``, rel err ~0.8% at p=14) — run
``ops.dedup.dedup_exact`` when the exact figure matters.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from .dedup import _hash128
from .sketch import hll_estimate, hll_registers
from .text import langid_batch

__all__ = ["profile_corpus"]

_HLL_P = 14


def _partial(batch: pa.Table, text_col: str):
    text = pc.fill_null(batch.column(text_col), "")
    n_chars = pc.utf8_length(text).cast(pa.int64())
    n_tokens = pc.list_value_length(
        pc.split_pattern(text, pattern=" ")
    ).cast(pa.int64())
    lang = (
        langid_batch(pa.table({text_col: text}), text_col)
        .column("lang_pred")
    )
    vc = pc.value_counts(lang)
    langs = dict(zip(
        vc.field("values").to_pylist(),
        (int(c) for c in vc.field("counts").to_pylist()),
    ))
    texts = text.to_numpy(zero_copy_only=False)
    h1, _ = _hash128(texts)
    return {
        "docs": batch.num_rows,
        "chars": int(pc.sum(n_chars).as_py() or 0),
        "tokens": int(pc.sum(n_tokens).as_py() or 0),
        "langs": langs,
        "hll": hll_registers(h1, _HLL_P),
    }


def _merge(a: dict, b: dict) -> dict:
    langs = dict(a["langs"])
    for k, v in b["langs"].items():
        langs[k] = langs.get(k, 0) + v
    return {
        "docs": a["docs"] + b["docs"],
        "chars": a["chars"] + b["chars"],
        "tokens": a["tokens"] + b["tokens"],
        "langs": langs,
        "hll": np.maximum(a["hll"], b["hll"]),
    }


def profile_corpus(
    ds: ray.data.Dataset, text_col: str = "text"
) -> dict:
    """One streaming pass → summary dict: ``docs``, ``chars``,
    ``tokens``, ``mean_chars``/``mean_tokens`` per doc, ``langs``
    (doc counts per detected language, descending),
    ``approx_distinct_texts`` and ``approx_exact_dup_rate`` (HLL)."""
    agg = ray.data.aggregate.AggregateFn(
        init=lambda _: {
            "docs": 0, "chars": 0, "tokens": 0, "langs": {},
            "hll": np.zeros(1 << _HLL_P, dtype=np.uint8),
        },
        accumulate_block=lambda acc, block: _merge(
            acc, _partial(block, text_col)
        ),
        merge=_merge,
        name="profile",
    )
    out = ds.aggregate(agg)
    p = out["profile"] if out else None
    if p is None or p["docs"] == 0:
        return {"docs": 0, "chars": 0, "tokens": 0, "langs": {},
                "mean_chars": 0.0, "mean_tokens": 0.0,
                "approx_distinct_texts": 0,
                "approx_exact_dup_rate": 0.0}
    # the aggregate result may round-trip numpy -> list through the
    # block format; normalize before estimating
    reg = np.asarray(p["hll"], dtype=np.uint8)
    distinct = min(round(hll_estimate(reg)), p["docs"])
    return {
        "docs": p["docs"],
        "chars": p["chars"],
        "tokens": p["tokens"],
        "mean_chars": p["chars"] / p["docs"],
        "mean_tokens": p["tokens"] / p["docs"],
        "langs": dict(sorted(p["langs"].items(),
                             key=lambda kv: (-kv[1], kv[0]))),
        "approx_distinct_texts": int(distinct),
        "approx_exact_dup_rate": max(
            0.0, 1.0 - distinct / p["docs"]
        ),
    }
