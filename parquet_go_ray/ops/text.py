"""Text analysis stages over documents: token counting, quality metrics,
deterministic fingerprints, language identification. All map_batches
stages over zero-copy Arrow; string kernels are pyarrow.compute where one
exists. The token rule (split on a single space) is chosen to be exactly
re-expressible in ANSI SQL (string_split(text, ' ')) so the DuckDB oracle
can replay it bit-for-bit."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray


def _set(batch: pa.Table, name: str, arr) -> pa.Table:
    """Replace-or-append a column (input tables may already carry one)."""
    if name in batch.column_names:
        return batch.set_column(batch.column_names.index(name), name, arr)
    return batch.append_column(name, arr)


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    toks = pc.split_pattern(batch.column(text_col), pattern=" ")
    return _set(batch, "n_tokens", pc.list_value_length(toks).cast(pa.int64()))


def quality_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    text = batch.column(text_col)
    n_chars = pc.utf8_length(text).cast(pa.int64())
    n_tokens = pc.list_value_length(pc.split_pattern(text, pattern=" ")).cast(pa.int64())
    chars_per_token = pc.divide(
        n_chars.cast(pa.float64()), n_tokens.cast(pa.float64())
    )
    out = _set(batch, "n_chars", n_chars)
    out = _set(out, "n_tokens", n_tokens)
    out = _set(out, "chars_per_token", chars_per_token)
    return out


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """md5 hex fingerprint per document (SQL-replayable: md5(text))."""
    texts = batch.column(text_col).to_pylist()
    fps = [hashlib.md5((t or "").encode()).hexdigest() for t in texts]
    return batch.append_column("fingerprint", pa.array(fps, pa.string()))


def rolling_fingerprint_batch(
    batch: pa.Table, text_col: str = "text", window: int = 8
) -> pa.Table:
    """Polynomial rolling-hash document fingerprint (non-crypto, fast,
    vectorized): FNV-style fold over the raw bytes — the engine-native
    analogue of the reference's FNV-64 value hashing
    (/root/reference/datastore/dict.go:98-105)."""
    texts = [t.encode() if t else b"" for t in batch.column(text_col).to_pylist()]
    lens = np.array([len(t) for t in texts], dtype=np.int64)
    data = (
        np.frombuffer(b"".join(texts), dtype=np.uint8).astype(np.uint64)
        if texts
        else np.empty(0, dtype=np.uint64)
    )
    # Segmented polynomial hash via prefix products is unstable; a simple
    # per-doc reduceat of mixed byte positions is associative and exact.
    pos = np.arange(len(data), dtype=np.uint64)
    starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
    rel = pos - np.repeat(starts.astype(np.uint64), lens)
    mixed = (data + np.uint64(1)) * (
        (rel + np.uint64(0x100000001B3)) * np.uint64(0x9E3779B97F4A7C15)
    )
    sums = (
        np.add.reduceat(mixed, starts)
        if len(mixed)
        else np.zeros(len(lens), dtype=np.uint64)
    )
    sums = np.where(lens > 0, sums, np.uint64(0))
    return batch.append_column("rolling_fp", pa.array(sums, pa.uint64()))


# ---------------------------------------------------------------------------
# Language identification: stopword-profile + script heuristic.

_STOPWORDS = {
    "en": "the of and to in a is that it for on as with be this are was at by an have from or had not but what all were when we there can".split(),
    "de": "der die das und ist in den von zu mit sich des auf für nicht ein eine als auch es an werden aus er hat dass sie nach wird bei einer um".split(),
    "fr": "le la les de des et un une dans est que pour qui sur avec ne se pas plus par au il elle ce cette mais ou donc comme".split(),
    "es": "el la los las de y un una en es que por para con no se del al lo como más pero sus le ya o este sí porque".split(),
}


def _script_counts(codepoints: np.ndarray) -> dict[str, int]:
    return {
        "cjk": int(((codepoints >= 0x4E00) & (codepoints <= 0x9FFF)).sum()),
        "cyrillic": int(((codepoints >= 0x0400) & (codepoints <= 0x04FF)).sum()),
        "arabic": int(((codepoints >= 0x0600) & (codepoints <= 0x06FF)).sum()),
    }


def langid_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Detect language: non-Latin scripts by codepoint ranges, Latin
    languages by stopword-hash profile counts (vectorized np.isin over
    hashed tokens + per-doc reduceat)."""
    texts = batch.column(text_col).to_pylist()
    langs = list(_STOPWORDS)
    stop_hashes = {
        lang: pd.util.hash_array(np.array(ws, dtype=object), categorize=False)
        for lang, ws in _STOPWORDS.items()
    }
    token_lists = [(t or "").lower().split() for t in texts]
    counts = np.array([max(1, len(t)) for t in token_lists], dtype=np.int64)
    flat = np.array(
        [tok for toks in token_lists for tok in (toks or [""])], dtype=object
    )
    h = pd.util.hash_array(flat, categorize=False)
    starts = np.concatenate(([0], np.cumsum(counts)))[:-1]
    n = len(texts)
    scores = np.zeros((n, len(langs)), dtype=np.float64)
    for j, lang in enumerate(langs):
        hit = np.isin(h, stop_hashes[lang]).astype(np.int64)
        per_doc = np.add.reduceat(hit, starts) if len(hit) else np.zeros(n)
        scores[:, j] = per_doc / counts
    best = np.argmax(scores, axis=1)
    best_score = scores[np.arange(n), best]
    out = []
    for i, t in enumerate(texts):
        cps = np.frombuffer((t or "").encode("utf-32-le"), dtype=np.uint32)
        sc = _script_counts(cps)
        total = max(1, len(cps))
        if sc["cjk"] / total > 0.2:
            out.append("zh")
        elif sc["cyrillic"] / total > 0.2:
            out.append("ru")
        elif sc["arabic"] / total > 0.2:
            out.append("ar")
        elif best_score[i] > 0.02:
            out.append(langs[best[i]])
        else:
            out.append("und")
    return batch.append_column("lang_pred", pa.array(out, pa.string()))


class BpeishTokenCounter:
    """Stateful actor stage: GPT-2-style pre-tokenizer regex token counts.

    The pattern compiles ONCE per actor in __init__ (the reference pattern
    for stateful map_batches stages — setup per actor, work per batch),
    then counts matches per document. Python `re` lacks \\p classes, so
    the letter class approximates \\p{L} with Latin ranges — documented
    deviation, deterministic.
    """

    PATTERN = (
        r"'(?:[sdmt]|ll|ve|re)"
        r"| ?[A-Za-zÀ-ɏͰ-ϿЀ-ӿ]+"
        r"| ?\d+"
        r"| ?[^\sA-Za-z\dÀ-ɏͰ-ϿЀ-ӿ]+"
        r"|\s+"
    )

    def __init__(self, text_col: str = "text"):
        import re

        self.text_col = text_col
        self.pattern = re.compile(self.PATTERN)

    def __call__(self, batch: pa.Table) -> pa.Table:
        counts = [
            len(self.pattern.findall(t or ""))
            for t in batch.column(self.text_col).to_pylist()
        ]
        return _set(batch, "n_bpe_tokens", pa.array(counts, pa.int64()))


def apply(ds: ray.data.Dataset, fn, **kwargs) -> ray.data.Dataset:
    return ds.map_batches(
        fn, fn_kwargs=kwargs, batch_format="pyarrow", zero_copy_batch=True
    )


def apply_actor(
    ds: ray.data.Dataset, cls, concurrency=(1, 8), **ctor_kwargs
) -> ray.data.Dataset:
    return ds.map_batches(
        cls,
        fn_constructor_kwargs=ctor_kwargs,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        num_cpus=1,
    )
