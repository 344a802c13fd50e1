"""Differential tests: the vectorized bulk-scan token counter must agree
with the compiled reference regex on every input; vectorized script
ratios must agree with per-doc counting."""

import numpy as np
import pytest

from parquet_go_ray.ops.text import (
    BpeishTokenCounter,
    _script_ratios,
    bpeish_token_counts,
)

COUNTER = BpeishTokenCounter.__new__(BpeishTokenCounter)
COUNTER.__init__()


def _check(texts):
    got = bpeish_token_counts(list(texts))
    exp = np.array([COUNTER.count_regex(t) for t in texts], dtype=np.int64)
    mism = [
        (t, int(g), int(e)) for t, g, e in zip(texts, got, exp) if g != e
    ]
    assert not mism, mism[:5]


def test_bpe_handpicked_cases():
    _check(
        [
            "",
            " ",
            "  ",
            "a",
            " a",
            "  a",
            "don't stop me now",
            "it's",
            "it 's",
            "it  's",
            "'s",
            "'sock",
            "'ll",
            "'llama",
            "'l ",
            "x''s",
            "'s's",
            "we've they're i'd i'm can't",
            "hello, world! 123 foo-bar_baz",
            "tabs\tand\nnewlines \t mixed",
            "trailing space ",
            " leading",
            "a  b   c    d",
            "!!'s ??",
            "price: $4.99 (20% off)",
            "ÀÉÎÕÜ àéîõü Ѐжѝ Ͱͷ δεζ",
            "mixed Ёlang wörds",
            "'S uppercase not contraction",
            "'re's 've'll",
            "123'456",
            "a'",
            "'",
            "''",
            "' ",
            " '",
            " 'a",
            "d'Artagnan o'clock",
        ]
    )


def test_bpe_random_differential():
    rng = np.random.default_rng(42)
    alphabet = (
        list("abcdefgh ") * 3
        + list("sdmtlvre'")  # contraction-heavy
        + list("0123456789")
        + list(".,!?-_()$%")
        + list(" \t\n")
        + list("Àéϵжѝ中文я")  # unicode letters + CJK (punct class)
        + list("  ")  # unicode spaces
    )
    texts = [
        "".join(rng.choice(alphabet, size=rng.integers(0, 80)))
        for _ in range(400)
    ]
    _check(texts)


def test_bpe_batch_matches_per_doc():
    # Counting docs together (one concatenated buffer) must equal
    # counting each alone — doc boundaries break runs.
    texts = ["abc def", "!!", " x", "", "'s", "tail "]
    together = bpeish_token_counts(texts)
    alone = np.array([bpeish_token_counts([t])[0] for t in texts])
    assert (together == alone).all()


def test_script_ratios_match_per_doc():
    texts = [
        "hello world",
        "这是中文文档测试",
        "это русский текст",
        "نص عربي هنا",
        "",
        "mixed 中文 and latin",
    ]
    ratios = _script_ratios(texts)
    for i, t in enumerate(texts):
        cps = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
        total = max(1, len(cps))
        assert ratios["zh"][i] == pytest.approx(
            ((cps >= 0x4E00) & (cps <= 0x9FFF)).sum() / total
        )
        assert ratios["ru"][i] == pytest.approx(
            ((cps >= 0x0400) & (cps <= 0x04FF)).sum() / total
        )


def test_bpe_counts_on_documents_corpus():
    """The real corpus: bulk scan == per-doc regex on every document."""
    import pyarrow.parquet as pq

    t = pq.read_table("/root/testdata/sf0.001/documents.parquet", columns=["text"])
    texts = [x or "" for x in t.column("text").to_pylist()]
    _check(texts)
