"""Differential tests: the vectorized bulk-scan token counter must agree
with the compiled reference regex on every input; vectorized script
ratios must agree with per-doc counting."""

import numpy as np
import pyarrow as pa
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


class TestHashedTokens:
    """The Arrow-buffer token hasher must match str.split() semantics
    and the scalar reference hash exactly (VERDICT r3 item 7)."""

    CORPUS = [
        "the quick brown fox", "", "  leading and trailing  ",
        "tabs\tand\nnewlines mixed", "ÜBER größe façade",
        "один два три", "多字节 中文 词", "x", "   ", None,
        "repeat repeat repeat", "a b c d e f g h i j k l m n o p",
    ]

    def test_counts_match_str_split(self):
        from parquet_go_ray.ops.text import hashed_tokens

        col = pa.array([t if t is not None else None for t in self.CORPUS],
                       pa.string())
        h, counts = hashed_tokens(col)
        expect = [max(1, len((t or "").split())) for t in self.CORPUS]
        assert counts.tolist() == expect
        assert len(h) == sum(expect)

    def test_hashes_match_scalar_reference(self):
        from parquet_go_ray.ops.text import _poly_hash_token, hashed_tokens

        col = pa.array([t for t in self.CORPUS], pa.string())
        h, counts = hashed_tokens(col, lower=True)
        flat_ref = []
        for t in self.CORPUS:
            toks = (t or "").lower().split()
            if not toks:
                flat_ref.append(0)
            else:
                flat_ref.extend(_poly_hash_token(w.encode()) for w in toks)
        assert h.tolist() == flat_ref

    def test_langid_same_verdicts_as_python_tokenization(self):
        """langid predictions over a mixed-language corpus are identical
        to a per-doc Python tokenization of the same scoring rule."""
        from parquet_go_ray.ops.text import (
            _script_ratios,
            _stop_hash_tables,
            _STOPWORDS,
            langid_batch,
        )

        docs = [
            "the cat sat on the mat and it was happy with all of that",
            "der hund ist nicht in dem haus und er hat das auch nie",
            "le chat est dans la maison avec les enfants et il ne dort pas",
            "el perro es grande y la casa es de los niños que no duermen",
            "слово один два три четыре пять шесть семь восемь девять",
            "这是 一个 中文 句子 测试 文本 内容",
            "zxqj vbnm qwrt plkj",  # no stopwords -> und
            "",
        ]
        batch = pa.table({"text": pa.array(docs, pa.string())})
        got = langid_batch(batch).column("lang_pred").to_pylist()
        # scalar replay of the same rule
        from parquet_go_ray.ops.text import _poly_hash_token
        import numpy as np

        tabs = _stop_hash_tables()
        preds = []
        ratios = _script_ratios(docs)
        for i, d in enumerate(docs):
            toks = d.lower().split()
            hs = [_poly_hash_token(w.encode()) for w in toks] or [0]
            scores = {
                lang: sum(h in set(int(x) for x in tab) for h in hs)
                / max(1, len(toks))
                for lang, tab in tabs.items()
            }
            best = max(scores, key=lambda k: scores[k])
            if ratios["zh"][i] > 0.2:
                preds.append("zh")
            elif ratios["ru"][i] > 0.2:
                preds.append("ru")
            elif ratios["ar"][i] > 0.2:
                preds.append("ar")
            elif scores[best] > 0.02:
                preds.append(best)
            else:
                preds.append("und")
        assert got == preds
        assert got[0] == "en" and got[1] == "de" and got[2] == "fr"
        assert got[3] == "es" and got[4] == "ru" and got[5] == "zh"
        assert got[6] == "und"


def test_hashed_tokens_large_string_matches_string():
    """ADVICE r4: large_string offsets are int64 — reading them as int32
    silently produced garbage hashes."""
    import pyarrow as pa

    from parquet_go_ray.ops.text import hashed_tokens

    docs = ["hello world", "", "  spaced\tout  tokens ", "héllo wörld"]
    h32, c32 = hashed_tokens(pa.array(docs, pa.string()), lower=True)
    h64, c64 = hashed_tokens(pa.array(docs, pa.large_string()), lower=True)
    assert (h32 == h64).all() and (c32 == c64).all()


def test_rolling_fingerprint_pinned_and_edge_cases():
    """r5: rolling_fingerprint_batch left the driver gate (rows-only),
    so pin it here against a scalar reference — including the empty-
    last-row case the old reduceat crashed on, nulls, and large_string."""
    import numpy as np
    import pyarrow as pa

    from parquet_go_ray.ops.text import rolling_fingerprint_batch

    def ref_fp(s):
        if not s:
            return 0
        total = 0
        for i, b in enumerate(s.encode()):
            mixed = ((b + 1) * (
                ((i + 0x100000001B3) * 0x9E3779B97F4A7C15) % 2**64
            )) % 2**64
            total = (total + mixed) % 2**64
        return total

    docs = ["hello", "", None, "wörld!", "x" * 1000, ""]
    for typ in (pa.string(), pa.large_string()):
        out = rolling_fingerprint_batch(
            pa.table({"text": pa.array(docs, typ)})
        )
        got = out.column("rolling_fp").to_pylist()
        assert got == [ref_fp(d or "") for d in docs]
    # sliced batch (non-zero Arrow offset)
    t = pa.table({"text": pa.array(docs)}).slice(2, 3)
    got = rolling_fingerprint_batch(t).column("rolling_fp").to_pylist()
    assert got == [ref_fp(d or "") for d in docs[2:5]]


def test_utf32_cps_matches_python_strings():
    """The buffer-direct codepoint extractor (r5: replaces the last
    to_pylist in langid/BPE stages) must agree with the Python-string
    path on nulls, multibyte scripts, empties, slices and
    large_string."""
    from parquet_go_ray.ops.text import _utf32_cps

    docs = ["héllo", "", None, "日本語テキスト", "x" * 500, "𝄞 clef", ""]

    def ref(texts):
        joined = "".join(texts)
        cps = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
        lens = np.array([len(t) for t in texts], dtype=np.int64)
        return cps, lens

    for typ in (pa.string(), pa.large_string()):
        cps, lens = _utf32_cps(pa.array(docs, typ))
        rcps, rlens = ref([d or "" for d in docs])
        assert np.array_equal(cps, rcps)
        assert np.array_equal(lens, rlens)
        assert lens.sum() == len(cps)
    # sliced (non-zero Arrow offset) and chunked inputs
    cps, lens = _utf32_cps(pa.array(docs).slice(2, 4))
    rcps, rlens = ref([d or "" for d in docs[2:6]])
    assert np.array_equal(cps, rcps) and np.array_equal(lens, rlens)
    cps, lens = _utf32_cps(
        pa.chunked_array([pa.array(docs[:3]), pa.array(docs[3:])])
    )
    assert np.array_equal(cps, rcps := ref([d or "" for d in docs])[0])
    # empty column
    cps, lens = _utf32_cps(pa.array([], pa.string()))
    assert len(cps) == 0 and len(lens) == 0
