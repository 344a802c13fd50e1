"""Deterministic synthetic multi-turn transcript generator (FIXTURES.md F1).

Schema is exactly the north-rule ``input_hint``:
    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string, ts:timestamp[us]

Signals by design:
- conversation lengths are zipf-ish heavy-tailed → hot conv_ids exercise
  the skew-salting path;
- role/tool are low-cardinality with long runs after sorting → dict/RLE;
- turn_idx is a per-conversation ramp → FOR/delta;
- ts is monotonic within a conversation → delta-BP on int64 micros;
- text is seeded token soup with recurring boilerplate phrases plus
  unicode so dict never wins but FSST/zstd have shared substrings;
- tool is null ~80% of rows → the definition-level/validity path.

Everything derives from ``np.random.default_rng(seed)`` — same seed, same
table, on any machine (the determinism the codec-selection retry story
depends on, SURVEY.md §7 step 0).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()),
        pa.field("text", pa.string()),
        pa.field("tool", pa.string()),
        pa.field("ts", pa.timestamp("us")),
    ]
)

_ROLES = np.array(["user", "assistant", "system", "tool"])
_ROLE_P = np.array([0.4, 0.4, 0.05, 0.15])
_TOOLS = np.array(
    [
        "search",
        "calculator",
        "code_exec",
        "file_read",
        "file_write",
        "browser",
        "sql",
        "shell",
        "translate",
        "summarize",
        "vision",
        "speech",
    ]
)
_PHRASES = [
    "I understand your question about",
    "Let me check that for you.",
    "Here is what I found:",
    "Could you clarify what you mean by",
    "The result of the computation is",
    "Based on the documentation,",
    "That looks correct to me.",
    "An error occurred while running",
    "Thanks! That resolved the issue.",
    "Let's break this down step by step.",
]


def _vocab(rng: np.random.Generator, size: int = 5000) -> np.ndarray:
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    lens = rng.integers(2, 11, size)
    out = []
    for ln in lens:
        out.append("".join(rng.choice(letters, ln)))
    extra = ["函数", "数据", "🎉", "naïve", "café", "Ω", "λ", "→"]
    return np.array(out + extra)


def generate_transcripts(
    num_turns: int, seed: int = 42, start_conv: int = 0
) -> pa.Table:
    """Generate ~num_turns turns of transcripts (whole conversations, so the
    actual row count may overshoot slightly). ``start_conv`` offsets conv
    ids so multiple shards generate disjoint, deterministic conversations."""
    rng = np.random.default_rng((seed, start_conv))
    vocab = _vocab(rng)

    conv_lens = []
    total = 0
    while total < num_turns:
        # Heavy-tailed conversation lengths, clipped to [1, 500].
        ln = int(min(500, max(1, rng.zipf(1.3))))
        conv_lens.append(ln)
        total += ln
    conv_lens = np.array(conv_lens, dtype=np.int64)
    n = int(conv_lens.sum())
    n_convs = len(conv_lens)

    conv_ids_unique = np.array(
        [f"conv-{start_conv + i:08d}" for i in range(n_convs)]
    )
    conv_id = np.repeat(conv_ids_unique, conv_lens)
    turn_idx = (
        np.arange(n, dtype=np.int64)
        - np.repeat(np.concatenate(([0], np.cumsum(conv_lens)))[:-1], conv_lens)
    ).astype(np.int32)

    role = rng.choice(_ROLES, size=n, p=_ROLE_P)
    has_tool = rng.random(n) < 0.2
    tool = np.where(has_tool, rng.choice(_TOOLS, size=n), None)

    # Timestamps: per-conversation base + cumulative gaps (monotonic within).
    base = rng.integers(1_700_000_000, 1_750_000_000, n_convs) * 1_000_000
    gaps = rng.integers(1_000_000, 300_000_000, n)  # 1-300 s in micros
    gap_cum = np.cumsum(gaps)
    conv_starts = np.concatenate(([0], np.cumsum(conv_lens)))[:-1]
    gap_base = np.repeat(gap_cum[conv_starts] - gaps[conv_starts], conv_lens)
    ts = np.repeat(base, conv_lens) + (gap_cum - gap_base)

    # Text: 1% empty; else boilerplate phrase ~50% + token soup.
    n_words = np.maximum(1, rng.lognormal(2.2, 1.0, n).astype(np.int64))
    n_words = np.minimum(n_words, 600)
    empty = rng.random(n) < 0.01
    n_words[empty] = 0
    total_words = int(n_words.sum())
    words = rng.choice(vocab, size=total_words)
    bounds = np.concatenate(([0], np.cumsum(n_words)))
    use_phrase = rng.random(n) < 0.5
    phrase_pick = rng.integers(0, len(_PHRASES), n)
    texts = []
    for i in range(n):
        body = " ".join(words[bounds[i] : bounds[i + 1]])
        if use_phrase[i] and not empty[i]:
            body = f"{_PHRASES[phrase_pick[i]]} {body}"
        texts.append(body)

    return pa.Table.from_arrays(
        [
            pa.array(conv_id, pa.string()),
            pa.array(turn_idx, pa.int32()),
            pa.array(role, pa.string()),
            pa.array(texts, pa.string()),
            pa.array(tool.tolist(), pa.string()),
            pa.array(ts, pa.timestamp("us")),
        ],
        schema=SCHEMA,
    )


def write_transcripts_parquet(
    path: str, num_turns: int, seed: int = 42, shards: int = 1
) -> list[str]:
    """Write sharded transcript parquet files (one per shard, disjoint
    conversations) — the bench/test input when no external data exists."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    per = max(1, num_turns // shards)
    paths = []
    for s in range(shards):
        table = generate_transcripts(per, seed=seed, start_conv=s * 10_000_000)
        p = os.path.join(path, f"transcripts-{s:04d}.parquet")
        pq.write_table(table, p, row_group_size=65536)
        paths.append(p)
    return paths
