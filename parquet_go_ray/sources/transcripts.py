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

    # Heavy-tailed conversation lengths, clipped to [1, 500]; drawn in
    # vectorized chunks until the turn budget is covered.
    chunks = []
    total = 0
    while total < num_turns:
        draw = np.clip(rng.zipf(1.3, size=max(1024, num_turns // 4)), 1, 500)
        chunks.append(draw)
        total += int(draw.sum())
    all_lens = np.concatenate(chunks).astype(np.int64)
    cut = int(np.searchsorted(np.cumsum(all_lens), num_turns)) + 1
    conv_lens = all_lens[:cut]
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

    # Text: 1% empty; else boilerplate phrase ~50% + token soup. Built
    # fully vectorized as one utf-8 buffer + offsets (no per-row Python),
    # so multi-million-turn bench inputs generate in seconds.
    n_words = np.maximum(1, rng.lognormal(2.2, 1.0, n).astype(np.int64))
    n_words = np.minimum(n_words, 600)
    empty = rng.random(n) < 0.01
    n_words[empty] = 0
    use_phrase = (rng.random(n) < 0.5) & ~empty
    phrase_pick = rng.integers(0, len(_PHRASES), n)
    text_arr = _build_text_array(rng, vocab, n_words, use_phrase, phrase_pick)

    return pa.Table.from_arrays(
        [
            pa.array(conv_id, pa.string()),
            pa.array(turn_idx, pa.int32()),
            pa.array(role, pa.string()),
            text_arr,
            pa.array(tool.tolist(), pa.string()),
            pa.array(ts, pa.timestamp("us")),
        ],
        schema=SCHEMA,
    )


def _build_text_array(
    rng: np.random.Generator,
    vocab: np.ndarray,
    n_words: np.ndarray,
    use_phrase: np.ndarray,
    phrase_pick: np.ndarray,
) -> pa.Array:
    """Assemble all texts as one byte buffer + offsets, vectorized.

    Each row is a sequence of "units" (an optional boilerplate phrase +
    soup words) joined by single spaces; units gather their bytes from a
    concatenated vocabulary buffer with two ragged scatters.
    """
    n = len(n_words)
    units_vocab = [w.encode() for w in vocab] + [p.encode() for p in _PHRASES]
    u_lens = np.array([len(b) for b in units_vocab], dtype=np.int64)
    u_buf = np.frombuffer(b"".join(units_vocab), dtype=np.uint8)
    u_starts = np.concatenate(([0], np.cumsum(u_lens)))[:-1]

    m = n_words + use_phrase  # units per row
    row_off = np.concatenate(([0], np.cumsum(m)))
    total_units = int(row_off[-1])
    unit_ids = np.empty(total_units, dtype=np.int64)
    # Phrase unit sits at each phrased row's first slot.
    phrase_slots = row_off[:-1][use_phrase]
    unit_ids[phrase_slots] = len(vocab) + phrase_pick[use_phrase]
    word_mask = np.ones(total_units, dtype=bool)
    word_mask[phrase_slots] = False
    unit_ids[word_mask] = rng.integers(0, len(vocab), int(word_mask.sum()))

    ulen = u_lens[unit_ids]
    first = np.zeros(total_units, dtype=bool)
    first[row_off[:-1][m > 0]] = True
    sep = (~first).astype(np.int64)  # leading space for units 2..k
    char_len = ulen + sep
    unit_out = np.concatenate(([0], np.cumsum(char_len)))[:-1]
    out = np.empty(int(char_len.sum()), dtype=np.uint8)
    out[unit_out[sep.astype(bool)]] = 32  # ' '
    total_bytes = int(ulen.sum())
    intra = np.arange(total_bytes, dtype=np.int64) - np.repeat(
        np.concatenate(([0], np.cumsum(ulen)))[:-1], ulen
    )
    out[np.repeat(unit_out + sep, ulen) + intra] = u_buf[
        np.repeat(u_starts[unit_ids], ulen) + intra
    ]
    char_cum = np.concatenate(([0], np.cumsum(char_len)))
    offsets = char_cum[row_off].astype(np.int64)
    arr = pa.Array.from_buffers(
        pa.large_string(),
        n,
        [None, pa.py_buffer(offsets), pa.py_buffer(out)],
    )
    return arr.cast(pa.string())


# Per-generation slice: the vectorized text build allocates ~4x the
# output bytes in int64 scratch (repeat/arange gathers), so an unsliced
# multi-million-turn shard swaps (measured: 500k turns 7.7s, 2.5M turns
# 117s — superlinear from memory pressure, 16 shards in parallel). Slices
# of 500k keep scratch ~2 GB per task and restore linear scaling.
_SHARD_SLICE_TURNS = 500_000


def _write_shard(path: str, shard: int, per: int, seed: int) -> str:
    import os

    import pyarrow.parquet as pq

    p = os.path.join(path, f"transcripts-{shard:04d}.parquet")
    base_conv = shard * 10_000_000
    writer = None
    try:
        done = 0
        part = 0
        while done < per:
            step = min(_SHARD_SLICE_TURNS, per - done)
            # Disjoint conv-id ranges per slice (ids are formatted from
            # start_conv; a slice never produces more convs than turns).
            table = generate_transcripts(
                step, seed=seed, start_conv=base_conv + part * 1_000_000
            )
            if writer is None:
                writer = pq.ParquetWriter(p, table.schema)
            writer.write_table(table, row_group_size=65536)
            done += step
            part += 1
    finally:
        if writer is not None:
            writer.close()
    return p


def write_transcripts_parquet(
    path: str, num_turns: int, seed: int = 42, shards: int = 1
) -> list[str]:
    """Write sharded transcript parquet files (one per shard, disjoint
    conversations) — the bench/test input when no external data exists.
    Shards generate in parallel as Ray tasks when a Ray session is up
    (generation is embarrassingly parallel and deterministic per shard)."""
    import os

    import ray

    os.makedirs(path, exist_ok=True)
    per = max(1, num_turns // shards)
    if ray.is_initialized() and shards > 1:
        remote = ray.remote(num_cpus=1)(_write_shard)
        return ray.get(
            [remote.remote(path, s, per, seed) for s in range(shards)]
        )
    return [_write_shard(path, s, per, seed) for s in range(shards)]
