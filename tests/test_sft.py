"""SFT example rendering (operators/sft.py) vs a from-scratch Python
twin: byte-equal rendered sequences, exact mask-span offsets, and the
span/text consistency invariants."""

from __future__ import annotations

import pytest

from ocr_auto_label_spark.datagen import transcripts_parquet
from ocr_auto_label_spark.operators.sft import render_sft_examples


def _py_render(rows, mask_roles=("assistant",)):
    by_conv = {}
    for conv, ti, ts, role, text in rows:
        rend = f"<|{role}|>\n{text or ''}\n"
        by_conv.setdefault(conv, []).append((ti, ts, rend, role, text or ""))
    out = {}
    for conv, turns in by_conv.items():
        turns.sort(key=lambda t: (t[0], t[1], t[2]))
        text, spans, mask_chars = "", [], 0
        for ti, ts, rend, role, payload in turns:
            if role in mask_roles:
                b = len(text) + len(f"<|{role}|>\n")
                spans.append((b, b + len(payload)))
                mask_chars += len(payload)
            text += rend
        out[conv] = (text, spans, len(turns), mask_chars)
    return out


def test_sft_rendering_matches_python_twin(spark):
    df = spark.read.parquet(transcripts_parquet(2_000))
    rows = [
        (r.conv_id, r.turn_idx, r.ts, r.role, r.text)
        for r in df.collect()
    ]
    want = _py_render(rows)
    got = {
        r.conv: (
            r.text,
            [(s.begin, s.end) for s in r.mask_spans],
            r.n_turns,
            r.n_mask_chars,
        )
        for r in render_sft_examples(df).collect()
    }
    assert set(got) == set(want)
    for conv, (text, spans, n_turns, mask_chars) in want.items():
        gt, gs, gn, gm = got[conv]
        assert gt == text, conv          # byte-equal rendered sequence
        assert gs == spans, conv         # exact span offsets, in order
        assert (gn, gm) == (n_turns, mask_chars), conv
    # every span is a pure assistant payload: preceded by its header,
    # followed by the turn separator
    for conv, (text, spans, _, _) in want.items():
        for b, e in spans:
            assert text[:b].endswith("|>\n")
            assert e == len(text) - 1 or text[e] == "\n"


def test_sft_edges(spark):
    # NULL text renders as an empty payload with an EMPTY (b, b) span;
    # duplicate (turn_idx, ts) stays total via the rendered tie-break
    data = [
        ("c1", 0, "u", None, "2024-01-01 00:00:00"),
        ("c1", 1, "assistant", None, "2024-01-01 00:00:01"),
        ("c1", 2, "assistant", "ok", "2024-01-01 00:00:02"),
        ("c2", 0, "assistant", "a", "2024-01-01 00:00:00"),
        ("c2", 0, "assistant", "b", "2024-01-01 00:00:00"),
    ]
    df = spark.createDataFrame(
        data, "conv_id string, turn_idx int, role string, text string, s string"
    ).selectExpr("conv_id", "turn_idx", "role", "text",
                 "CAST(s AS TIMESTAMP) AS ts")
    got = {r.conv: r for r in render_sft_examples(df).collect()}
    c1 = got["c1"]
    assert c1.text == "<|u|>\n\n<|assistant|>\n\n<|assistant|>\nok\n"
    assert [(s.begin, s.end) for s in c1.mask_spans] == [(21, 21), (36, 38)]
    c2 = got["c2"]  # tie broken by rendered string: 'a' before 'b'
    assert c2.text == "<|assistant|>\na\n<|assistant|>\nb\n"
    assert [(s.begin, s.end) for s in c2.mask_spans] == [(14, 15), (30, 31)]
    with pytest.raises(ValueError):
        render_sft_examples(df, mask_roles=())
