"""Extraction core unit tests: golden case families from FIXTURES.md §3."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from ocr_auto_label_spark.labelcore.boilerplate import normalize_text
from ocr_auto_label_spark.labelcore.canonical import canonical_labels
from ocr_auto_label_spark.labelcore.extract import extract_candidates, extract_turn


def test_clean_label_with_span():
    text = "The sample MWI.1.2.15.7B.12.8 was collected."
    cands = extract_candidates(text, None)
    assert len(cands) == 1
    c = cands[0]
    assert c.label == "MWI.1.2.15.7B.12.8"
    assert text[c.begin:c.end] == c.raw == "MWI.1.2.15.7B.12.8"
    assert c.corrections == 0 and c.rank == 1 and c.source_col == "text"


def test_lowercase_trailing_period():
    text = "logged ago.1.0."
    cands = extract_candidates(text, None)
    assert len(cands) == 1
    assert cands[0].label == "AGO.1.0"
    assert cands[0].raw == "ago.1.0"  # raw span excludes the sentence period


def test_confused_label_is_corrected_span_points_at_raw():
    text = "ID MWI.1.1.18.10.7.11 confirmed"
    cands = extract_candidates(text, None)
    assert len(cands) == 1
    c = cands[0]
    assert c.label == "MWI.1.1.18.1D.7.11"
    assert c.raw == "MWI.1.1.18.10.7.11"
    assert text[c.begin:c.end] == c.raw
    assert c.corrections == 1


def test_boilerplate_wrapped_spans_into_raw_string():
    text = '<div class="note">Sample <b>KEN.0.2.3.5.8.11</b> ok</div>'
    cands = extract_candidates(text, None)
    assert len(cands) == 1
    assert text[cands[0].begin:cands[0].end] == "KEN.0.2.3.5.8.11"


def test_tool_json_payload():
    tool = '```json\n{"status": "ok", "sample_id": "MWI.0.1.4.10.15.7"}\n```'
    cands = extract_candidates(None, tool)
    assert len(cands) == 1
    assert cands[0].source_col == "tool"
    assert tool[cands[0].begin:cands[0].end] == "MWI.0.1.4.10.15.7"


def test_multi_candidate_ranking_first_seen_wins():
    # two equal-confidence labels → text-order tiebreak (first-seen wins, W3)
    a, b = canonical_labels()[500][0], canonical_labels()[600][0]
    text = f"first {a} then {b}"
    cands = extract_candidates(text, None)
    assert [c.rank for c in cands] == [1, 2]
    assert cands[0].label == a and cands[1].label == b


def test_text_candidates_rank_before_equal_tool_candidates():
    label = canonical_labels()[700][0]
    cands = extract_candidates(f"x {label}", f'{{"id": "{label}"}}')
    assert [c.source_col for c in cands] == ["text", "tool"]


def test_no_label_turn():
    assert extract_candidates("nothing to see here", None) == []
    assert extract_candidates(None, None) == []


def test_noise_rejected():
    assert extract_candidates("noise MWI.9.9.99.99.99.99 and 192.168.0.1 here", None) == []


def test_nbo_format_rejected_like_reference():
    # kenya_new_format is unreachable in the reference validator (X2 quirk)
    assert extract_candidates("code NBO-12345-1-C here", None) == []


def test_normalize_text_families():
    # fence unwrap (gemini.ts:227-231 semantics)
    assert normalize_text('```json\n{"a": 1}\n```') == '{"a": 1}'
    # tags stripped, entities decoded
    assert normalize_text("<p>a &amp; b</p>") == "a & b"
    # nav chrome dropped
    out = normalize_text("Home | About | Contact\nreal content")
    assert out == "real content"
    # whitespace discipline
    assert normalize_text("a\t\tb\n\n\n\nc  ") == "a b\n\nc"
    assert normalize_text(None) is None


def test_extract_turn_contract():
    text = "Home | About\nSample <b>MWI.1.2.15.7B.12.8</b> ok"
    extracted, cands = extract_turn(text, None)
    assert extracted == "Sample MWI.1.2.15.7B.12.8 ok"
    assert len(cands) == 1
    assert text[cands[0].begin:cands[0].end] == cands[0].raw


@settings(max_examples=40)
@given(
    st.sampled_from([label for label, _ in canonical_labels()]),
    st.sampled_from(["plain {l}", "<b>{l}</b>", "```\n{l}\n```", "x {l}.", "| Home |\n{l}"]),
)
def test_property_wrapping_invariant(label, template):
    """Extraction of the label itself is invariant to boilerplate wrapping."""
    cands = extract_candidates(template.format(l=label), None)
    assert [c.label for c in cands] == [label]
    assert cands[0].confidence == 1.0


def test_normalize_gates_byte_identical_to_ungated():
    """The match-impossible gates in normalize_text must never change the
    output vs plain sequential application of NORMALIZE_STEPS."""
    from ocr_auto_label_spark.datagen.transcripts import generate_transcripts
    from ocr_auto_label_spark.labelcore.boilerplate import (
        NORMALIZE_STEPS,
        normalize_text,
    )

    def ungated(text: str) -> str:
        for pattern, repl in NORMALIZE_STEPS:
            text = pattern.sub(repl, text)
        return text

    adversarial = [
        "", " ", "\t", "\r\nx\r", "```\nbody\n```", "a```b",
        "x <b>tag</b> &amp;lt; &nbsp;", "line \nline\t\n", "a  b\tc",
        "\n\n\n\nx\n\n\n", "  lead and trail  ", "\x1c\x1dmid\x85",
        " nbsp-space thin", "Home | About | Contact",
        "| Home |\ntext\n• Search •", "only\ttabs\t", " \t mixed \t ",
        "&amp;amp;", "```json\n{\"k\": 1}\n```", "< not a tag",
        "x ", "x\t", "\vx\f",
    ]
    pdf = generate_transcripts(4000, 11)
    corpus = [t for t in pdf["text"].tolist() if isinstance(t, str)]
    for t in adversarial + corpus:
        assert normalize_text(t) == ungated(t), repr(t)
