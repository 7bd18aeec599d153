"""Label grammar: declarative pattern config + validator.

Re-implements the reference's declarative sample-code grammar and its
validator **including its quirks**, from
``backend/src/lib/sampleCodePatterns.ts``:

- pattern table                      sampleCodePatterns.ts:35-104
- normalize = trim + upper, split '.' sampleCodePatterns.ts:114-115
- fixed ``'[A-Z]{3}'`` sentinel       sampleCodePatterns.ts:132-137
- range via JS ``parseInt``           sampleCodePatterns.ts:142-149
  (quirk: ``parseInt('10B') == 10`` → a plain ``range`` segment accepts
  trailing letters as long as the numeric *prefix* is in range)
- rangeWithLetters ``^(\\d+)([A-Z])$`` sampleCodePatterns.ts:150-165
- quirk: ``kenya_new_format`` is **unreachable** — its example uses ``-``
  separators but validation splits on ``.`` (``:115``), and its ``fixed``
  values are arrays compared with ``!==`` string equality
  (``:98,101,138``), which can never be equal.  We keep the pattern in the
  table (parity) and reproduce the unreachability.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass(frozen=True)
class Segment:
    """One grammar segment — mirrors SampleCodeSegment (sampleCodePatterns.ts:13-21)."""

    name: str
    type: str  # 'fixed' | 'range' | 'rangeWithLetters'
    value: object = None  # str for fixed; list for the unreachable kenya_new_format
    min: int | None = None
    max: int | None = None
    letters: tuple[str, ...] = ()


@dataclass(frozen=True)
class Pattern:
    id: str
    example: str
    segments: tuple[Segment, ...] = field(default_factory=tuple)


# Mirrors SAMPLE_CODE_PATTERNS at sampleCodePatterns.ts:35-104 (data, not code).
SAMPLE_CODE_PATTERNS: tuple[Pattern, ...] = (
    Pattern(
        id="generic_3_digit",
        example="AGO.1.0",
        segments=(
            Segment("Country", "fixed", value="[A-Z]{3}"),
            Segment("Segment 1", "range", min=0, max=9),
            Segment("Segment 2", "range", min=0, max=9),
        ),
    ),
    Pattern(
        id="mwi_type_1",
        example="MWI.1.2.15.7B.12.8",
        segments=(
            Segment("Country", "fixed", value="MWI"),
            Segment("Study Type", "fixed", value="1"),
            Segment("Region", "range", min=1, max=3),
            Segment("Area", "range", min=1, max=24),
            Segment("Sample", "rangeWithLetters", min=1, max=10, letters=("A", "B", "C", "D")),
            Segment("Batch", "range", min=1, max=30),
            Segment("Month", "range", min=1, max=12),
        ),
    ),
    Pattern(
        id="mwi_type_0",
        example="MWI.0.1.4.10.15.7",
        segments=(
            Segment("Country", "fixed", value="MWI"),
            Segment("Study Type", "fixed", value="0"),
            Segment("Region", "range", min=1, max=3),
            Segment("Area", "range", min=1, max=6),
            Segment("Sample", "range", min=1, max=13),
            Segment("Batch", "range", min=1, max=27),
            Segment("Month", "range", min=1, max=12),
        ),
    ),
    Pattern(
        id="ken_type_0",
        example="KEN.0.2.3.5.8.11",
        segments=(
            Segment("Country", "fixed", value="KEN"),
            Segment("Study Type", "fixed", value="0"),
            Segment("Region", "range", min=1, max=2),
            Segment("Area", "range", min=1, max=9),
            Segment("Sample", "range", min=1, max=8),
            Segment("Batch", "range", min=1, max=11),
            Segment("Month", "range", min=1, max=12),
        ),
    ),
    # Unreachable in the reference validator (see module docstring); kept for parity.
    Pattern(
        id="kenya_new_format",
        example="NBO-12345-1-C",
        segments=(
            Segment("City", "fixed", value=["NBO", "BUS"]),
            Segment("Household", "range", min=10000, max=99999),
            Segment("Sample", "range", min=1, max=9),
            Segment("Type", "fixed", value=["C", "F", "P", "G"]),
        ),
    ),
)

_THREE_UPPER = re.compile(r"^[A-Z]{3}$")
_RANGE_WITH_LETTERS = re.compile(r"^(\d+)([A-Z])$")
# JS parseInt: optional sign, leading digits; NaN if none (whitespace already
# consumed by our split on '.').
_JS_PARSEINT = re.compile(r"^[+-]?\d+")


def js_parse_int(s: str) -> int | None:
    """JS ``parseInt(s)`` (base 10): numeric prefix, None for NaN."""
    m = _JS_PARSEINT.match(s.strip())
    return int(m.group(0)) if m else None


def normalize_code(code: str) -> str:
    """trim + upper — sampleCodePatterns.ts:114."""
    return code.strip().upper()


def _segment_ok(seg: str, d: Segment) -> bool:
    if seg == "" :
        return False
    if d.type == "range":  # most common segment type — checked first
        # fast path: plain ASCII digits are exactly what JS parseInt
        # accepts wholesale (no sign/space handling needed)
        if seg.isascii() and seg.isdigit():
            num = int(seg)
        else:
            num = js_parse_int(seg)
            if num is None:
                return False
        lo = d.min if d.min is not None else float("-inf")
        hi = d.max if d.max is not None else float("inf")
        return lo <= num <= hi
    if d.type == "fixed":
        if d.value == "[A-Z]{3}":
            return bool(_THREE_UPPER.match(seg))
        # JS `segment !== definition.value`: array values never equal a string.
        if isinstance(d.value, list):
            return False
        return seg == d.value
    if d.type == "rangeWithLetters":
        m = _RANGE_WITH_LETTERS.match(seg)
        if not m:
            return False
        num = int(m.group(1))
        lo = d.min if d.min is not None else float("-inf")
        hi = d.max if d.max is not None else float("inf")
        return lo <= num <= hi and m.group(2) in d.letters
    return False


# dispatch by segment count: only same-arity patterns can match, and
# first-match table order is preserved within each arity bucket (patterns
# of other arities are unreachable for that code, so skipping them cannot
# change which pattern matches first)
_PATTERNS_BY_ARITY: dict[int, tuple[Pattern, ...]] = {}
for _p in SAMPLE_CODE_PATTERNS:
    _PATTERNS_BY_ARITY.setdefault(len(_p.segments), ())
    _PATTERNS_BY_ARITY[len(_p.segments)] += (_p,)


def match_pattern_id(code: str | None) -> str | None:
    """First pattern (table order) the normalized code satisfies, else None.

    Mirrors isValidSampleCode's loop (sampleCodePatterns.ts:111-172) but
    returns which pattern matched (the reference returns only a boolean;
    first-match order is identical).
    """
    if not code:
        return None
    segments = normalize_code(code).split(".")
    for pattern in _PATTERNS_BY_ARITY.get(len(segments), ()):
        for s, d in zip(segments, pattern.segments):
            if not _segment_ok(s, d):
                break
        else:
            return pattern.id
    return None


def is_valid_sample_code(code: str | None) -> bool:
    """Exact port of semantics of isValidSampleCode (sampleCodePatterns.ts:111-172)."""
    return match_pattern_id(code) is not None
