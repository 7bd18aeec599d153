"""Canonical sample-ID list, generated from the grammar.

The reference's grammar defines a finite valid-code universe and
``isValidSampleCode`` is a membership test (sampleCodePatterns.ts:111-172).
The driver rule forbids external data, so the canonical dimension table is
*derived* from the grammar: enumerate each reachable pattern's universe in
lexicographic segment order and take a deterministic strided sample.  This
is the small dim table used for the broadcast fuzzy-match join (SURVEY.md
J5/J6) and for embedding golden labels in synthetic fixtures.

Everything here is seedless-deterministic (pure arithmetic, no RNG, no
wall clock) so every run of every process produces the identical list.
"""

from __future__ import annotations

from functools import lru_cache
from itertools import product

from ocr_auto_label_spark.labelcore.grammar import SAMPLE_CODE_PATTERNS, Pattern

# Fixed country codes used to instantiate the '[A-Z]{3}' wildcard of
# generic_3_digit (the wildcard universe is 26^3; we pin a stable panel).
_GENERIC_COUNTRIES = ("AGO", "KEN", "MWI", "MOZ", "TZA", "UGA", "ZMB", "ZWE")

# Per-pattern deterministic sample size (canonical table stays broadcast-small).
_SAMPLE_SIZES = {
    "generic_3_digit": 320,
    "mwi_type_1": 800,
    "mwi_type_0": 480,
    "ken_type_0": 400,
}


def _segment_values(pattern: Pattern) -> list[list[str]]:
    values: list[list[str]] = []
    for seg in pattern.segments:
        if seg.type == "fixed":
            if seg.value == "[A-Z]{3}":
                values.append(list(_GENERIC_COUNTRIES))
            else:
                values.append([str(seg.value)])
        elif seg.type == "range":
            values.append([str(n) for n in range(seg.min, seg.max + 1)])
        elif seg.type == "rangeWithLetters":
            values.append([f"{n}{c}" for n in range(seg.min, seg.max + 1) for c in seg.letters])
    return values


def _enumerate_strided(pattern: Pattern, k: int) -> list[str]:
    """k evenly-strided members of the pattern's lexicographic enumeration."""
    values = _segment_values(pattern)
    total = 1
    for v in values:
        total *= len(v)
    k = min(k, total)
    picks = []
    for i in range(k):
        idx = (i * total) // k  # evenly spaced, deterministic
        segs = []
        rem = idx
        for v in reversed(values):
            rem, pos = divmod(rem, len(v))
            segs.append(v[pos])
        picks.append(".".join(reversed(segs)))
    return picks


@lru_cache(maxsize=1)
def canonical_labels() -> tuple[tuple[str, str], ...]:
    """The canonical dim table: ((label, pattern_id), ...), stable order.

    ``kenya_new_format`` is intentionally absent — it is unreachable in the
    reference validator (SURVEY.md X2), so no member of it can ever be a
    valid label.
    """
    rows: list[tuple[str, str]] = []
    for pattern in SAMPLE_CODE_PATTERNS:
        k = _SAMPLE_SIZES.get(pattern.id)
        if not k:
            continue
        for label in _enumerate_strided(pattern, k):
            rows.append((label, pattern.id))
    return tuple(rows)


@lru_cache(maxsize=1)
def canonical_label_set() -> frozenset[str]:
    return frozenset(label for label, _ in canonical_labels())


@lru_cache(maxsize=1)
def canonical_blocks() -> dict[tuple[str, int], tuple[str, ...]]:
    """Blocking index for the fuzzy match: (country-prefix, segment count) →
    canonical labels.  Mirrors the broadcast-join blocking key of SURVEY.md J6."""
    blocks: dict[tuple[str, int], list[str]] = {}
    for label, _ in canonical_labels():
        segs = label.split(".")
        blocks.setdefault((segs[0], len(segs)), []).append(label)
    return {k: tuple(v) for k, v in blocks.items()}
