"""Character-confusion correction (deterministic, bounded fan-out).

The reference encodes confusion repair as OCR-prompt instructions
(gemini.ts:94-98 "D's are often mistaken for 0s... B's for 8's",
gemini.ts:166 "'I' is actually '1'", gemini.ts:107-113 missed-period:
'11A' should be read as '1.1A').  We re-express them as a deterministic
candidate generator: given a raw token that fails grammar validation,
emit bounded correction variants, each with its edit count; the caller
re-validates (grammar.py) and scores (scoring.py).

Generation order is deterministic (position-major, table order) so that
"first-seen wins" tie-breaks are reproducible (SURVEY.md W3).
"""

from __future__ import annotations

from ocr_auto_label_spark.labelcore.grammar import (
    _PATTERNS_BY_ARITY,
    match_pattern_id,
)

# Bidirectional confusion groups: each char may be misread as the others.
# gemini.ts:94-98 (D/0, B/8), :166 (I/1); O/0 from the same prompt family.
CONFUSION_GROUPS: tuple[str, ...] = ("0DO", "8B", "1I")

_ALTERNATIVES: dict[str, str] = {}
for _group in CONFUSION_GROUPS:
    for _c in _group:
        _ALTERNATIVES[_c] = "".join(o for o in _group if o != _c)

MAX_TOKEN_LEN = 32          # tokens longer than this are never labels
MAX_VARIANTS = 64           # hard fan-out cap per token
MAX_SUBSTITUTIONS = 2       # at most 2 confusion substitutions


def _single_substitutions(code: str) -> list[str]:
    out = []
    for i, ch in enumerate(code):
        for alt in _ALTERNATIVES.get(ch, ""):
            out.append(code[:i] + alt + code[i + 1:])
    return out


def _period_insertions(code: str) -> list[str]:
    """Single missed-period repairs: insert '.' inside any multi-char segment
    (gemini.ts:89 'COMMON ERROR: "11A" should be read as "1.1A"')."""
    out = []
    segs = code.split(".")
    for si, seg in enumerate(segs):
        for cut in range(1, len(seg)):
            repaired = segs[:si] + [seg[:cut], seg[cut:]] + segs[si + 1:]
            out.append(".".join(repaired))
    return out


def correction_candidates(code: str) -> list[tuple[str, int, str]]:
    """All grammar-valid corrections of ``code``, deterministic order.

    Returns ``[(corrected, n_edits, pattern_id), ...]`` — deduped, cheapest
    edits first, generation order preserved within an edit count.  ``code``
    must already be normalized (trim+upper).  Stages:

      1. single confusion substitution                  (1 edit)
      2. single period insertion                        (1 edit)
      3. substitution + substitution                    (2 edits)
      4. period insertion + single substitution         (2 edits)
    """
    if not code or len(code) > MAX_TOKEN_LEN:
        return []
    # arity fast-reject (exact): substitutions preserve the segment count
    # and every period insertion adds exactly one, so all variants have
    # arity n or n+1 — if no grammar pattern has either arity, every
    # variant would fail validation anyway; skip the fan-out entirely
    n = code.count(".") + 1
    if n not in _PATTERNS_BY_ARITY and (n + 1) not in _PATTERNS_BY_ARITY:
        return []

    out: list[tuple[str, int, str]] = []
    seen: set[str] = {code}

    def _try(variant: str, edits: int) -> None:
        if variant in seen or len(out) >= MAX_VARIANTS:
            return
        seen.add(variant)
        pid = match_pattern_id(variant)
        if pid is not None:
            out.append((variant, edits, pid))

    subs1 = _single_substitutions(code)
    for v in subs1:
        _try(v, 1)
    for v in _period_insertions(code):
        _try(v, 1)
    if not out:
        for v1 in subs1:
            for v2 in _single_substitutions(v1):
                _try(v2, 2)
                if len(out) >= MAX_VARIANTS:
                    break
            if len(out) >= MAX_VARIANTS:
                break
    if not out:
        for p in _period_insertions(code):
            for v in _single_substitutions(p):
                _try(v, 2)
                if len(out) >= MAX_VARIANTS:
                    break
            if len(out) >= MAX_VARIANTS:
                break
    return out


def best_correction(code: str) -> tuple[str, int, str] | None:
    """First valid correction (cheapest edit count, generation order)."""
    pid = match_pattern_id(code)
    if pid is not None:
        return (code, 0, pid)
    cands = correction_candidates(code)
    return cands[0] if cands else None
