"""Group-inference matching primitives — exact ports from
``backend/src/services/groupInference.ts``:

- COMMON_WORDS stopword set                 (:4-11)
- COLOR_FAMILIES hue/sat/light ranges       (:26-100)
- hexToHSL with JS Math.round semantics     (:105-137)
- getColorFamily incl. hue wrap-around      (:142-166)
- extractMeaningfulWords                    (:171-179)
- meaningful-vs-neutral color matching      (:184-256)
- ≥2-matching-words description rule        (:261-272)
"""

from __future__ import annotations

import math
import re
from functools import lru_cache

COMMON_WORDS = frozenset((
    "the a an and or but in on at to for of with by "
    "from up about into through during before after above below "
    "off down out over under again further then once "
    "here there when where why how all any both each few "
    "more most other some such no nor not only own same "
    "so than too very s t can will just don should now"
).split())

# (name, [(h_lo, h_hi, s_lo, s_hi, l_lo, l_hi), ...]) — groupInference.ts:26-100
COLOR_FAMILIES: tuple[tuple[str, tuple[tuple[int, int, int, int, int, int], ...]], ...] = (
    ("red", ((0, 30, 30, 100, 20, 80), (330, 360, 30, 100, 20, 80))),
    ("orange", ((15, 45, 40, 100, 30, 80),)),
    ("yellow", ((45, 75, 30, 100, 40, 90),)),
    ("green", ((75, 165, 25, 100, 20, 80),)),
    ("blue", ((180, 260, 30, 100, 20, 80),)),
    ("purple", ((260, 330, 30, 100, 20, 80),)),
    ("brown", ((15, 45, 20, 80, 15, 50),)),
    ("beige", ((30, 60, 10, 40, 60, 90),)),
    ("tan", ((25, 45, 15, 50, 50, 75),)),
    ("gray", ((0, 360, 0, 20, 20, 80),)),
    ("black", ((0, 360, 0, 100, 0, 25),)),
    ("white", ((0, 360, 0, 20, 80, 100),)),
)

_IGNORED_FAMILIES = frozenset({"beige", "tan"})
_NEUTRAL_FAMILIES = frozenset({"white", "black", "gray", "grey"})
_HEX_RE = re.compile(r"^[0-9a-fA-F]{6}")
_PUNCT = re.compile(r"[^A-Za-z0-9_\s]")  # JS \w = [A-Za-z0-9_]
_WS = re.compile(r"\s+")


def _js_round(x: float) -> int:
    """JS Math.round: half-up for positive values (Python round is half-even)."""
    return int(math.floor(x + 0.5))


def hex_to_hsl(hex_color: str) -> tuple[int, int, int] | None:
    """groupInference.ts:105-137; None for unparseable hex (JS NaN path →
    no family)."""
    clean = hex_color.replace("#", "")
    if not _HEX_RE.match(clean):
        return None
    r = int(clean[0:2], 16) / 255
    g = int(clean[2:4], 16) / 255
    b = int(clean[4:6], 16) / 255
    mx, mn = max(r, g, b), min(r, g, b)
    l = (mx + mn) / 2
    if mx == mn:
        h = s = 0.0
    else:
        d = mx - mn
        s = d / (2 - mx - mn) if l > 0.5 else d / (mx + mn)
        if mx == r:  # switch-case order: r, g, b (first match wins)
            h = (g - b) / d + (6 if g < b else 0)
        elif mx == g:
            h = (b - r) / d + 2
        else:
            h = (r - g) / d + 4
        h /= 6
    return _js_round(h * 360), _js_round(s * 100), _js_round(l * 100)


def get_color_family(hex_color: str) -> str | None:
    hsl = hex_to_hsl(hex_color)
    if hsl is None:
        return None
    h, s, l = hsl
    for name, ranges in COLOR_FAMILIES:
        for h0, h1, s0, s1, l0, l1 in ranges:
            h_in = (h0 <= h1 and h0 <= h <= h1) or (h0 > h1 and (h >= h0 or h <= h1))
            if h_in and s0 <= s <= s1 and l0 <= l <= l1:
                return name
    return None


def extract_meaningful_words(text: str | None) -> list[str]:
    """groupInference.ts:171-179."""
    if not text:
        return []
    cleaned = _PUNCT.sub("", text.lower())
    return [w for w in _WS.split(cleaned) if len(w) > 2 and w not in COMMON_WORDS]


def _families(colors: list[str], neutral: bool) -> list[str]:
    out = []
    for c in colors[:3]:  # top 3 colors only (:204, :215)
        fam = get_color_family(c)
        if fam is None or fam in _IGNORED_FAMILIES:
            continue
        if (fam in _NEUTRAL_FAMILIES) == neutral:
            out.append(fam)
    return out


def has_matching_colors(colors1: list[str] | None, colors2: list[str] | None) -> bool:
    """Meaningful-first, neutral-fallback, never cross-tier (ts:222-256).
    Inputs are hex strings (the reference's {color, name} structs carry hex
    in .color)."""
    if not colors1 or not colors2:
        return False
    m1, m2 = _families(colors1, neutral=False), _families(colors2, neutral=False)
    if m1 and m2:
        return any(f in m2 for f in m1)
    if not m1 and not m2:
        n1, n2 = _families(colors1, neutral=True), _families(colors2, neutral=True)
        return any(f in n2 for f in n1)
    return False


def has_matching_description(desc1: str | None, desc2: str | None) -> bool:
    """≥2 shared meaningful words, duplicates counted (ts:261-272)."""
    if not desc1 or not desc2:
        return False
    w1, w2 = extract_meaningful_words(desc1), extract_meaningful_words(desc2)
    return sum(1 for w in w1 if w in w2) >= 2


# ---- cached pair predicates (identical results; descs/colors repeat
# heavily across a snapshot's overlapping ±9-row windows, so the per-pair
# work collapses to lru hits — equivalence asserted in test_inference) ----

@lru_cache(maxsize=1 << 15)
def _meaningful_cached(text: str) -> tuple[tuple[str, ...], frozenset[str]]:
    words = tuple(extract_meaningful_words(text))
    return words, frozenset(words)


@lru_cache(maxsize=1 << 16)
def _desc_match_cached(desc1: str | None, desc2: str | None) -> bool:
    if not desc1 or not desc2:
        return False
    w1, _ = _meaningful_cached(desc1)
    _, set2 = _meaningful_cached(desc2)
    # membership in the set is semantically identical to the reference's
    # words2.includes(w); each w1 occurrence still counts once
    return sum(1 for w in w1 if w in set2) >= 2


@lru_cache(maxsize=1 << 16)
def _colors_match_cached(colors1: tuple[str, ...] | None,
                         colors2: tuple[str, ...] | None) -> bool:
    return has_matching_colors(
        list(colors1) if colors1 is not None else None,
        list(colors2) if colors2 is not None else None,
    )


def infer_group(
    target_desc: str | None,
    target_colors: list[str] | None,
    neighbors: list[dict],
) -> str | None:
    """One unlabeled item vs its ±9-row neighborhood (snapshot semantics):
    keep labeled neighbors matching BOTH description and colors, pick the
    most recent by timestamp (ts:383-410).  ``neighbors`` dicts carry
    group/desc/colors/ts_ms."""
    tcol = tuple(target_colors) if target_colors is not None else None
    matches = [
        n for n in neighbors
        if n.get("group")
        and str(n["group"]).strip() != ""
        and _desc_match_cached(target_desc, n.get("desc"))
        and _colors_match_cached(
            tcol, tuple(n["colors"]) if n.get("colors") is not None else None
        )
    ]
    if not matches:
        return None
    best = max(matches, key=lambda n: n["ts_ms"])  # most recent first (:406-408)
    return best["group"]
