"""Boilerplate/markup strip → normalized "main content" per turn.

The reference's only markup handling is the LLM-response fence strip
(gemini.ts:223-231: remove ```` ```json ```` wrappers before JSON.parse)
and notebook ``_parse_json_text`` (grouped_img_desc.ipynb cell 6).  Our
transcript turns carry HTML-ish tags, markdown fences and navigation
chrome (FIXTURES.md §1), so the normalizer generalizes that step.

Byte-equality discipline: the transformation is an **ordered list of
(compiled regex, replacement)** applied sequentially.  The pure-Python
oracle runs ``re.sub`` over it; the pandas UDF runs ``Series.str.replace``
over the *same* compiled patterns (pandas delegates to the same ``re``
engine), so both paths are byte-identical by construction.
"""

from __future__ import annotations

import re

# Full-payload markdown fence unwrap — mirrors gemini.ts:227-231 (strip
# ```json ... ``` / ``` ... ``` wrappers, keep inner payload).
_FENCE_UNWRAP = re.compile(r"\A\s*```[A-Za-z0-9_-]*\n(.*?)\n?```\s*\Z", re.DOTALL)

_NAV_WORDS = (
    r"Home|About(?:\s+Us)?|Contact(?:\s+Us)?|Menu|Next|Previous|Login|Log\s+in|"
    r"Register|Sign\s+(?:in|up)|Share|Subscribe|Search|Privacy\s+Policy|"
    r"Terms\s+of\s+Service|Skip\s+to\s+content|Cookie\s+Policy|Accept\s+(?:all\s+)?Cookies|"
    r"Back\s+to\s+top|Read\s+more|Follow\s+us"
)

_ENTITIES = {
    "&nbsp;": " ", "&lt;": "<", "&gt;": ">",
    "&quot;": '"', "&#39;": "'", "&amp;": "&",
}

# Ordered pipeline: (compiled pattern, replacement string or callable —
# both forms behave identically under re.sub and pandas Series.str.replace).
# Order matters and is part of the contract.
NORMALIZE_STEPS: tuple[tuple[re.Pattern, str], ...] = (
    # 1. canonical newlines
    (re.compile(r"\r\n?"), "\n"),
    # 2. unwrap a whole-payload code fence (keep body)
    (_FENCE_UNWRAP, r"\1"),
    # 3. drop remaining fence marker lines (``` or ```lang)
    (re.compile(r"^[ \t]*```[A-Za-z0-9_-]*[ \t]*$", re.MULTILINE), ""),
    # 4. strip HTML-ish tags (incl. closing / self-closing), bounded length
    (re.compile(r"</?[A-Za-z][^<>]{0,127}>"), ""),
    # 5. decode the common entities — one combined pass.  Equivalent to six
    # sequential per-entity passes: no entity's replacement can create
    # another entity token (each replacement is a bare character, and re.sub
    # never rescans replaced text), so left-to-right single-scan and
    # per-entity sequential application produce identical bytes; e.g.
    # "&amp;lt;" → "&lt;" under both.  Covered by the normalize_text golden
    # family tests.
    (
        re.compile(r"&(?:nbsp|lt|gt|quot|#39|amp);"),
        lambda m: _ENTITIES[m.group(0)],
    ),
    # 6. drop navigation-chrome lines (menus / link bars)
    (re.compile(
        rf"^[ \t]*(?:[|•·>*_-]+[ \t]*)?(?:(?:{_NAV_WORDS})[ \t]*(?:[|•·>*_-]+[ \t]*)?)+$",
        re.MULTILINE | re.IGNORECASE), ""),
    # 7. per-line trailing whitespace
    (re.compile(r"[ \t]+$", re.MULTILINE), ""),
    # 8. collapse runs of spaces/tabs
    (re.compile(r"[ \t]{2,}"), " "),
    # 9. collapse 3+ newlines to a blank line
    (re.compile(r"\n{3,}"), "\n\n"),
    # 10. strip outer blank space
    (re.compile(r"\A\s+|\s+\Z"), ""),
)


# Per-step "can this pattern possibly match?" gates.  Each gate is a
# cheap substring/char test that is TRUE whenever the pattern has a
# match (never skips a real match), so gated and ungated application are
# byte-identical — asserted by test_extract_core's gate-equivalence test.
# Measured: 5 of the 10 steps match on ~0% of turns, and the regex scan
# per step was ~40% of normalize cost at 30k turns.
_STEP_GATES: tuple = (
    lambda t: "\r" in t,                         # 1. \r\n?
    lambda t: "```" in t,                        # 2. whole-payload fence
    lambda t: "```" in t,                        # 3. fence marker lines
    lambda t: "<" in t,                          # 4. HTML-ish tags
    lambda t: "&" in t,                          # 5. entities
    None,                                        # 6. nav lines (no cheap gate)
    lambda t: (                                  # 7. [ \t]+$ (MULTILINE)
        " \n" in t or "\t" in t or t.endswith(" ")
    ),
    lambda t: "  " in t or "\t" in t,            # 8. [ \t]{2,}
    lambda t: "\n\n\n" in t,                     # 9. \n{3,}
    None,                                        # 10. handled via str.strip()
)

# gates are positionally aligned with NORMALIZE_STEPS — adding a step
# without its gate would silently shift every later gate one off
assert len(_STEP_GATES) == len(NORMALIZE_STEPS)

# CPython's sre unicode \s uses Py_UNICODE_ISSPACE — the exact predicate
# behind str.isspace()/str.strip() — so step 10 (\A\s+|\s+\Z → '') is
# byte-identical to str.strip().
_STRIP_STEP = len(NORMALIZE_STEPS) - 1


def normalize_text(text: str | None) -> str | None:
    """Pure-Python oracle path; the pandas UDF maps the same function."""
    if text is None:
        return None
    for i, (pattern, repl) in enumerate(NORMALIZE_STEPS):
        if i == _STRIP_STEP:
            return text.strip()
        gate = _STEP_GATES[i]
        if gate is None or gate(text):
            text = pattern.sub(repl, text)
    return text.strip()
