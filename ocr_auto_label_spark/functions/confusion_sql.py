"""Compile confusion-correction (X4) to dialect-neutral SQL.

Generates a query implementing exactly ``labelcore.confusion.best_correction``
for BOTH Spark SQL and DuckDB — which makes the one load-bearing extraction
stage that had no driver-side correctness row (VERDICT r2 #1) an
oracle-checkable query.  Reference semantics: gemini.ts:94-98 (D/0, B/8),
:107-114 (missed period: '11A' is '1.1A'), :166 (I/1).

Faithfulness argument (why this equals ``correction_candidates`` +
first-valid-wins without replicating its ``seen`` set or MAX_VARIANTS cap):

- Stage order is preserved: the candidate stream is the ordered
  concatenation  subs1 ++ periods ++ (subs∘subs1) ++ (subs∘periods),
  identical to the Python generator's stages 1-4 (position-major within a
  stage, alternative-table order within a position, via flatten∘transform).
- The ``seen`` dedup only ever REMOVES later duplicates of earlier
  candidates; the first *valid* element of the stream is therefore the
  same with or without dedup.
- Python gates stages 3/4 on "no stage-1/2 candidate was valid"; in the
  concatenated stream a stage-3/4 winner is only reachable when stages 1/2
  produced no valid candidate — same result.
- MAX_VARIANTS caps how many VALID candidates are collected (64); the
  winner is the first valid candidate, found before any cap can bite.
- MAX_TOKEN_LEN/empty guards apply to candidate *generation* only —
  ``best_correction`` still validates an over-long code as-is (the
  JS-parseInt quirk admits arbitrarily long valid codes), mirrored by the
  self-valid branch sitting outside the length guard.

``tests/test_confusion_fuzzy.py`` asserts the Spark-dialect query equals
the pure-Python ``best_correction`` on the fixture, byte for byte.
"""

from __future__ import annotations

from ocr_auto_label_spark.labelcore.confusion import (
    CONFUSION_GROUPS,
    MAX_TOKEN_LEN,
)
from ocr_auto_label_spark.functions.grammar_sql import pattern_id_sql

# X4 driver fixture: every repair shape the reference prompt describes —
# confusion swaps (incl. two-edit), missed periods, the JS-parseInt
# trailing-junk quirk, the unreachable kenya arity, unrepairable and
# degenerate tokens.  Shared by the registry entry and the pytest gate.
X4_FIXTURE_CODES: tuple[str, ...] = (
    "MW1.1.2.15.7B.12.8",      # 1 sub: 1→I in country
    "MWI.O.1.4.1O.15.7",       # 1 sub; '1O' then VALID via parseInt prefix
    "mwi.0.1.4.10.15.7",       # valid after normalize (0 edits)
    "ago.10",                  # missed period: → AGO.1.0
    "AGO.1O",                  # 2 edits: period insertion + O→0
    "ZZZ.99.Q",                # unrepairable (out-of-range, no confusions)
    "not a code",              # arity 1 → no candidates
    "KEN.O.2.3.5.8.11",        # 1 sub: O→0
    "MWI.1.2.15.7E.12.8",      # 'E' has no confusion alternative → null
    "NBO-12345-1-C",           # kenya_new_format stays unreachable
    " mwi.1.3.7.10b.12.8 ",    # whitespace + case normalize, 0 edits
    "8US.54321.9.G",           # repair cannot reach an unreachable pattern
    "MWI.0.I.4.10.15.7",       # 1 sub: I→1 in a range segment
    "MWI.D.1.4.10.15.7",       # 1 sub: D→0, alternative-order sensitive
    "MWI.1.I.15.7B.12.8",      # 1 sub mid-code
    "MWI.1.2.15.7B.12.1I",     # VALID as-is via parseInt('1I') == 1
    "MW1.1.2.15.78.12.8",      # 2 subs: 1→I and 8→B, nested-order sensitive
    "   ",                     # blank → null
    "AGO..0",                  # empty segment fails structure regex
    "A" * 40 + ".1.0",         # > MAX_TOKEN_LEN: no fan-out, not valid
    "MWI.1.2.151.7B.12.8",     # repair '151'→'15I', valid via parseInt
    "11A",                     # gemini.ts:107 example alone: arity reject
)


# ------------------------------------------------------------ dialect bits


def _d(dialect: str) -> dict[str, str]:
    if dialect == "spark":
        return {
            "transform": "transform",
            "filter": "filter",
            "concat_arr": "concat",
            "first": "try_element_at({a}, 1)",
            "seq": "sequence({a}, {b})",
        }
    return {
        "transform": "list_transform",
        "filter": "list_filter",
        "concat_arr": "list_concat",
        "first": "({a})[1]",
        "seq": "range({a}, ({b}) + 1)",
    }


def _arr(dialect: str, items: list[str]) -> str:
    quoted = ", ".join(f"'{x}'" for x in items)
    return f"array({quoted})" if dialect == "spark" else f"[{quoted}]"


def _alts_case(dialect: str, ch_expr: str) -> str:
    """Ordered confusion alternatives of one char, ''-padded to width 2
    (the pad keeps CASE branch types aligned; callers filter '' out).
    Order = group order in CONFUSION_GROUPS, chars in group order — the
    exact generation order of labelcore.confusion._ALTERNATIVES."""
    alts: dict[str, list[str]] = {}
    for group in CONFUSION_GROUPS:
        for c in group:
            alts[c] = [o for o in group if o != c]
    width = max(len(v) for v in alts.values())
    whens = " ".join(
        f"WHEN '{c}' THEN {_arr(dialect, v + [''] * (width - len(v)))}"
        for c, v in alts.items()
    )
    empty = _arr(dialect, [""] * width)
    return f"CASE {ch_expr} {whens} ELSE {empty} END"


def _subs_sql(dialect: str, x: str) -> str:
    """All single confusion substitutions of ``x``, position-major then
    alternative order (labelcore.confusion._single_substitutions)."""
    d = _d(dialect)
    positions = "{filter}({seq}, i -> i <= length({x}))".format(
        filter=d["filter"],
        seq=d["seq"].format(a="1", b=f"greatest(length({x}), 1)"),
        x=x,
    )
    alts = _alts_case(dialect, f"substring({x}, i, 1)")
    one_pos = (
        "{transform}({filter}({alts}, a -> a <> ''), "
        "a -> concat(substring({x}, 1, i - 1), a, substring({x}, i + 1)))"
    ).format(transform=d["transform"], filter=d["filter"], alts=alts, x=x)
    return f"flatten({d['transform']}({positions}, i -> {one_pos}))"


def _periods_sql(dialect: str, x: str) -> str:
    """All single missed-period repairs of ``x``: insert '.' between two
    adjacent non-period chars — exactly the interior segment cut points of
    labelcore.confusion._period_insertions, in the same left-to-right
    order (segment-major cut order == global position order)."""
    d = _d(dialect)
    positions = (
        "{filter}({seq}, i -> i < length({x}) "
        "AND substring({x}, i, 1) <> '.' AND substring({x}, i + 1, 1) <> '.')"
    ).format(
        filter=d["filter"],
        seq=d["seq"].format(a="1", b=f"greatest(length({x}) - 1, 1)"),
        x=x,
    )
    ins = f"concat(substring({x}, 1, i), '.', substring({x}, i + 1))"
    return f"{d['transform']}({positions}, i -> {ins})"


def _first_valid(dialect: str, arr: str) -> str:
    d = _d(dialect)
    pred = f"({pattern_id_sql('v')}) IS NOT NULL"
    return d["first"].format(a=f"{d['filter']}({arr}, v -> {pred})")


def repair_query_sql(
    dialect: str,
    from_clause: str,
    carry_cols: list[str] | None = None,
    code_col: str = "code",
) -> str:
    """The best_correction fan-out as a query over ANY source relation.

    ``from_clause`` must provide ``code_col`` (plus ``carry_cols``, passed
    through untouched).  Emits (carry..., code, repaired, edits,
    pattern_id); NULLs when unrepairable within 2 edits.

    Stage gating (faithful AND cheap): each stage's candidate array is
    NULL when an earlier stage already produced a winner — exactly the
    Python generator's "stages 3/4 only if no stage-1/2 candidate was
    valid" gate, extended to stage 1/2 (skipping generation when the code
    is self-valid changes nothing: the winner is ``coalesce``'d first).
    NULL arrays propagate to NULL ``first_valid`` results, so downstream
    logic needs no empty-array literals; paired arrays (subs1/periods,
    subs2/periodsubs) share one gate so ``concat`` never mixes NULL with
    non-NULL.  On a corpus where ~75% of label tokens are uncorrupted
    this skips the whole fan-out for the common case."""
    d = _d(dialect)
    carry = "".join(f"{c}, " for c in (carry_cols or []))
    subs1 = _subs_sql(dialect, "c")
    periods = _periods_sql(dialect, "c")
    subs_of_v = _subs_sql(dialect, "v")
    cat = d["concat_arr"]
    gen_guard = f"self_valid IS NULL AND length(c) BETWEEN 1 AND {MAX_TOKEN_LEN}"
    return f"""
WITH r_t0 AS (SELECT {carry}{code_col} AS code, upper(trim({code_col})) AS c {from_clause}),
r_t1 AS (
  SELECT {carry}code, c,
         CASE WHEN ({pattern_id_sql('c')}) IS NOT NULL THEN c END AS self_valid
  FROM r_t0),
r_t2 AS (
  SELECT {carry}code, c, self_valid,
         CASE WHEN {gen_guard} THEN {subs1} END AS subs1,
         CASE WHEN {gen_guard} THEN {periods} END AS periods
  FROM r_t1),
r_t3 AS (
  SELECT {carry}code, c, self_valid, subs1, periods,
         {_first_valid(dialect, f"{cat}(subs1, periods)")} AS r1
  FROM r_t2),
r_t4 AS (
  SELECT {carry}code, c, self_valid, r1,
         CASE WHEN r1 IS NULL THEN
           flatten({d['transform']}(subs1, v -> {subs_of_v})) END AS subs2,
         CASE WHEN r1 IS NULL THEN
           flatten({d['transform']}(periods, v -> {subs_of_v})) END AS periodsubs
  FROM r_t3),
r_t5 AS (
  SELECT {carry}code, c, self_valid, r1,
         {_first_valid(dialect, f"{cat}(subs2, periodsubs)")} AS r2
  FROM r_t4)
SELECT {carry}code,
       coalesce(self_valid, r1, r2) AS repaired,
       CASE WHEN self_valid IS NOT NULL THEN 0
            WHEN r1 IS NOT NULL THEN 1
            WHEN r2 IS NOT NULL THEN 2 END AS edits,
       {pattern_id_sql('coalesce(self_valid, r1, r2)')} AS pattern_id
FROM r_t5
"""


def repair_select_sql(dialect: str, codes: list[str]) -> str:
    """Full X4 query over a VALUES fixture: (code, repaired, edits,
    pattern_id) per input code; NULLs when unrepairable within 2 edits."""
    vals = ", ".join("('{}')".format(c.replace("'", "''")) for c in codes)
    from_values = (
        f"FROM VALUES {vals} AS t(code)"
        if dialect == "spark"
        else f"FROM (VALUES {vals}) t(code)"
    )
    return repair_query_sql(dialect, from_values)
