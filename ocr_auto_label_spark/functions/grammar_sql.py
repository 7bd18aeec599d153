"""Compile the label grammar to dialect-neutral SQL.

Generates a single SQL expression implementing exactly
``labelcore.grammar.match_pattern_id`` (incl. the JS ``parseInt`` prefix
quirk and the unreachable ``kenya_new_format``) that runs unmodified in
BOTH Spark SQL and DuckDB — which makes grammar validation an
oracle-checkable query, not just a Python-only code path.

Dialect-neutral subset used: ``upper/trim``, ``regexp_extract(str, rx,
group)`` (returns '' on no-match in both engines), ``try_cast``, ``CASE``.
Regexes avoid backslashes entirely (``[.]``, ``[0-9]``) because DuckDB
string literals don't process escapes while Spark's do.
"""

from __future__ import annotations

from ocr_auto_label_spark.labelcore.grammar import SAMPLE_CODE_PATTERNS, Pattern, Segment


def _structure_regex(n_segments: int) -> str:
    return "^" + "[.]".join(["([^.]+)"] * n_segments) + "$"


def _segment_check(seg_expr: str, d: Segment) -> str | None:
    """Boolean SQL for one segment; None means 'never valid' (list-valued
    fixed segments — the unreachable kenya_new_format quirk)."""
    if d.type == "fixed":
        if d.value == "[A-Z]{3}":
            return f"regexp_extract({seg_expr}, '^[A-Z][A-Z][A-Z]$', 0) <> ''"
        if isinstance(d.value, list):
            return None  # JS `segment !== definition.value` on an array: never equal
        return f"{seg_expr} = '{d.value}'"
    if d.type == "range":
        # JS parseInt: leading-space-tolerant numeric prefix; NaN → invalid
        prefix = f"regexp_extract({seg_expr}, '^ *([+-]?[0-9]+)', 1)"
        return (
            f"({prefix} <> '' AND try_cast({prefix} AS BIGINT) BETWEEN {d.min} AND {d.max})"
        )
    if d.type == "rangeWithLetters":
        num = f"regexp_extract({seg_expr}, '^([0-9]+)([A-Z])$', 1)"
        letter = f"regexp_extract({seg_expr}, '^([0-9]+)([A-Z])$', 2)"
        letters = ", ".join(f"'{c}'" for c in d.letters)
        return (
            f"({num} <> '' AND try_cast({num} AS BIGINT) BETWEEN {d.min} AND {d.max}"
            f" AND {letter} IN ({letters}))"
        )
    raise ValueError(d.type)


def pattern_predicate_sql(norm_expr: str, pattern: Pattern) -> str:
    """Boolean SQL: does ``norm_expr`` (already trim+upper) match pattern?"""
    rx = _structure_regex(len(pattern.segments))
    checks = [f"regexp_extract({norm_expr}, '{rx}', 0) <> ''"]
    for i, d in enumerate(pattern.segments, start=1):
        seg = f"regexp_extract({norm_expr}, '{rx}', {i})"
        c = _segment_check(seg, d)
        if c is None:
            return "FALSE"  # pattern unreachable, as in the reference
        checks.append(c)
    return "(" + " AND ".join(checks) + ")"


def pattern_id_sql(code_expr: str) -> str:
    """CASE expression → matching pattern id (first match in table order,
    like isValidSampleCode's loop) or NULL."""
    norm = f"upper(trim({code_expr}))"
    whens = []
    for p in SAMPLE_CODE_PATTERNS:
        pred = pattern_predicate_sql(norm, p)
        if pred == "FALSE":
            continue
        whens.append(f"WHEN {pred} THEN '{p.id}'")
    return "CASE " + " ".join(whens) + " ELSE NULL END"


def is_valid_sql(code_expr: str) -> str:
    return f"({pattern_id_sql(code_expr)}) IS NOT NULL"


def pattern_id_column(code_col):
    """Spark Column variant of ``pattern_id_sql`` built on a split-array —
    one split + per-segment element checks instead of O(segments²) grouped
    regexp_extracts.  Much cheaper to compile/execute; identical results
    (the DuckDB oracle keeps the regex form, so the parity check crosses
    two independent formulations)."""
    from pyspark.sql import functions as F

    norm = F.upper(F.trim(code_col))
    segs = F.split(norm, "[.]", -1)
    result = F.lit(None).cast("string")
    for p in reversed(SAMPLE_CODE_PATTERNS):
        checks = [F.size(segs) == len(p.segments)]
        unreachable = False
        for i, d in enumerate(p.segments):
            # try_element_at: NULL (→ failed check) beyond the array, rather
            # than an ANSI-mode error; the size check alone doesn't short-
            # circuit inside codegen
            seg = F.try_element_at(segs, F.lit(i + 1))
            if d.type == "fixed":
                if d.value == "[A-Z]{3}":
                    checks.append(seg.rlike("^[A-Z]{3}$"))
                elif isinstance(d.value, list):
                    unreachable = True
                    break
                else:
                    checks.append(seg == d.value)
            elif d.type == "range":
                prefix = F.regexp_extract(seg, "^ *([+-]?[0-9]+)", 1)
                num = prefix.try_cast("bigint")
                checks.append((prefix != "") & num.between(d.min, d.max))
            elif d.type == "rangeWithLetters":
                num_s = F.regexp_extract(seg, "^([0-9]+)([A-Z])$", 1)
                letter = F.regexp_extract(seg, "^([0-9]+)([A-Z])$", 2)
                checks.append(
                    (num_s != "")
                    & num_s.try_cast("bigint").between(d.min, d.max)
                    & letter.isin(list(d.letters))
                )
        if unreachable:
            continue
        cond = checks[0]
        for c in checks[1:]:
            cond = cond & c
        # reversed iteration + when-chaining keeps first-match-in-table-order
        result = F.when(cond, F.lit(p.id)).otherwise(result)
    return result
