"""Density-based main-content extraction (DOM heuristics), dual-dialect.

The flagship normalizer (labelcore/boilerplate.py — the generalization of
the reference's fence strip, gemini.ts:223-231) rewrites a turn's payload
with an ordered regex pipeline.  This module adds the other classic
main-content strategy: a per-LINE (block) classifier in the spirit of
Boilerpipe (Kohlschütter et al., WSDM 2010) and jusText — score each
block by markup density, text length and separator density, keep the
content blocks, drop the chrome.

Everything is integer/string arithmetic so the classifier is exactly
reproducible across engines (no floats anywhere):

1. ``tagless`` = line with ``<...>`` tags removed; ``&nbsp;`` decoded.
2. ``n`` = length of the trimmed tagless text.
3. keep a line iff
   - ``n >= 25`` (enough running text), and
   - ``2 * tag_chars <= raw_len`` (not mostly markup), and
   - NOT (``pipe_cnt >= 2`` and ``n < 16 * (pipe_cnt + 1)``) — the
     "A | B | C" navigation-menu shape: several pipe-separated segments
     whose average length is menu-short.
4. main content = kept lines' cleaned text re-joined with newlines.

The same generator emits Spark SQL and DuckDB SQL (lambda higher-order
functions exist in both: ``transform``/``filter``/``array_join`` vs
``list_transform``/``list_filter``/``array_to_string``), so the DuckDB
side is a genuine independent replay for the driver's value-hash gate.
"""

from __future__ import annotations


def _tagless(l: str, dialect: str) -> str:
    g = ", 'g'" if dialect == "duck" else ""
    return f"regexp_replace({l}, '<[^>]*>', ''{g})"


def line_freq_sql(dialect: str, source: str, min_convs: int = 5) -> str:
    """Corpus-level boilerplate removal by line frequency (the CCNet /
    RefinedWeb rule: a line recurring across many *documents* is chrome,
    not content — Wenzek et al. 2020 §4.1, Penedo et al. 2023 §G).

    Complements the per-line density classifier (:func:`main_content_sql`,
    which looks at each line in isolation): here the evidence is
    corpus-global — an exact line occurring in ``>= min_convs`` DISTINCT
    conversations is dropped everywhere, whitespace-only lines are always
    dropped, and every turn's surviving lines are re-joined in original
    order.  All integer/string arithmetic; the same generator emits both
    dialects so the DuckDB side is a genuine independent replay.

    Scale shape: one line-key aggregate (count-distinct conv_id, two-phase
    partial agg), one equi-join back on the line, one per-turn regroup —
    O(corpus lines) shuffle, no all-pairs work.  Frequency skew on hot
    boilerplate lines is bounded by the partial aggregation; the join-back
    side is AQE skew-splittable.
    """
    if dialect == "spark":
        lines = (
            "SELECT conv_id, turn_idx, pos, line "
            f"FROM (SELECT conv_id, turn_idx, text FROM {source}) s0 "
            "LATERAL VIEW posexplode(split(text, chr(10))) t AS pos, line"
        )
        rebuild = (
            "array_join(transform(filter(array_sort(collect_list("
            "named_struct('pos', pos, 'keep', keep, 'line', line))), "
            "x -> x.keep = 1), x -> x.line), chr(10))"
        )
    elif dialect == "duck":
        lines = (
            "SELECT conv_id, turn_idx, u.pos AS pos, u.line AS line "
            "FROM (SELECT conv_id, turn_idx, "
            "unnest(list_transform(range(1, len(ls) + 1), "
            "i -> struct_pack(pos := i, line := ls[i]))) AS u "
            f"FROM (SELECT conv_id, turn_idx, string_split(text, chr(10)) AS ls "
            f"FROM {source}) s0) s1"
        )
        rebuild = (
            "coalesce(string_agg(CASE WHEN keep = 1 THEN line END, "
            "chr(10) ORDER BY pos), '')"
        )
    else:  # pragma: no cover
        raise ValueError(f"unknown dialect {dialect!r}")

    return f"""
SELECT conv_id, turn_idx, main_text, n_lines, n_kept,
       CAST(length(main_text) AS BIGINT) AS kept_chars
FROM (
  SELECT conv_id, turn_idx,
         {rebuild} AS main_text,
         CAST(count(*) AS BIGINT) AS n_lines,
         CAST(sum(keep) AS BIGINT) AS n_kept
  FROM (
    SELECT l.conv_id, l.turn_idx, l.pos, l.line,
           CASE WHEN trim(l.line) <> '' AND f.line IS NULL THEN 1 ELSE 0 END AS keep
    FROM ({lines}) l
    LEFT JOIN (
      SELECT line FROM ({lines}) fl WHERE trim(line) <> ''
      GROUP BY line HAVING count(DISTINCT conv_id) >= {min_convs}
    ) f ON l.line = f.line
  ) flags
  GROUP BY conv_id, turn_idx
) g
"""


def main_content_sql(dialect: str, source: str) -> str:
    """SELECT extracting per-turn main content from ``source`` (a table
    ref or parquet reader expression with conv_id, turn_idx, text)."""
    if dialect == "spark":
        xform, filt, join, size, struct = (
            "transform", "filter", "array_join", "size", "named_struct",
        )
        mk = lambda t, r, c: f"named_struct('t', {t}, 'raw_len', {r}, 'tag_chars', {c})"
        split = "split(text, chr(10))"
    elif dialect == "duck":
        xform, filt, join, size = (
            "list_transform", "list_filter", "array_to_string", "len",
        )
        mk = lambda t, r, c: f"struct_pack(t := {t}, raw_len := {r}, tag_chars := {c})"
        split = "string_split(text, chr(10))"
    else:  # pragma: no cover
        raise ValueError(f"unknown dialect {dialect!r}")

    tagless = _tagless("l", dialect)
    clean = f"trim(replace({tagless}, '&nbsp;', ' '))"
    tag_chars = f"length(l) - length({tagless})"
    feats = f"{xform}({split}, l -> {mk(clean, 'length(l)', tag_chars)})"
    pred = (
        "length(f.t) >= 25 AND 2 * f.tag_chars <= f.raw_len "
        "AND NOT (length(f.t) - length(replace(f.t, '|', '')) >= 2 "
        "AND length(f.t) < 16 * (length(f.t) - length(replace(f.t, '|', '')) + 1))"
    )
    return f"""
SELECT conv_id, turn_idx,
       {join}({xform}(kept, f -> f.t), chr(10)) AS main_text,
       CAST({size}(feats) AS BIGINT) AS n_lines,
       CAST({size}(kept) AS BIGINT) AS n_kept,
       CAST(length({join}({xform}(kept, f -> f.t), chr(10))) AS BIGINT) AS kept_chars
FROM (
  SELECT conv_id, turn_idx, feats, {filt}(feats, f -> {pred}) AS kept
  FROM (SELECT conv_id, turn_idx, {feats} AS feats FROM {source}) s1
) s2
"""
