"""Compile the COMPOSED flagship extraction to dialect-neutral SQL.

VERDICT r3 #2: every flagship stage had its own green oracle row (token
span scan, X4 confusion repair, J6 fuzzy canonical join, X2 grammar), but
their *composition* — the thing ``plans/extraction_pipeline.
extract_candidates_flat`` actually computes — was only pytest-checked.
This module chains the four stages plus the boilerplate normalizer into
ONE query that runs in BOTH Spark SQL and DuckDB:

    token span scan (consumed-boundary regex, offsets reconstructed from
      split/extract-all arrays — entry_queries token_span_scan semantics)
 -> confusion repair (functions/confusion_sql.repair_query_sql — the
      staged best_correction fan-out, first-grammar-valid-wins)
 -> blocked fuzzy canonical match (equi-join on (first segment, arity)
      + levenshtein <= 1 + trigram-Jaccard scoring, the exact
      labelcore.fuzzy.canonical_match candidate set and tie-break)
 -> deterministic confidence (labelcore.scoring closed form) and strict
      per-turn rank (confidence desc, source order, begin asc)

plus ``extracted_text`` = the 10-step boilerplate normalizer
(labelcore/boilerplate.py) re-expressed in the RE2+Java-compatible regex
subset.  ``tests/test_flagship_twin.py`` asserts the Spark-dialect twin
equals the Arrow-UDF flagship byte-for-byte on the synthetic corpus; the
DuckDB dialect is the driver oracle for ``extract_flagship_sql_twin``.

Reference semantics: gemini.ts:56-271 (extraction + confusion prompts),
sampleCodePatterns.ts:111-172 (validation), grouping.ts:201-206 (strict-
``>`` first-seen-wins ranking analog).

Float discipline: trigram similarity and confidence are IEEE-double
expressions with IDENTICAL operation trees on both sides (literals CAST
to DOUBLE on Spark, where bare decimals parse as DECIMAL), and Python's
round-half-even is mirrored by Spark ``bround`` / DuckDB ``printf('%.6f')``
(correctly rounded — see ``_round6`` for why ``round_even`` is not).

Corpus-faithfulness boundary (documented, pytest-pinned): Java/RE2 ``\\s``
is ASCII whitespace while Python's is Unicode, and the nav-chrome rule
uses ``[ \\t]+`` where Python used ``\\s+`` inside one line — byte-equal
on any ASCII-whitespace corpus (ours is), asserted by the twin test.
"""

from __future__ import annotations

from ocr_auto_label_spark.functions.confusion_sql import repair_query_sql
from ocr_auto_label_spark.labelcore.canonical import canonical_labels

# Step-1-of-the-flagship token scan (labelcore/extract.py TOKEN_RE) in the
# dialect-neutral form: RE2 (DuckDB) lacks lookarounds, so the scan regex
# consumes a boundary char into the match and captures the token as group 1
# — equivalence with TOKEN_RE (lookbehind class == consumed-prefix class;
# the trailing lookahead is redundant under greedy matching because any
# given-back tail chars are '.'/'-') is asserted offset-exact against
# Python finditer in tests/test_extract_spark.py.
SCAN_RX = "(?:^|[^A-Za-z0-9.-])([A-Za-z0-9]{3}[.-][A-Za-z0-9][A-Za-z0-9.-]*[A-Za-z0-9])"


def token_matches_sql(dialect: str, keys: list[str], src_sql: str) -> str:
    """Token span scan over the ``s`` column of ``src_sql`` (a subquery or
    relation name), carrying ``keys`` through: one output row per match
    with (keys..., tok_idx, token, begin_off).  0-based character offsets
    reconstructed from the split/extract-all arrays:
    begin_p = sum(|segs<=p|) + sum(|fulls<p|) + consumed-boundary width."""
    k = ", ".join(keys)
    if dialect == "spark":
        arrays = (
            f"SELECT {k}, split(s, '{SCAN_RX}') AS segs, "
            f"regexp_extract_all(s, '{SCAN_RX}', 0) AS fulls, "
            f"regexp_extract_all(s, '{SCAN_RX}', 1) AS toks FROM {src_sql}"
        )
        return (
            f"SELECT {k}, CAST(pos + 1 AS INT) AS tok_idx, token, "
            "CAST(aggregate(slice(segs, 1, pos + 1), 0, (a, x) -> a + length(x)) "
            "+ aggregate(slice(fulls, 1, pos), 0, (a, x) -> a + length(x)) "
            "+ length(element_at(fulls, pos + 1)) - length(token) AS BIGINT) AS begin_off "
            f"FROM ({arrays}) m LATERAL VIEW posexplode(toks) t AS pos, token"
        )
    arrays = (
        f"SELECT {k}, regexp_split_to_array(s, '{SCAN_RX}') AS segs, "
        f"regexp_extract_all(s, '{SCAN_RX}', 0) AS fulls, "
        f"regexp_extract_all(s, '{SCAN_RX}', 1) AS toks FROM {src_sql}"
    )
    return (
        f"SELECT {k}, CAST(p AS INT) AS tok_idx, toks[p] AS token, "
        "CAST(coalesce(list_sum(list_transform(segs[1:p], x -> length(x))), 0) "
        "+ coalesce(list_sum(list_transform(fulls[1:p-1], x -> length(x))), 0) "
        "+ length(fulls[p]) - length(toks[p]) AS BIGINT) AS begin_off "
        f"FROM (SELECT {k}, segs, fulls, toks, "
        f"unnest(range(1, len(toks) + 1)) AS p FROM ({arrays}) m) e"
    )


# ------------------------------------------------------- normalizer twin

# The boilerplate pipeline (labelcore/boilerplate.py NORMALIZE_STEPS) in
# RE2+Java-shared syntax.  Patterns are written once in the common subset;
# the Spark side double-escapes backslashes (Spark SQL string literals
# process escapes, DuckDB's don't).
_NAV_WORDS_SQL = (
    "Home|About(?:[ \\t]+Us)?|Contact(?:[ \\t]+Us)?|Menu|Next|Previous|Login|"
    "Log[ \\t]+in|Register|Sign[ \\t]+(?:in|up)|Share|Subscribe|Search|"
    "Privacy[ \\t]+Policy|Terms[ \\t]+of[ \\t]+Service|Skip[ \\t]+to[ \\t]+content|"
    "Cookie[ \\t]+Policy|Accept[ \\t]+(?:all[ \\t]+)?Cookies|Back[ \\t]+to[ \\t]+top|"
    "Read[ \\t]+more|Follow[ \\t]+us"
)

# The six entity decodes run as sequential literal replace() passes —
# equivalent to the Python combined single-scan pass because no entity's
# replacement can create another entity token in this order (amp LAST;
# see the NORMALIZE_STEPS step-5 argument), and replace() is identical in
# both engines.  Quote chars go through chr() to dodge literal escaping.
_ENTITY_PASSES: tuple[tuple[str, str], ...] = (
    ("&nbsp;", "' '"),
    ("&lt;", "'<'"),
    ("&gt;", "'>'"),
    ("&quot;", "chr(34)"),
    ("&#39;", "chr(39)"),
    ("&amp;", "'&'"),
)


def normalize_expr(dialect: str, col: str) -> str:
    """``labelcore.boilerplate.normalize_text`` as one nested SQL
    expression (steps 1-10, same order — the order is the contract)."""
    g = "" if dialect == "spark" else ", 'g'"

    def esc(rx: str) -> str:
        return rx.replace("\\", "\\\\") if dialect == "spark" else rx

    def rx_sub(x: str, rx: str, repl: str) -> str:
        return f"regexp_replace({x}, '{esc(rx)}', {repl}{g})"

    x = col
    # 1. canonical newlines
    x = rx_sub(x, r"\r\n?", "chr(10)")
    # 2. unwrap a whole-payload code fence (keep body).  Group ref syntax
    # differs: Java $1 vs RE2 \1.  Non-multiline ^/$ anchor the payload.
    body = "'$1'" if dialect == "spark" else r"'\1'"
    x = rx_sub(x, r"(?s)^\s*```[A-Za-z0-9_-]*\n(.*?)\n?```\s*$", body)
    # 3. drop remaining fence marker lines
    x = rx_sub(x, r"(?m)^[ \t]*```[A-Za-z0-9_-]*[ \t]*$", "''")
    # 4. strip HTML-ish tags, bounded length
    x = rx_sub(x, r"</?[A-Za-z][^<>]{0,127}>", "''")
    # 5. entity decode (sequential literal passes; see _ENTITY_PASSES)
    for find, repl in _ENTITY_PASSES:
        x = f"replace({x}, '{find}', {repl})"
    # 6. drop navigation-chrome lines
    nav = (
        r"(?im)^[ \t]*(?:[|•·>*_-]+[ \t]*)?(?:(?:" + _NAV_WORDS_SQL
        + r")[ \t]*(?:[|•·>*_-]+[ \t]*)?)+$"
    )
    x = rx_sub(x, nav, "''")
    # 7. per-line trailing whitespace
    x = rx_sub(x, r"(?m)[ \t]+$", "''")
    # 8. collapse runs of spaces/tabs
    x = rx_sub(x, r"[ \t]{2,}", "' '")
    # 9. collapse 3+ newlines to a blank line
    x = rx_sub(x, r"\n{3,}", "concat(chr(10), chr(10))")
    # 10. strip outer blank space (non-multiline anchors = whole string)
    x = rx_sub(x, r"^\s+|\s+$", "''")
    return x


# --------------------------------------------------------- fuzzy + score


def _trigram_set(dialect: str, x: str) -> str:
    """Distinct character trigrams of '##'+x+'##' (labelcore.fuzzy.trigrams)."""
    p = f"concat('##', {x}, '##')"
    if dialect == "spark":
        return (
            f"array_distinct(transform(sequence(1, length({x}) + 2), "
            f"i -> substring({p}, i, 3)))"
        )
    return (
        f"list_distinct(list_transform(range(1, length({x}) + 3), "
        f"i -> substring({p}, i, 3)))"
    )


def _round6(dialect: str, x: str) -> str:
    """Python round(x, 6), exactly.

    CPython rounds on the double's EXACT decimal expansion (correctly
    rounded; exact ties are impossible at scale 6 because (2k+1)/(2*10^6)
    has a factor 5^6 in the denominator and no dyadic rational does, so
    the half-even tiebreak never actually fires).  DuckDB's native
    ``round_even(double, n)`` is NOT correctly rounded — it goes through
    scaled float math and misrounds near-half values (e.g. the double
    0.9347825000000001, whose exact expansion is ...250000000000007,
    rounds to 0.934782 instead of 0.934783) — while ``printf('%.6f', x)``
    IS correctly rounded (property-tested against CPython on 12k values
    including constructed nearest-double-to-half-point adversaries in
    tests/test_flagship_twin.py).  The Spark dialect keeps ``bround``
    (BigDecimal half-even over Double.toString): it agrees with CPython on
    every value occurring in the pinned 2k test corpus, where the pytest
    pins would catch any divergence; only the DuckDB dialect is
    driver-compared against the Arrow/Python production output at scale."""
    if dialect == "spark":
        return f"bround({x}, 6)"
    return f"CAST(printf('%.6f', {x}) AS DOUBLE)"


def _dbl(dialect: str, lit: str) -> str:
    """A DOUBLE literal: Spark parses bare decimals as DECIMAL."""
    return f"CAST({lit} AS DOUBLE)" if dialect == "spark" else lit


def _canonical_dim_sql(dialect: str) -> str:
    """The canonical sample-ID dim with precomputed blocking keys
    (first segment, arity) — the J6 broadcast-join blocking key."""
    vals = ", ".join(
        f"('{label}', '{label.split('.')[0]}', {len(label.split('.'))})"
        for label, _ in canonical_labels()
    )
    if dialect == "spark":
        return f"FROM VALUES {vals} AS d(canon, first_seg, arity)"
    return f"FROM (VALUES {vals}) d(canon, first_seg, arity)"


def flagship_twin_sql(dialect: str, table_expr: str) -> str:
    """The full composed twin over ``table_expr`` (a relation providing
    conv_id, turn_idx, text, tool).  Output mirrors
    ``extract_candidates_flat``'s flagship projection: one row per (turn,
    candidate), null-candidate rows kept for label-free turns."""
    q = (lambda c: f"`{c}`") if dialect == "spark" else (lambda c: f'"{c}"')
    lsize = "size" if dialect == "spark" else "len"
    if dialect == "spark":
        first_seg = "element_at(split(v.label, '[.]'), 1)"
        arity = "size(split(v.label, '[.]'))"
    else:
        first_seg = "string_split(v.label, '.')[1]"
        arity = "len(string_split(v.label, '.'))"
    ta = _trigram_set(dialect, "v.label")
    tb = _trigram_set(dialect, "d.canon")
    if dialect == "spark":
        inter = f"size(array_intersect({ta}, {tb}))"
    else:
        inter = f"len(list_intersect({ta}, {tb}))"
    sim_raw = (
        f"CAST({inter} AS DOUBLE) / "
        f"({lsize}({ta}) + {lsize}({tb}) - {inter})"
    )
    scan = token_matches_sql(
        dialect, ["conv_id", "turn_idx", "source_col"], "scan_src"
    )
    repair = repair_query_sql(
        dialect,
        "FROM matches",
        carry_cols=["conv_id", "turn_idx", "source_col", "begin_off"],
        code_col="token",
    )
    conf = _round6(
        dialect,
        f"{_dbl(dialect, '0.55')} + {_dbl(dialect, '0.25')} * sim6 "
        f"+ {_dbl(dialect, '0.2')} * greatest({_dbl(dialect, '0.0')}, "
        f"{_dbl(dialect, '1.0')} - {_dbl(dialect, '0.34')} * edits)",
    )
    return f"""
WITH base AS (
  SELECT conv_id, turn_idx, {normalize_expr(dialect, 'text')} AS extracted_text,
         text, tool
  FROM {table_expr}),
scan_src AS (
  SELECT conv_id, turn_idx, 'text' AS source_col, text AS s FROM base
  UNION ALL
  SELECT conv_id, turn_idx, 'tool' AS source_col, tool AS s FROM base
  WHERE tool IS NOT NULL),
matches AS ({scan}),
repaired AS ({repair}),
valid AS (
  SELECT conv_id, turn_idx, source_col, begin_off,
         begin_off + length(code) AS end_off,
         code AS raw, repaired AS label, edits, pattern_id
  FROM repaired WHERE repaired IS NOT NULL),
dim AS (SELECT canon, first_seg, arity {_canonical_dim_sql(dialect)}),
cand AS (
  SELECT v.*, d.canon,
         CASE WHEN v.label = d.canon THEN 0 ELSE 1 END AS dist,
         {sim_raw} AS sim_raw
  FROM valid v LEFT JOIN dim d
    ON d.first_seg = {first_seg} AND d.arity = {arity}
   AND abs(length(v.label) - length(d.canon)) <= 1
   AND levenshtein(v.label, d.canon) <= 1),
best AS (
  SELECT *, row_number() OVER (
      PARTITION BY conv_id, turn_idx, source_col, begin_off
      ORDER BY dist ASC NULLS LAST, sim_raw DESC NULLS LAST,
               canon ASC NULLS LAST) AS __rn
  FROM cand),
scored AS (
  SELECT conv_id, turn_idx, source_col, begin_off, end_off, raw, label,
         edits, pattern_id,
         CASE WHEN canon IS NULL THEN {_dbl(dialect, '0.0')}
              ELSE {_round6(dialect, 'sim_raw')} END AS sim6
  FROM best WHERE __rn = 1),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY conv_id, turn_idx
      ORDER BY confidence DESC,
               CASE source_col WHEN 'text' THEN 0 ELSE 1 END ASC,
               begin_off ASC) AS INT) AS rnk
  FROM (SELECT *, {conf} AS confidence FROM scored) c
  WHERE confidence > {_dbl(dialect, '0.35')})
SELECT b.conv_id, b.turn_idx, b.extracted_text,
       r.label, r.raw,
       CAST(r.begin_off AS BIGINT) AS {q('begin')},
       CAST(r.end_off AS BIGINT) AS {q('end')},
       r.source_col, r.pattern_id,
       CAST(r.edits AS INT) AS corrections,
       r.confidence,
       r.rnk AS {q('rank')}
FROM base b LEFT JOIN ranked r
  ON b.conv_id = r.conv_id AND b.turn_idx = r.turn_idx
"""
