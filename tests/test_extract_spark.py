"""Dual-run oracle: Spark pipeline output must byte-equal the pure-Python
labelcore on the same fixture, under stable turn ordering (W2).

This is the north_rule correctness gate: per-turn text equality + span
equality between the Arrow/Spark path and the reference implementation.
"""

from __future__ import annotations

import pandas as pd
import pytest

from ocr_auto_label_spark.datagen import generate_transcripts
from ocr_auto_label_spark.labelcore.extract import extract_turn
from ocr_auto_label_spark.plans.extraction_pipeline import (
    extract_candidates_flat,
    extract_turns,
    salted_repartition,
)

N_TURNS = 1000


def _python_golden(pdf: pd.DataFrame) -> pd.DataFrame:
    """Pure-Python reference run → flat (turn, candidate) golden frame."""
    rows = []
    for r in pdf.itertuples(index=False):
        text = None if pd.isna(r.text) else r.text
        tool = None if pd.isna(r.tool) else r.tool
        extracted, cands = extract_turn(text, tool)
        if not cands:
            rows.append((r.conv_id, r.turn_idx, extracted, None, None, None,
                         None, None, None, None, None, None, None))
        for c in cands:
            rows.append((r.conv_id, r.turn_idx, extracted, c.label, c.raw,
                         c.begin, c.end, c.source_col, c.pattern_id,
                         c.corrections, c.canonical, c.confidence, c.rank))
    out = pd.DataFrame(rows, columns=[
        "conv_id", "turn_idx", "extracted_text", "label", "raw", "begin",
        "end", "source_col", "pattern_id", "corrections", "canonical",
        "confidence", "rank",
    ])
    return out.sort_values(["conv_id", "turn_idx", "rank"], na_position="last").reset_index(drop=True)


@pytest.fixture(scope="module")
def fixture_pdf():
    return generate_transcripts(N_TURNS, seed=42)


def _spark_flat(spark, pdf, repartitioned=False):
    from ocr_auto_label_spark.schemas import TRANSCRIPT_SCHEMA

    sdf = spark.createDataFrame(pdf.astype(object).where(pd.notna(pdf), None), TRANSCRIPT_SCHEMA)
    if repartitioned:
        sdf = salted_repartition(sdf, 16)
    flat = extract_candidates_flat(sdf)
    got = (
        flat.select("conv_id", "turn_idx", "extracted_text", "label", "raw",
                    "begin", "end", "source_col", "pattern_id", "corrections",
                    "canonical", "confidence", "rank")
        .toPandas()
        .sort_values(["conv_id", "turn_idx", "rank"], na_position="last")
        .reset_index(drop=True)
    )
    return got


def _assert_frames_equal(got: pd.DataFrame, want: pd.DataFrame):
    assert len(got) == len(want)
    for col in want.columns:
        g = got[col].astype(object).where(pd.notna(got[col]), None)
        w = want[col].astype(object).where(pd.notna(want[col]), None)
        mism = [(i, a, b) for i, (a, b) in enumerate(zip(g, w)) if a != b]
        assert not mism, f"column {col}: first mismatches {mism[:5]}"


def test_spark_byte_equals_python_oracle(spark, fixture_pdf):
    want = _python_golden(fixture_pdf)
    got = _spark_flat(spark, fixture_pdf)
    _assert_frames_equal(got, want)


def test_salted_repartition_same_result(spark, fixture_pdf):
    """Result is invariant to the physical partitioning (determinism under
    parallelism — the two-cluster-size equivalence in miniature)."""
    want = _python_golden(fixture_pdf)
    got = _spark_flat(spark, fixture_pdf, repartitioned=True)
    _assert_frames_equal(got, want)


def test_plan_has_no_per_row_python_udf(spark, fixture_pdf):
    """north_star: zero per-row Python UDFs — ArrowEvalPython only."""
    from ocr_auto_label_spark.schemas import TRANSCRIPT_SCHEMA

    sdf = spark.createDataFrame(fixture_pdf.head(5).astype(object), TRANSCRIPT_SCHEMA)
    plan = extract_candidates_flat(sdf)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" in plan


def test_extract_turns_shape(spark, fixture_pdf):
    from ocr_auto_label_spark.schemas import TRANSCRIPT_SCHEMA

    sdf = spark.createDataFrame(fixture_pdf.head(50).astype(object), TRANSCRIPT_SCHEMA)
    out = extract_turns(sdf)
    assert out.count() == 50  # one row per turn, narrow projection
    assert {"extracted_text", "candidates"} <= set(out.columns)


def test_token_scan_sql_offset_exact_vs_token_re(spark):
    """The token_span_scan entry's consumed-boundary regex rewrite equals
    labelcore TOKEN_RE (lookbehind form) with byte-exact offsets on the
    entry's own generated corpus — the equivalence claim behind using it
    as the oracle-checkable form of flagship step 1."""
    from ocr_auto_label_spark.entry_queries import _token_scan_sql, load_views
    from ocr_auto_label_spark.labelcore.extract import TOKEN_RE
    from ocr_auto_label_spark.labelcore.grammar import match_pattern_id

    sf_dir = "/root/testdata/sf0.001"
    load_views(spark, sf_dir)
    # reuse the entry's own source-string synthesis (the WITH src clause)
    sql = _token_scan_sql("spark")
    src_sql = sql.split("), x AS (")[0].replace("WITH src AS (", "")
    raw = {r.doc_id: r.s for r in spark.sql(src_sql).collect()}
    got = {}
    for r in spark.sql(sql).collect():
        got.setdefault(r.doc_id, []).append(
            (r.tok_idx, r.token, r.begin_off, r.end_off, r.pattern_id, r.is_valid)
        )
    assert len(raw) > 0
    n_tokens = 0
    for doc_id, s in raw.items():
        want = [
            (i + 1, m.group(0), m.start(), m.end(),
             match_pattern_id(m.group(0)),
             int(match_pattern_id(m.group(0)) is not None))
            for i, m in enumerate(TOKEN_RE.finditer(s))
        ]
        assert sorted(got.get(doc_id, [])) == sorted(want), doc_id
        n_tokens += len(want)
    assert n_tokens > len(raw)  # scan actually found tokens


def test_token_scan_dialect_parity_fuzz(spark):
    """Randomized Java-vs-RE2-vs-Python parity for the scan machinery:
    200 deterministic random strings over the token alphabet (plus
    boundary chars), one SQL pass per engine shape, offsets byte-exact
    against TOKEN_RE.finditer.  Guards the consumed-boundary rewrite
    against engine divergence beyond the curated corpus."""
    import random

    import duckdb

    from ocr_auto_label_spark.entry_queries import _SCAN_RX
    from ocr_auto_label_spark.labelcore.extract import TOKEN_RE

    rng = random.Random(99)
    alphabet = "AB1.- xyZ0I,8O\tD#"
    strings = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 40)))
        for _ in range(200)
    ]
    want = {
        i: [(m.group(0), m.start(), m.end()) for m in TOKEN_RE.finditer(s)]
        for i, s in enumerate(strings)
    }

    sdf = spark.createDataFrame(list(enumerate(strings)), "i: int, s: string")
    sdf.createOrReplaceTempView("__fuzz_scan")
    spark_rows = spark.sql(f"""
        WITH m AS (SELECT i, split(s, '{_SCAN_RX}') AS segs,
                          regexp_extract_all(s, '{_SCAN_RX}', 0) AS fulls,
                          regexp_extract_all(s, '{_SCAN_RX}', 1) AS toks
                   FROM __fuzz_scan)
        SELECT i, token,
          CAST(aggregate(slice(segs, 1, pos + 1), 0, (a, x) -> a + length(x))
             + aggregate(slice(fulls, 1, pos), 0, (a, x) -> a + length(x))
             + length(element_at(fulls, pos + 1)) - length(token) AS BIGINT) AS b
        FROM m LATERAL VIEW posexplode(toks) t AS pos, token
    """).collect()
    got_spark: dict[int, list] = {i: [] for i in range(len(strings))}
    for r in spark_rows:
        got_spark[r.i].append((r.token, r.b, r.b + len(r.token)))
    assert got_spark == want

    con = duckdb.connect()
    got_duck: dict[int, list] = {i: [] for i in range(len(strings))}
    for i, s in enumerate(strings):
        rows = con.execute(
            """
            WITH m AS (SELECT regexp_split_to_array(?, ?) AS segs,
                              regexp_extract_all(?, ?, 0) AS fulls,
                              regexp_extract_all(?, ?, 1) AS toks),
            e AS (SELECT segs, fulls, toks, unnest(range(1, len(toks)+1)) AS p FROM m)
            SELECT toks[p],
              CAST(coalesce(list_sum(list_transform(segs[1:p], x -> length(x))), 0)
                 + coalesce(list_sum(list_transform(fulls[1:p-1], x -> length(x))), 0)
                 + length(fulls[p]) - length(toks[p]) AS BIGINT)
            FROM e""",
            [s, _SCAN_RX] * 3,
        ).fetchall()
        got_duck[i] = [(t, b, b + len(t)) for t, b in rows]
    assert got_duck == want

    n_found = sum(len(v) for v in want.values())
    assert n_found >= 10  # the alphabet actually produces tokens
