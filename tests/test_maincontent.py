"""Main-content extraction — the Spark SQL, the DuckDB oracle dialect,
and a from-scratch Python twin must agree per turn for BOTH strategies
(the per-line density classifier and the cross-document line-frequency
rule), and each must actually separate chrome from content on the
synthetic transcripts (FIXTURES.md §1 nav menus / tag wrappers /
``<p>&nbsp;</p>`` filler)."""

from __future__ import annotations

import re
from collections import defaultdict

import duckdb

from ocr_auto_label_spark.datagen import transcripts_parquet
from ocr_auto_label_spark.functions.maincontent_sql import (
    line_freq_sql,
    main_content_sql,
)

N_TURNS = 2_000


def _py_main_content(text: str):
    kept, lines = [], text.split("\n")
    for l in lines:
        tagless = re.sub(r"<[^>]*>", "", l)
        t = tagless.replace("&nbsp;", " ").strip(" ")  # SQL trim = spaces only
        n, tag_chars, pipes = len(t), len(l) - len(tagless), t.count("|")
        if n >= 25 and 2 * tag_chars <= len(l) and not (
            pipes >= 2 and n < 16 * (pipes + 1)
        ):
            kept.append(t)
    joined = "\n".join(kept)
    return joined, len(lines), len(kept), len(joined)


def test_spark_matches_python_twin(spark):
    path = transcripts_parquet(N_TURNS)
    raw = {(r.conv_id, r.turn_idx): r.text
           for r in spark.read.parquet(path).collect()}
    got = {(r.conv_id, r.turn_idx): (r.main_text, r.n_lines, r.n_kept, r.kept_chars)
           for r in spark.sql(main_content_sql("spark", f"parquet.`{path}`")).collect()}
    assert set(got) == set(raw)
    for k, text in raw.items():
        assert got[k] == _py_main_content(text), k


def test_duck_dialect_matches_spark(spark):
    path = transcripts_parquet(N_TURNS)
    srows = sorted(
        tuple(r) for r in
        spark.sql(main_content_sql("spark", f"parquet.`{path}`")).collect()
    )
    drows = sorted(
        duckdb.connect()
        .execute(main_content_sql("duck", f"read_parquet('{path}/*.parquet')"))
        .fetchall()
    )
    assert srows == drows


def _py_line_freq(raw: dict, min_convs: int = 5):
    """From-scratch twin of the CCNet/RefinedWeb line-frequency rule:
    drop whitespace-only lines and any exact line occurring in
    ``>= min_convs`` distinct conversations; re-join survivors in order."""
    convs_per_line = defaultdict(set)
    for (conv_id, _), text in raw.items():
        for l in text.split("\n"):
            if l.strip(" "):
                convs_per_line[l].add(conv_id)
    chrome = {l for l, cs in convs_per_line.items() if len(cs) >= min_convs}
    out = {}
    for k, text in raw.items():
        lines = text.split("\n")
        kept = [l for l in lines if l.strip(" ") and l not in chrome]
        joined = "\n".join(kept)
        out[k] = (joined, len(lines), len(kept), len(joined))
    return out


def test_line_freq_matches_python_twin(spark):
    path = transcripts_parquet(N_TURNS)
    raw = {(r.conv_id, r.turn_idx): r.text
           for r in spark.read.parquet(path).collect()}
    got = {(r.conv_id, r.turn_idx): (r.main_text, r.n_lines, r.n_kept, r.kept_chars)
           for r in spark.sql(line_freq_sql("spark", f"parquet.`{path}`")).collect()}
    assert got == _py_line_freq(raw)


def test_line_freq_duck_dialect_matches_spark(spark):
    path = transcripts_parquet(N_TURNS)
    srows = sorted(
        tuple(r) for r in
        spark.sql(line_freq_sql("spark", f"parquet.`{path}`")).collect()
    )
    drows = sorted(
        duckdb.connect()
        .execute(line_freq_sql("duck", f"read_parquet('{path}/*.parquet')"))
        .fetchall()
    )
    assert srows == drows


def test_line_freq_drops_recurring_boilerplate_keeps_rare(spark):
    path = transcripts_parquet(N_TURNS)
    rows = spark.sql(line_freq_sql("spark", f"parquet.`{path}`")).collect()
    dropped = sum(r.n_lines - r.n_kept for r in rows)
    kept = sum(r.n_kept for r in rows)
    assert dropped > 0 and kept > 0
    for r in rows:  # every corpus-recurring nav line is gone
        assert "Menu | Login | Register" not in r.main_text
        assert "<p>&nbsp;</p>" not in r.main_text


def test_classifier_separates_chrome_from_content(spark):
    path = transcripts_parquet(N_TURNS)
    df = spark.sql(main_content_sql("spark", f"parquet.`{path}`"))
    rows = df.collect()
    dropped = sum(r.n_lines - r.n_kept for r in rows)
    kept = sum(r.n_kept for r in rows)
    assert dropped > 0 and kept > 0  # both classes occur on the fixture
    for r in rows:  # no chrome survives into the extracted content
        assert "&nbsp;" not in r.main_text
        assert "<div" not in r.main_text and "<p>" not in r.main_text
        assert "Menu | Login" not in r.main_text
