"""Density-based main-content extraction — the Spark SQL, the DuckDB
oracle dialect, and a from-scratch Python twin must agree per turn, and
the classifier must actually separate chrome from content on the
synthetic transcripts (FIXTURES.md §1 nav menus / tag wrappers /
``<p>&nbsp;</p>`` filler)."""

from __future__ import annotations

import re

import duckdb

from ocr_auto_label_spark.datagen import transcripts_parquet
from ocr_auto_label_spark.functions.maincontent_sql import main_content_sql

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
