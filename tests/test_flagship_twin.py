"""The composed flagship SQL twin (functions/flagship_sql.py) must equal
the Arrow-UDF flagship byte-for-byte, and its DuckDB dialect must equal
the Spark dialect — together with the driver oracle this certifies the
composed extraction semantics (token scan → confusion repair → fuzzy
canonical match → confidence rank + normalizer) across THREE independent
implementations (pure Python via the pandas UDF, Spark SQL, DuckDB SQL)."""

from __future__ import annotations

import duckdb

import ocr_auto_label_spark.entry_queries as eq
from ocr_auto_label_spark.datagen import transcripts_parquet
from ocr_auto_label_spark.functions.flagship_sql import (
    flagship_twin_sql,
    normalize_expr,
)
from ocr_auto_label_spark.labelcore.boilerplate import normalize_text

TWIN_COLS = [
    "conv_id", "turn_idx", "extracted_text", "label", "raw", "begin",
    "end", "source_col", "pattern_id", "corrections", "confidence", "rank",
]


def _rows(df):
    return sorted(tuple(r) for r in df.select(TWIN_COLS).collect())


def _spark_sql_twin(spark):
    """The Spark-SQL dialect of the twin over the pinned 2k corpus (the
    registry entry's Spark side runs the ARROW pipeline instead — the
    SQL dialect is pinned here)."""
    from ocr_auto_label_spark.operators.util import ensure_parallelism

    df = ensure_parallelism(spark.read.parquet(transcripts_parquet(2_000)))
    df.createOrReplaceTempView("__twin_sql_transcripts")
    return spark.sql(flagship_twin_sql("spark", "__twin_sql_transcripts"))


def test_twin_equals_arrow_flagship(spark):
    """Spark-SQL twin == the Arrow-UDF pipeline, exactly — including
    extracted_text (the 10-step normalizer twin), 0-based raw-string
    offsets, the round-half-even confidence doubles, and the strict
    per-turn rank.  (The registry entry compares Arrow vs the DuckDB
    dialect in the driver; this pins the Spark-SQL dialect to both.)"""
    flag = _rows(eq._flagship_twin_spark(spark, "/root/testdata/sf0.001"))
    twin = _rows(_spark_sql_twin(spark))
    assert len(flag) == len(twin) > 2000
    mism = [(a, b) for a, b in zip(flag, twin) if a != b]
    assert not mism, f"first mismatches: {mism[:3]}"


def test_twin_duck_equals_twin_spark(spark):
    """Dialect parity on raw (un-normalized) values — stricter than the
    driver compare, which rounds floats to 6 digits."""
    path = transcripts_parquet(2_000)
    duck = sorted(
        tuple(r)
        for r in duckdb.sql(
            flagship_twin_sql("duck", f"read_parquet('{path}/*.parquet')")
        ).fetchall()
    )
    twin = _rows(_spark_sql_twin(spark))
    assert len(duck) == len(twin)
    mism = [(a, b) for a, b in zip(twin, duck) if a != b]
    assert not mism, f"first mismatches: {mism[:3]}"


def test_normalizer_twin_matches_python_on_adversarial_payloads(spark):
    """The SQL normalizer twin vs labelcore.normalize_text on hand-picked
    boundary payloads (fences, tags, entities, nav chrome, whitespace
    runs) — the corpus-faithfulness boundary is ASCII whitespace, which
    these all respect (as does the generated corpus)."""
    payloads = [
        "```json\n{\"a\": 1}\n```",
        "```python\nx = 1\n\n\n\ny = 2\n```",
        "  <div class=\"note\">ID &amp;lt; kept</div>  ",
        "Home | About | Contact\nreal content line\nMenu | Login | Register",
        "line with trailing   \n\ttabs\t\tand   runs",
        "a\r\nb\rc",
        "&nbsp;&lt;&gt;&quot;&#39;&amp;",
        "| Share | Subscribe |\n\n\n\n\nbody",
        "```\nunclosed fence line\nmore",
        "plain text, no markup",
        "<p>&nbsp;</p>",
    ]
    df = spark.createDataFrame([(p,) for p in payloads], "text: string")
    df.createOrReplaceTempView("__norm_probe")
    got = {
        r.text: r.norm
        for r in spark.sql(
            f"SELECT text, {normalize_expr('spark', 'text')} AS norm "
            "FROM __norm_probe"
        ).collect()
    }
    duck_got = {
        t: n
        for t, n in duckdb.sql(
            "SELECT text, "
            + normalize_expr("duck", "text")
            + " AS norm FROM (SELECT unnest($1) AS text)",
            params=[payloads],
        ).fetchall()
    }
    for p in payloads:
        want = normalize_text(p)
        assert got[p] == want, f"spark normalizer diverges on {p!r}: {got[p]!r} != {want!r}"
        assert duck_got[p] == want, f"duck normalizer diverges on {p!r}: {duck_got[p]!r} != {want!r}"


def test_duck_round6_is_correctly_rounded_like_python():
    """_round6's DuckDB dialect (printf-based) must equal CPython round(x, 6)
    on every double, including nearest-double-to-half-point adversaries —
    DuckDB's native round_even misrounds those (it cost extract_flagship its
    oracle conversion at 20k turns: 0.9347825000000001 → 0.934782), and
    exact decimal ties are impossible at scale 6, so "correctly rounded"
    fully determines the answer."""
    import random

    from ocr_auto_label_spark.functions.flagship_sql import _round6

    vals = [0.9347825000000001, 0.75 + 0.25 * round(17 / 23, 6)]
    rng = random.Random(7)
    vals += [rng.random() * 1.2 for _ in range(2000)]
    for _ in range(2000):
        k = rng.randrange(0, 1_200_000)
        half = (k + 0.5) / 1e6
        vals += [half, half + 5e-17, half - 5e-17]
    # small-denominator trigram-similarity quotients (the values the twin
    # actually feeds through _round6)
    for _ in range(2000):
        u = rng.randrange(1, 90)
        i = rng.randrange(0, u + 1)
        vals.append(0.55 + 0.25 * round(i / u, 6) + 0.2)
    expr = _round6("duck", "x")
    got = duckdb.sql(
        f"SELECT x, {expr} FROM (SELECT unnest($1) AS x)", params=[vals]
    ).fetchall()
    bad = [(x, g) for x, g in got if g != round(x, 6)]
    assert not bad, f"{len(bad)} misrounded, first: {bad[:5]}"
