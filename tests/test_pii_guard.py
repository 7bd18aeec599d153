"""Guard for the PII-scrub invariant (ADVICE r3): per-type counts are
taken on the RAW string while redactions apply sequentially (email →
phone → IP), which is only sound when the three rule regexes never
overlap on the corpus.  Assert it directly: the summed raw-string counts
must equal the number of typed placeholders actually present after
scrubbing — any overlap (one rule consuming another's match) breaks the
equality."""

from __future__ import annotations

import os

import duckdb

from ocr_auto_label_spark.entry_queries import _pii_scrub_sql

SF_DIR = os.environ.get("ENTRY_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_pii_rules_non_overlapping_on_corpus():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    rows = con.sql(
        "SELECT n_email + n_phone + n_ip AS n_raw, "
        "len(regexp_extract_all(scrubbed, '<(EMAIL|PHONE|IP)>', 0)) AS n_placeholders "
        f"FROM ({_pii_scrub_sql('duck')}) q"
    ).fetchall()
    assert rows, "PII fixture produced no rows"
    bad = [(n, m) for n, m in rows if n != m]
    assert not bad, f"overlapping PII rules on corpus: {bad[:5]}"
