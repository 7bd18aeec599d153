"""Token-window document chunking (operators/packing.py
chunk_documents) — boundaries, coverage, text reconstruction and edge
cases vs a from-scratch Python reference; plan narrowness (zero
Exchange: chunking must stay embarrassingly parallel)."""

from __future__ import annotations

import re

import pytest

from ocr_auto_label_spark.operators.packing import chunk_documents

BUDGET, OVERLAP = 7, 2
STRIDE = BUDGET - OVERLAP


def _py_chunks(doc_id: int, text: str | None):
    toks = [] if text is None or text.strip() == "" else re.split(r"\s+", text.strip())
    n = len(toks)
    n_chunks = 1 if n <= BUDGET else 1 + -(-(n - BUDGET) // STRIDE)
    out = []
    for i in range(n_chunks):
        start = i * STRIDE
        k = min(BUDGET, n - start)
        out.append(
            (doc_id, i, start, k, " ".join(toks[start:start + k]), n, n_chunks)
        )
    return out


@pytest.fixture(scope="module")
def fixture_df(spark):
    rows = [
        (1, " ".join(f"w{i}" for i in range(23))),   # multi-chunk, ragged tail
        (2, " ".join(f"w{i}" for i in range(7))),    # exactly one budget
        (3, " ".join(f"w{i}" for i in range(8))),    # budget + 1 → 2 chunks
        (4, "a b c"),                                # short passthrough
        (5, ""),                                     # blank → one empty chunk
        (6, None),                                   # NULL → one empty chunk
        (7, "   x   y  "),                           # untrimmed whitespace
        (8, "a b c d e f g h\n\t "),                 # trailing non-space ws
        (9, "\n\t"),                                 # whitespace-only, no space
    ]
    return spark.createDataFrame(rows, "doc_id long, text string"), rows


def test_matches_python_reference(fixture_df):
    df, rows = fixture_df
    got = sorted(
        tuple(r) for r in chunk_documents(df, BUDGET, OVERLAP).collect()
    )
    want = sorted(c for doc_id, text in rows for c in _py_chunks(doc_id, text))
    assert got == want


def test_every_token_covered_and_overlap_exact(fixture_df):
    df, rows = fixture_df
    chunks = chunk_documents(df, BUDGET, OVERLAP).collect()
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, text in rows:
        toks = [] if text is None or text.strip() == "" else re.split(r"\s+", text.strip())
        cs = sorted(by_doc[doc_id], key=lambda r: r.chunk_idx)
        covered = set()
        for r in cs:
            covered.update(range(r.start_tok, r.start_tok + r.n_chunk_tokens))
        assert covered == set(range(len(toks))), doc_id
        for a, b in zip(cs, cs[1:]):  # consecutive chunks share exactly OVERLAP
            assert a.start_tok + a.n_chunk_tokens - b.start_tok == OVERLAP


def test_chunking_is_narrow(fixture_df):
    df, _ = fixture_df
    plan = chunk_documents(df, BUDGET, OVERLAP)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_chunk_then_pack_fits_context_window(spark):
    """The composition the two operators exist for: packing alone lets an
    oversized doc overflow its pack (it only assigns where the doc
    STARTS), but chunk-at-budget THEN pack-the-chunks guarantees every
    packed row fits the context window."""
    from pyspark.sql import functions as F

    from ocr_auto_label_spark.operators.packing import pack_sequences

    budget = 32
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    raw_packed = pack_sequences(docs, budget, "doc_id", "text")
    assert raw_packed.filter(F.col("n_tokens") > budget).count() > 0

    chunks = chunk_documents(docs, budget, 0).withColumn(
        # synthetic long id: packing's hash family needs a numeric id
        "chunk_id", F.col("doc_id") * 1_000_000 + F.col("chunk_idx")
    )
    chunk_packed = pack_sequences(chunks, budget, "chunk_id", "chunk_text")
    assert chunk_packed.filter(F.col("n_tokens") > budget).count() == 0
    assert chunk_packed.count() == chunks.count()


def test_arg_validation(fixture_df):
    df, _ = fixture_df
    with pytest.raises(ValueError):
        chunk_documents(df, 0)
    with pytest.raises(ValueError):
        chunk_documents(df, 8, overlap=8)
    with pytest.raises(ValueError):
        chunk_documents(df, 8, overlap=-1)
