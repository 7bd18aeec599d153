"""Inverted index + boolean search (operators/search.py) vs a
from-scratch Python twin; AND semantics edge cases."""

from __future__ import annotations

import re
from collections import defaultdict

import pytest

from ocr_auto_label_spark.operators.search import (
    boolean_search,
    build_inverted_index,
)


def _py_index(rows):
    post = defaultdict(set)
    for doc_id, text in rows:
        for w in set(re.split(r"\s+", text.strip().lower())):
            if w:
                post[w].add(doc_id)
    return {t: sorted(ids) for t, ids in post.items()}


def test_index_matches_python_twin(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = [(r.doc_id, r.text) for r in df.collect()]
    got = {r.term: (r.df_cnt, list(r.postings))
           for r in build_inverted_index(df).collect()}
    want = _py_index(rows)
    assert set(got) == set(want)
    for t, ids in want.items():
        assert got[t] == (len(ids), ids), t


def test_boolean_and_search(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = [(r.doc_id, r.text) for r in df.collect()]
    idx = build_inverted_index(df)
    post = _py_index(rows)
    must = ["merge", "spark", "window"]
    want = set(post[must[0]])
    for t in must[1:]:
        want &= set(post[t])
    got = {r.id for r in boolean_search(idx, must).collect()}
    assert got == want and 0 < len(got) < len(rows)
    # query terms are normalized like the index's tokens
    assert {r.id for r in boolean_search(idx, ["Merge", "SPARK", "window"])
            .collect()} == want
    # a term absent from the corpus empties an AND query
    assert boolean_search(idx, ["merge", "zzz_not_a_word"]).count() == 0
    with pytest.raises(ValueError):
        boolean_search(idx, [])
    with pytest.raises(ValueError):
        boolean_search(idx, ["merge", "merge"])
    with pytest.raises(ValueError):
        boolean_search(idx, ["merge", "MERGE"])  # collapse post-lowering


def test_max_df_excludes_hot_terms_at_build_time(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = [(r.doc_id, r.text) for r in df.collect()]
    post = _py_index(rows)
    cut = max(len(v) for v in post.values()) - 1  # drop only the hottest tier
    got = {r.term: (r.df_cnt, list(r.postings))
           for r in build_inverted_index(df, max_df=cut).collect()}
    want = {t: (len(ids), ids) for t, ids in post.items() if len(ids) <= cut}
    assert got == want and len(want) < len(post)
    with pytest.raises(ValueError):
        build_inverted_index(df, max_df=0)
