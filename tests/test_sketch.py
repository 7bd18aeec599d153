"""Count-min sketch (operators/sketch.py): estimator invariants vs
exact counts, the merge identity, and the collision/overestimate
behaviour a small grid must exhibit."""

from __future__ import annotations

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from ocr_auto_label_spark.operators.sketch import (
    cms_build,
    cms_estimate,
    cms_merge,
)

SF = "/root/testdata/sf0.001/documents.parquet"


def _true_counts(rows):
    c = Counter()
    for (text,) in rows:
        c.update(w for w in re.split(r"\s+", text.strip().lower()) if w)
    return c


def test_cms_estimates_never_undercount_and_zero_when_roomy(spark):
    df = spark.read.parquet(SF)
    true = _true_counts([(r.text,) for r in df.select("text").collect()])
    vocab = sorted(true)
    sk = cms_build(df)  # default 4×1024
    est = {r.term: r.est for r in cms_estimate(sk, vocab).collect()}
    assert set(est) == set(vocab)
    assert all(est[t] >= true[t] for t in vocab)
    # absent probe: every cell it hashes to may still carry collision
    # mass, but with width 1024 over this tiny vocab it reads clean 0
    probe = cms_estimate(sk, ["zzz_not_a_word"]).collect()
    assert [(r.term, r.est) for r in probe] == [("zzz_not_a_word", 0)]


def test_cms_small_width_forces_one_sided_error(spark):
    df = spark.read.parquet(SF)
    true = _true_counts([(r.text,) for r in df.select("text").collect()])
    vocab = sorted(true)
    assert len(vocab) > 16  # the premise of the collision test
    sk = cms_build(df, depth=2, width=16)
    est = {
        r.term: r.est
        for r in cms_estimate(sk, vocab, depth=2, width=16).collect()
    }
    assert all(est[t] >= true[t] for t in vocab)  # never undercounts
    assert any(est[t] > true[t] for t in vocab)  # but must collide here


def test_cms_merge_equals_whole_corpus_sketch(spark):
    df = spark.read.parquet(SF)
    a = cms_build(df.filter(F.col("doc_id") % 2 == 0))
    b = cms_build(df.filter(F.col("doc_id") % 2 == 1))
    whole = {
        (r.row_j, r.bucket): r.cnt for r in cms_build(df).collect()
    }
    merged = {
        (r.row_j, r.bucket): r.cnt for r in cms_merge(a, b).collect()
    }
    assert merged == whole  # exact cell-wise identity, any data split


def test_cms_argument_validation(spark):
    df = spark.read.parquet(SF)
    with pytest.raises(ValueError):
        cms_build(df, depth=0)
    with pytest.raises(ValueError):
        cms_build(df, width=0)
    sk = cms_build(df)
    with pytest.raises(ValueError):
        cms_estimate(sk, [])
    with pytest.raises(ValueError):
        cms_estimate(sk, ["dup", "DUP"])
