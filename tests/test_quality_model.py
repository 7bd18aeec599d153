"""Trained hashed-LR quality classifier (operators/quality_model.py)
vs a from-scratch Python twin — EXACT double equality through all
training iterations (the algebraic sigmoid + ordered folds make the
whole loop bit-reproducible) — plus a separable corpus proving the
trainer actually learns."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from ocr_auto_label_spark.operators.quality_model import (
    LR_BUCKETS,
    train_quality_lr,
)
from test_xxh64_sql import xxh64_ref


def _tokens(t):
    import re

    return [w for w in re.split(r"\s+", (t or "").strip().lower()) if w]


def _py_train(rows, n_buckets=LR_BUCKETS, lr=0.5, iters=3):
    feats = {}
    for d, y, t in rows:
        ws = _tokens(t)
        if not ws:
            continue
        c = Counter(
            xxh64_ref(w.encode(), 42) % n_buckets for w in ws
        )
        dl = float(sum(c.values()))
        feats[d] = (
            1.0 if y else 0.0,
            sorted((b, float(cnt) / dl) for b, cnt in c.items()),
        )
    n = float(len(feats))
    w = [0.0] * n_buckets

    def dots():
        out = {}
        for d, (y, xs) in feats.items():
            acc = 0.0
            for b, x in xs:  # bucket order == the operator's fold
                acc = acc + w[b] * x
            out[d] = (y, acc)
        return out

    for _ in range(iters):
        errs = {
            d: (0.5 + dot / (2.0 * (1.0 + abs(dot)))) - y
            for d, (y, dot) in dots().items()
        }
        per_bucket = {}
        for d in sorted(feats):  # doc order == the operator's fold
            for b, x in feats[d][1]:
                per_bucket.setdefault(b, []).append(errs[d] * x)
        g = [0.0] * n_buckets
        for b, vals in per_bucket.items():
            acc = 0.0
            for v in vals:
                acc = acc + v
            g[b] = acc
        w = [w[b] - lr * (g[b] / n) for b in range(n_buckets)]
    scores = {
        d: (y, 0.5 + dot / (2.0 * (1.0 + abs(dot))))
        for d, (y, dot) in dots().items()
    }
    return w, scores


def test_lr_training_bit_exact_vs_python_twin(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = [
        (r.doc_id, r.lang == "en", r.text) for r in df.collect()
    ]
    want_w, want_scores = _py_train(rows)
    got_w, _, scored = train_quality_lr(
        df, label_expr=(F.col("lang") == "en")
    )
    assert got_w == want_w  # exact ==, all 64 doubles, 3 iterations deep
    got_scores = {
        r.id: (r.y, r.score) for r in scored.collect()
    }
    assert got_scores == want_scores


def test_lr_learns_a_separable_corpus(spark):
    pos_words = "alpha beta gamma delta epsilon zeta"
    neg_words = "omega psi chi phi upsilon tau"
    data = [(i, "good", pos_words) for i in range(20)] + [
        (i + 100, "bad", neg_words) for i in range(20)
    ]
    df = spark.createDataFrame(
        data, "doc_id long, grp string, text string"
    )
    w, _, scored = train_quality_lr(
        df, label_expr=(F.col("grp") == "good")
    )
    got = {r.id: (r.y, r.score) for r in scored.collect()}
    pos = [s for _, (y, s) in got.items() if y == 1.0]
    neg = [s for _, (y, s) in got.items() if y == 0.0]
    assert min(pos) > max(neg)  # fully separated
    acc = sum(
        1 for y, s in got.values() if (s >= 0.5) == (y == 1.0)
    ) / len(got)
    assert acc == 1.0
    assert any(x != 0.0 for x in w)


def test_lr_validation(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        train_quality_lr(df, F.lit(True), iterations=0)
    with pytest.raises(ValueError):
        train_quality_lr(df, F.lit(True), n_buckets=0)
    empty = spark.createDataFrame([(1, "   ")], "doc_id long, text string")
    with pytest.raises(ValueError, match="no documents"):
        train_quality_lr(empty, F.lit(True))
