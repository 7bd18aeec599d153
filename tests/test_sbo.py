"""Stupid-Backoff bigram LM scoring (textstats.stupid_backoff_scores)
vs a from-scratch Python twin — EXACT double equality (the operator's
ordered left-fold makes the float sum deterministic), with a fixture
where the backoff path provably fires."""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import functions as F

from ocr_auto_label_spark.operators.textstats import stupid_backoff_scores

ALPHA = 0.4


def _py_sbo(rows, model_ids, alpha=ALPHA):
    toks = {
        d: [w for w in re.split(r"\s+", t.strip().lower()) if w]
        for d, t in rows
    }
    uni, big = Counter(), Counter()
    for d in model_ids:
        ws = toks[d]
        uni.update(ws)
        big.update(zip(ws, ws[1:]))
    n_total = sum(uni.values())
    out = {}
    for d, ws in toks.items():
        if not ws:
            continue
        s = 0.0
        used_backoff = False
        for i, w in enumerate(ws):  # natural order == the ordered fold
            p_uni = (
                float(uni[w]) / float(n_total) if uni[w] else 0.0
            )
            if i == 0:
                s = s + p_uni
            elif (ws[i - 1], w) in big:
                s = s + float(big[(ws[i - 1], w)]) / float(
                    uni[ws[i - 1]]
                )
            else:
                used_backoff = True
                s = s + alpha * p_uni
        out[d] = (len(ws), s / float(len(ws)), used_backoff)
    return out


def test_sbo_matches_python_twin_on_fixture_corpus(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = [(r.doc_id, r.text) for r in df.collect()]
    model_ids = {r.doc_id for r in df.collect() if r.lang == "en"}
    want = {
        d: (n, s) for d, (n, s, _) in _py_sbo(rows, model_ids).items()
    }
    got = {
        r.id: (r.token_cnt, r.sbo_mean)
        for r in stupid_backoff_scores(
            df, model_predicate=(F.col("lang") == "en")
        ).collect()
    }
    assert got == want  # exact ==, no tolerance


def test_sbo_backoff_path_fires_and_matches(spark):
    # model doc lacks the bigram "red fox" and the word "blue" entirely:
    # doc 2 must take the α·unigram backoff at "fox"→? and score 0 for
    # the unseen word
    data = [
        (0, "m", "the quick fox jumps over the lazy dog"),
        (1, "m", "the quick dog naps"),
        (2, "q", "red fox naps blue"),
        (3, "q", "the quick fox"),
    ]
    df = spark.createDataFrame(data, "doc_id long, grp string, text string")
    rows = [(d, t) for d, _, t in data]
    want_full = _py_sbo(rows, {0, 1})
    assert want_full[2][2], "fixture must exercise the backoff path"
    assert not want_full[3][2], "and a pure-model doc must not"
    want = {d: (n, s) for d, (n, s, _) in want_full.items()}
    got = {
        r.id: (r.token_cnt, r.sbo_mean)
        for r in stupid_backoff_scores(
            df, model_predicate=(F.col("grp") == "m")
        ).collect()
    }
    assert got == want
    # doc 3 is fully in-model: its positions score unigram then exact
    # bigram ratios — strictly positive everywhere
    assert got[3][1] > 0.0
