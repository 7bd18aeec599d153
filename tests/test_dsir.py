"""DSIR hashed-bigram importance reweighting (operators/textstats.py
dsir_logweights) — the Spark operator must match a from-scratch Python
twin (own tokenizer, own spec-derived XXH64, own distribution math), and
the weights must actually separate the target domain from the rest."""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from ocr_auto_label_spark.operators.textstats import dsir_logweights
from test_xxh64_sql import xxh64_ref

N_BUCKETS = 1024


def _py_dsir(rows: list[tuple[int, str, str]], target_lang: str = "en"):
    """rows = (doc_id, lang, text).  Returns {doc_id: (n_grams, avg_lw)}."""
    occ = {}  # doc_id -> Counter(bucket -> k)
    is_tgt = {}
    for doc_id, lang, text in rows:
        toks = [w for w in re.split(r"\s+", text.strip().lower()) if w != ""]
        grams = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        if not grams:
            continue
        buckets = Counter(
            xxh64_ref(g.encode(), 42) % N_BUCKETS for g in grams
        )
        occ[doc_id] = buckets
        is_tgt[doc_id] = lang == target_lang
    raw, tgt = Counter(), Counter()
    for doc_id, buckets in occ.items():
        raw.update(buckets)
        if is_tgt[doc_id]:
            tgt.update(buckets)
    raw_tot, tgt_tot = sum(raw.values()), sum(tgt.values())
    lw = {
        b: math.log((tgt[b] + 1.0) / (tgt_tot + N_BUCKETS))
        - math.log((raw[b] + 1.0) / (raw_tot + N_BUCKETS))
        for b in raw
    }
    return {
        doc_id: (
            sum(buckets.values()),
            sum(k * lw[b] for b, k in buckets.items()) / sum(buckets.values()),
        )
        for doc_id, buckets in occ.items()
    }


@pytest.fixture(scope="module")
def docs_rows(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return [(r.doc_id, r.lang, r.text) for r in df.collect()]


def test_matches_python_twin(spark, docs_rows):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {
        r.doc_id: (r.n_grams, r.avg_logweight)
        for r in dsir_logweights(df, target=(F.col("lang") == "en")).collect()
    }
    want = _py_dsir(docs_rows)
    assert set(got) == set(want)
    for doc_id, (n, avg) in want.items():
        gn, gavg = got[doc_id]
        assert gn == n, doc_id
        # same multiset of IEEE addends, engine-dependent summation order
        assert math.isclose(gavg, avg, rel_tol=0, abs_tol=1e-9), doc_id


def test_weights_separate_target_domain(spark, docs_rows):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = dsir_logweights(df, target=(F.col("lang") == "en")).collect()
    lang = {doc_id: l for doc_id, l, _ in docs_rows}
    en = [r.avg_logweight for r in out if lang[r.doc_id] == "en"]
    rest = [r.avg_logweight for r in out if lang[r.doc_id] != "en"]
    assert en and rest
    assert sum(en) / len(en) > sum(rest) / len(rest)


def test_plan_is_jvm_side_with_bounded_broadcasts(spark):
    """The scoring join must be a broadcast (the bucket table is ≤1024
    rows by construction) and the whole plan JVM-side — no Python eval
    of any kind in a pure column-math operator."""
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = dsir_logweights(df, target=(F.col("lang") == "en"))
    out.write.format("noop").mode("overwrite").save()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "EvalPython" not in plan  # neither Batch- nor Arrow-


def test_short_docs_absent_and_bad_buckets_rejected(spark):
    df = spark.createDataFrame(
        [(1, "en", "one two three"), (2, "en", "solo"), (3, "de", "")],
        "doc_id long, lang string, text string",
    )
    out = dsir_logweights(df, target=(F.col("lang") == "en")).collect()
    assert {r.doc_id for r in out} == {1}  # <2 tokens → no bigrams → absent
    with pytest.raises(ValueError):
        dsir_logweights(df, target=F.lit(True), n_buckets=1000)
