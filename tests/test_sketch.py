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


def test_hll_registers_invariants_and_merge(spark):
    from pyspark.sql import functions as F

    from ocr_auto_label_spark.operators.sketch import (
        hll_estimate,
        hll_registers,
    )

    df = spark.read.parquet(SF)
    regs = {(r.bucket, r.max_rank) for r in hll_registers(df).collect()}
    assert all(0 <= b < 1024 and 1 <= m <= 55 for b, m in regs)
    # registers are a pure function of the distinct-term set: the same
    # sketch at any partitioning, and register-wise max merges slices
    a = {r.bucket: r.max_rank
         for r in hll_registers(df.filter(F.col("doc_id") % 2 == 0))
         .collect()}
    b = {r.bucket: r.max_rank
         for r in hll_registers(df.filter(F.col("doc_id") % 2 == 1))
         .collect()}
    merged = {k: max(a.get(k, 0), b.get(k, 0)) for k in set(a) | set(b)}
    assert merged == dict(regs)
    assert {
        (r.bucket, r.max_rank)
        for r in hll_registers(df.repartition(13)).collect()
    } == regs


def test_hll_estimate_formula_and_accuracy(spark):
    import re

    from ocr_auto_label_spark.operators.sketch import (
        hll_constants,
        hll_estimate,
        hll_registers,
    )

    df = spark.read.parquet(SF)
    regs = hll_registers(df)
    row = hll_estimate(regs).first()
    m, kp1, numer = hll_constants(10)
    ranks = [r.max_rank for r in regs.collect()]
    s_total = sum(1 << (kp1 - mr) for mr in ranks) + (m - len(ranks)) * (
        1 << kp1
    )
    assert row.n_buckets_hit == len(ranks)
    assert row.estimate_raw == numer / float(s_total)  # exact ==
    true = len(
        _true_counts([(r.text,) for r in df.select("text").collect()])
    )
    # tiny vocab → the linear-counting branch must fire and be close
    assert row.estimate != row.estimate_raw
    assert abs(row.estimate - true) / true < 0.15
    import pytest as _pytest

    with _pytest.raises(ValueError):
        hll_registers(df, p=3)
    with _pytest.raises(ValueError):
        hll_estimate(regs, p=17)


def test_bloom_filter_invariants(spark):
    from ocr_auto_label_spark.operators.sketch import (
        bloom_build,
        bloom_might_contain,
    )

    df = spark.read.parquet(SF)
    true = _true_counts([(r.text,) for r in df.select("text").collect()])
    vocab = sorted(true)
    bits = bloom_build(df)
    got = {
        r.term: (r.hits, r.might_contain)
        for r in bloom_might_contain(bits, vocab).collect()
    }
    # NO false negatives, ever: every corpus term answers yes
    assert all(got[t] == (4, True) for t in vocab)
    # a clean miss at the default size
    miss = bloom_might_contain(bits, ["zzz_not_a_word"]).collect()[0]
    assert (miss.hits, miss.might_contain) == (0, False)
    # a saturated filter (m=16) must produce false positives — the
    # one-sided error is the price of constant size
    small = bloom_build(df, k=2, m=16)
    probes = [f"zz_fake_{i}" for i in range(30)]
    sm = bloom_might_contain(small, probes, k=2, m=16).collect()
    assert any(r.might_contain for r in sm)
    # merge = DISTINCT UNION of bit tables: bits(A ∪ B) == bits(A) ∪ bits(B)
    from pyspark.sql import functions as F

    a = bloom_build(df.filter(F.col("doc_id") % 2 == 0))
    b = bloom_build(df.filter(F.col("doc_id") % 2 == 1))
    merged = {r.bit_pos for r in a.unionByName(b).distinct().collect()}
    assert merged == {r.bit_pos for r in bits.collect()}


def test_sketches_survive_empty_corpus(spark):
    from ocr_auto_label_spark.operators.sketch import (
        bloom_build,
        bloom_might_contain,
        cms_build,
        cms_estimate,
        hll_constants,
        hll_estimate,
        hll_registers,
    )

    empty = spark.createDataFrame([], "doc_id long, text string")
    sk = cms_build(empty)
    assert sk.count() == 0
    assert [(r.term, r.est) for r in cms_estimate(sk, ["x"]).collect()] \
        == [("x", 0)]
    bits = bloom_build(empty)
    probe = bloom_might_contain(bits, ["x"]).collect()[0]
    assert (probe.hits, probe.might_contain) == (0, False)
    regs = hll_registers(empty)
    assert regs.count() == 0
    row = hll_estimate(regs).first()
    m, _, numer = hll_constants(10)
    # zero set registers: raw = alpha*m (every register contributes
    # 2^kp1), corrected = m*ln(m/m) = 0.0
    assert row.n_buckets_hit == 0
    assert row.estimate_raw == numer / float(m * (1 << (64 - 10 + 1)))
    assert row.estimate == 0.0
