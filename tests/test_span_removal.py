"""Duplicated-substring removal (operators/dedup.py
remove_duplicated_spans, Lee et al. 2021 §4) — one-copy-survives
semantics vs a from-scratch Python twin, plus invariants: the canonical
occurrence is untouched, duplicate spans vanish from everywhere else,
and total token count shrinks by exactly the covered-position unions."""

from __future__ import annotations

import re
from collections import defaultdict

import pytest

from ocr_auto_label_spark.datagen import transcripts_parquet
from ocr_auto_label_spark.operators.dedup import remove_duplicated_spans

W = 8


def _py_remove_spans(rows: dict, width: int):
    """rows: {key_tuple: text} (any arity; first component unpadded,
    the rest zero-padded — mirroring the operator's occurrence key).
    Independent implementation: dict-of-occurrences, canonical by
    padded key, interval union."""
    toks = {
        k: ([] if t is None or t.strip() == "" else re.split(r"\s+", t.strip()))
        for k, t in rows.items()
    }
    occs = defaultdict(list)  # span -> [(okey, key, p)]
    for key, ts in toks.items():
        for p in range(max(len(ts) - width + 1, 0)):
            span = " ".join(ts[p:p + width])
            okey = "/".join(
                [str(key[0])] + [f"{x:012d}" for x in key[1:]] + [f"{p:012d}"]
            )
            occs[span].append((okey, key, p))
    covered = defaultdict(set)  # key -> positions
    for span, lst in occs.items():
        if len(lst) < 2:
            continue
        canon = min(o for o, _, _ in lst)
        for okey, key, p in lst:
            if okey != canon:
                covered[key].update(range(p, p + width))
    out = {}
    for key, ts in toks.items():
        kept = [t for i, t in enumerate(ts) if i not in covered[key]]
        out[key] = (" ".join(kept), len(ts), len(kept))
    return out


@pytest.fixture(scope="module")
def corpus(spark):
    path = transcripts_parquet(2_000)
    df = spark.read.parquet(path)
    rows = {(r.conv_id, r.turn_idx): r.text for r in df.collect()}
    got = {
        (r.conv_id, r.turn_idx): (r.new_text, r.n_tokens, r.n_kept_tokens)
        for r in remove_duplicated_spans(df, width=W).collect()
    }
    return rows, got


def test_matches_python_twin(corpus):
    rows, got = corpus
    want = _py_remove_spans(rows, W)
    assert got == want


def test_one_copy_survives_without_overlap(spark):
    """On a fixture where duplicated spans don't overlap other duplicated
    spans, semantics are exact: the canonical (lexicographically first)
    occurrence survives untouched, every other occurrence vanishes.
    (On arbitrary corpora a DIFFERENT overlapping duplicated span may
    cover part of a canonical copy — the same property Lee et al.'s
    byte-range dedup has — so the exact claim needs the no-overlap
    fixture; the corpus-level behavior is pinned by the python twin.)"""
    df = spark.createDataFrame(
        [("a", 0, "x y z w q r"), ("b", 0, "x y z w q k"),
         ("c", 0, "u v x y z w q r t"), ("d", 0, "fresh words only here")],
        "conv_id string, turn_idx int, text string",
    )
    got = {(r.conv_id, r.turn_idx): (r.new_text, r.n_tokens, r.n_kept_tokens)
           for r in remove_duplicated_spans(df, width=4).collect()}
    assert got == {
        ("a", 0): ("x y z w q r", 6, 6),   # canonical copies: intact
        ("b", 0): ("k", 6, 1),             # covered union 0-4 removed
        ("c", 0): ("u v t", 9, 3),         # covered union 2-7 removed
        ("d", 0): ("fresh words only here", 4, 4),
    }


def test_corpus_shrinks_and_dup_occurrences_drop(corpus):
    rows, got = corpus
    before = sum(n for _, n, _ in got.values())
    after = sum(k for _, _, k in got.values())
    assert 0 < after < before
    # duplicate occurrences in the REWRITTEN corpus are strictly fewer
    def span_counts(texts):
        spans = defaultdict(int)
        for text in texts:
            ts = [] if not text else re.split(r"\s+", text)
            for p in range(max(len(ts) - W + 1, 0)):
                spans[" ".join(ts[p:p + W])] += 1
        return spans
    orig = span_counts([t.strip() if t else "" for t in rows.values()])
    new = span_counts([t for t, _, _ in got.values()])
    dup_occ_before = sum(c for c in orig.values() if c > 1)
    dup_occ_after = sum(c for c in new.values() if c > 1)
    assert dup_occ_after < dup_occ_before


def test_short_and_blank_rows_pass_through(spark):
    df = spark.createDataFrame(
        [("a", 0, "tiny"), ("b", 0, ""), ("c", 0, None), ("d", 0, " x \n")],
        "conv_id string, turn_idx int, text string",
    )
    got = {(r.conv_id, r.turn_idx): tuple(r)[2:]
           for r in remove_duplicated_spans(df, width=W).collect()}
    assert got == {
        ("a", 0): ("tiny", 1, 1),
        ("b", 0): ("", 0, 0),
        ("c", 0): ("", 0, 0),
        ("d", 0): ("x", 1, 1),
    }
    with pytest.raises(ValueError):
        remove_duplicated_spans(df, width=0)
