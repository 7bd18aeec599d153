"""Sequence packing (operators/packing.py) vs a pure-Python reference."""

from __future__ import annotations

import re
import struct

import pytest
from pyspark.sql import functions as F

from ocr_auto_label_spark.operators.packing import pack_sequences
from test_xxh64_sql import xxh64_ref

SF_DIR = "/root/testdata/sf0.001"
BUDGET = 512
SHARDS = 4


def _h(doc_id: int) -> int:
    u = xxh64_ref(struct.pack("<q", doc_id), 42)
    return u - 2**64 if u >= 2**63 else u


def test_pack_sequences_vs_python(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = {
        r.doc_id: (r.shard, r.n_tokens, r.start_offset, r.pack_id)
        for r in pack_sequences(docs, BUDGET, n_shards=SHARDS).collect()
    }
    rows = docs.select("doc_id", "text").collect()
    shards = {}
    for r in rows:
        tc = len(re.split(r"\s+", r.text.strip()))
        sh = ((_h(r.doc_id) % SHARDS) + SHARDS) % SHARDS
        shards.setdefault(sh, []).append((_h(r.doc_id), r.doc_id, tc))
    want = {}
    for sh, items in shards.items():
        off = 0
        for _, did, tc in sorted(items):
            want[did] = (sh, tc, off, off // BUDGET)
            off += tc
    assert got == want
    # non-degenerate: several packs per shard, docs span pack boundaries
    assert len({(v[0], v[3]) for v in got.values()}) > SHARDS


def test_pack_sequences_is_layout_invariant(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    base = {r.doc_id: r.pack_id for r in pack_sequences(docs, BUDGET).collect()}
    shuffled = docs.repartition(13).sortWithinPartitions(F.desc("doc_id"))
    again = {r.doc_id: r.pack_id for r in pack_sequences(shuffled, BUDGET).collect()}
    assert base == again


def test_pack_sequences_respects_split_boundaries(spark):
    """within_cols=['split']: a (split, shard, pack_id) pack never mixes
    splits, and within each split the packing equals packing that split
    alone — training packs can never contain eval documents."""
    from ocr_auto_label_spark.operators.sampling import deterministic_split

    docs = deterministic_split(
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
    ).select("doc_id", "text", "split")
    packed = pack_sequences(docs, BUDGET, n_shards=SHARDS, within_cols=["split"])
    rows = packed.collect()
    by_pack = {}
    for r in rows:
        by_pack.setdefault((r.split, r.shard, r.pack_id), set()).add(r.split)
    assert all(len(s) == 1 for s in by_pack.values())
    for name in ("train", "val", "test"):
        alone = {
            r.doc_id: (r.shard, r.start_offset, r.pack_id)
            for r in pack_sequences(
                docs.filter(F.col("split") == name), BUDGET, n_shards=SHARDS
            ).collect()
        }
        joint = {
            r.doc_id: (r.shard, r.start_offset, r.pack_id)
            for r in rows if r.split == name
        }
        assert joint == alone, name


def test_pack_sequences_validates(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    with pytest.raises(ValueError):
        pack_sequences(docs, 0)
    with pytest.raises(ValueError):
        pack_sequences(docs, 100, n_shards=0)
