"""End-to-end E1 lifecycle plan: structural invariants + cross-stage
consistency on the synthetic corpus."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from ocr_auto_label_spark.datagen import transcripts_parquet
from ocr_auto_label_spark.plans.full_pipeline import run_full_pipeline


@pytest.fixture(scope="module")
def result(spark):
    df = spark.read.parquet(transcripts_parquet(1500, seed=21))
    out = run_full_pipeline(df)
    out.cache()
    yield out
    out.unpersist()


def test_one_row_per_turn(spark, result):
    df = spark.read.parquet(transcripts_parquet(1500, seed=21))
    assert result.count() == df.count()
    assert result.select("id").distinct().count() == df.count()


def test_status_partition(result):
    statuses = {r.status for r in result.select("status").distinct().collect()}
    assert statuses <= {"extracted", "auto_grouped", "ungrouped", "pending_grouping"}
    counts = {r.status: r.cnt for r in
              result.groupBy("status").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert counts.get("extracted", 0) > 0
    assert counts.get("auto_grouped", 0) > 0, "transitive grouping must fire"


def test_grouped_rows_have_names_and_confidence(result):
    bad = result.filter(
        F.col("group").isNotNull()
        & (F.col("new_name").isNull() | F.col("grouping_confidence").isNull())
    ).count()
    assert bad == 0
    # ungrouped rows carry no name
    assert result.filter(F.col("group").isNull() & F.col("new_name").isNotNull()).count() == 0


def test_names_unique(result):
    dups = (
        result.filter(F.col("new_name").isNotNull())
        .groupBy("new_name").count().filter(F.col("count") > 1).count()
    )
    assert dups == 0, "duplicate resolution must leave names unique"


def test_webapp_ordinal_shape(result):
    # first member of each group is bare (no _n suffix), later members _2.._n
    rows = result.filter(F.col("group").isNotNull()).collect()
    by_group: dict[str, list] = {}
    for r in rows:
        by_group.setdefault(r.group, []).append(r)
    multi = [g for g, rs in by_group.items() if len(rs) > 1]
    assert multi, "fixture needs multi-member groups"
    for g in multi[:20]:
        names = {r.new_name for r in by_group[g]}
        assert len(names) == len(by_group[g])  # all distinct within the group
        bare = f"{g}.txt"  # group labels contain no chars the sanitizer touches
        assert bare in names, f"group {g} must have one bare first-member name"
        for n in names - {bare}:
            assert n.startswith(f"{g}_") and n.endswith(".txt")


def test_auto_grouped_confidence_range(result):
    rows = result.filter(F.col("status") == "auto_grouped").collect()
    for r in rows:
        assert 0.35 < r.grouping_confidence <= 1.0


def test_deterministic_across_runs(spark, result):
    df = spark.read.parquet(transcripts_parquet(1500, seed=21))
    again = run_full_pipeline(df)
    a = {r.id: (r.group, r.status, r.new_name) for r in result.collect()}
    b = {r.id: (r.group, r.status, r.new_name) for r in again.collect()}
    assert a == b
