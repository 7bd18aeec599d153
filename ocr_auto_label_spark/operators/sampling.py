"""Deterministic sampling / dataset-split operators.

A training-data pipeline needs reproducible train/val/test splits and
down-samples that (a) never change when the corpus is re-read in a
different order or partitioning, (b) need no stored assignment table,
and (c) cost one narrow projection — no shuffle, no RNG state.  The
standard recipe is hash-based bucketing: ``bucket = pmod(xxhash64(id),
B)`` and split boundaries as cumulative bucket ranges.  Every engine
replica computes the same assignment independently (xxhash64 is a pure
function of the id), so the split is stable across runs, clusters, and
engines — the same property the lineage layer relies on.

Scale shape: a per-row hash + compare inside whole-stage codegen; at
100 TB this adds nothing to the scan cost and the split can be used as
a pushed-down filter (``hash_sample``) so downstream stages read only
the sampled fraction.

The DuckDB oracle replicates Spark's ``xxhash64(BIGINT)`` bit-exactly
via ``functions.xxh64_sql.xxh64_long8_stages`` (XXH64 of the 8-byte
little-endian word, seed 42 — Spark XXH64.hashLong), so assignments are
value-hash-compared, not just counted.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def hash_bucket(id_col: Column, buckets: int = 100) -> Column:
    """Stable bucket in [0, buckets) from xxhash64 of ``id_col`` (seed 42,
    Spark's default).  ``pmod`` (not ``%``) because xxhash64 is signed:
    Java ``%`` keeps the dividend's sign and half of all hashes are
    negative."""
    return F.pmod(F.xxhash64(id_col.cast("long")), F.lit(buckets))


def deterministic_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: tuple[int, ...] = (80, 10, 10),
    names: tuple[str, ...] = ("train", "val", "test"),
    buckets: int = 100,
) -> DataFrame:
    """Add ``bucket`` and ``split`` columns: reproducible hash-based
    train/val/test assignment.  ``weights`` are bucket counts summing to
    ``buckets``; split *i* owns the cumulative bucket range
    [Σw[:i], Σw[:i+1]).  Pure narrow projection — no shuffle, no RNG."""
    if len(weights) != len(names):
        raise ValueError("deterministic_split: len(weights) != len(names)")
    if sum(weights) != buckets:
        raise ValueError(
            f"deterministic_split: weights must sum to buckets ({buckets}), "
            f"got {sum(weights)}"
        )
    bucket = hash_bucket(F.col(id_col), buckets)
    hi = 0
    conds = []
    for w, n in zip(weights, names):
        hi += w
        conds.append((hi, n))
    split: Column = F.lit(names[-1])
    for hi_bound, name in reversed(conds[:-1]):
        split = F.when(F.col("bucket") < hi_bound, F.lit(name)).otherwise(split)
    return df.withColumn("bucket", bucket).withColumn("split", split)


def hash_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    numerator: int = 10,
    buckets: int = 100,
) -> DataFrame:
    """Deterministic ``numerator/buckets`` down-sample: keep rows whose
    hash bucket < numerator.  The predicate is a pure function of the id
    column, so it composes with any scan and never resamples."""
    if not 0 <= numerator <= buckets:
        raise ValueError("hash_sample: numerator must be in [0, buckets]")
    return df.filter(hash_bucket(F.col(id_col), buckets) < numerator)
