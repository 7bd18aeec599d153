"""Bucketed time-range self-join (SURVEY.md J1).

The reference finds, for each item, all items within ±2 minutes
(grouping.ts:121-138) — executed there as one DB query per row.  Spark
OSS has no range-join optimization, so the standard technique applies:
bucket timestamps into window-width buckets, equi-join on
(key, bucket ± 1), then apply the exact |Δt| residual predicate.  The
equi-join is hash/sort-merge-able and AQE-skew-splittable; the residual
runs post-join.  Cost is O(rows · avg bucket occupancy), never O(N²).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def time_range_self_join(
    df: DataFrame,
    ts_col: str = "ts",
    id_col: str = "event_id",
    key_cols: list[str] | None = None,
    window_seconds: int = 120,
    how: str = "inner",
) -> DataFrame:
    """All pairs (a, b), a.id != b.id, same key_cols, |a.ts - b.ts| ≤ window.

    Output columns: key cols (from a), a_id, b_id, a_ts, b_ts, delta_s.
    """
    key_cols = key_cols or []
    # cast via TIMESTAMP first: parquet TIMESTAMP_NTZ can't cast to long directly
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    base = df.select(
        *[F.col(c) for c in key_cols],
        F.col(id_col).alias("id"),
        F.col(ts_col).alias("t"),
        epoch.alias("sec"),
        F.floor(epoch / window_seconds).alias("bucket"),
    )
    # each left row probes its own bucket and both neighbors
    a = base.select(
        *key_cols, "id", "t", "sec",
        F.explode(F.array(F.col("bucket") - 1, F.col("bucket"), F.col("bucket") + 1)).alias("bucket"),
    ).alias("a")
    b = base.alias("b")
    cond = [F.col(f"a.{c}") == F.col(f"b.{c}") for c in key_cols]
    cond.append(F.col("a.bucket") == F.col("b.bucket"))
    joined = a.join(b, cond, how)
    return (
        joined.filter(
            (F.col("a.id") != F.col("b.id"))
            & (F.abs(F.col("a.sec") - F.col("b.sec")) <= window_seconds)
        )
        .select(
            *[F.col(f"a.{c}").alias(c) for c in key_cols],
            F.col("a.id").alias("a_id"),
            F.col("b.id").alias("b_id"),
            F.col("a.t").alias("a_ts"),
            F.col("b.t").alias("b_ts"),
            (F.col("b.sec") - F.col("a.sec")).alias("delta_s"),
        )
    )
