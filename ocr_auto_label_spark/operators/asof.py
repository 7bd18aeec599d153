"""As-of (most-recent-prior) join — the temporal lookup Spark has no
built-in operator for (reference analog: the webapp's "latest state at
this moment" picks, e.g. sampleGroups.ts most-recent selection; same
shape as pandas ``merge_asof`` and DuckDB/kdb ASOF JOIN).

Scalable shape — the UNION + ORDERED-WINDOW-CARRY trick, not a range
join: tag both inputs, union them, and carry the last right-side
payload forward within each key ordered by (ts, right-before-left).
That is ONE shuffle on the join key and a linear pass per partition —
no (left × right-within-window) fan-out, no range-bucket explosion, and
skew behaves like any window (a hot key is one sorted run).  The
right side is pre-deduplicated to one row per (key, ts) with a
deterministic max-id pick, which makes the semantics total even when
timestamps collide (and keeps the DuckDB ASOF-JOIN oracle — which has
no tie-break of its own — well-defined on the same input).

``tolerance_us`` mirrors pandas ``merge_asof(tolerance=...)``: matches
older than the tolerance are nulled out AFTER the carry (exact integer
microsecond arithmetic — ``unix_micros``/``epoch_us`` — never float
timestamp math).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _us(col):
    """Exact integer microseconds.  The cast handles TIMESTAMP_NTZ
    inputs (unix_micros requires TIMESTAMP; in the UTC session the
    ntz->timestamp cast is the wall-clock identity)."""
    return F.unix_micros(col.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts_col: str = "ts",
    right_id_col: str = "event_id",
    tolerance_us: int | None = None,
) -> DataFrame:
    """For every left row, the most recent right row with the same
    ``on`` keys and ``right.ts <= left.ts`` (inclusive).

    Returns all of ``left``'s columns plus ``asof_{right_id_col}``
    (NULL when no prior right row / outside tolerance) and ``asof_gap_us``
    (exact integer microseconds between the two timestamps).
    """
    if not on:
        raise ValueError("asof_join: join keys must be non-empty")
    if tolerance_us is not None and tolerance_us < 0:
        raise ValueError("asof_join: tolerance_us must be >= 0")
    # deterministic tie-break: one right row per (key, ts), max id wins
    r = (
        right.groupBy(*on, ts_col)
        .agg(F.max(right_id_col).alias("__r_id"))
        .select(
            *on,
            F.col(ts_col).alias("__ts"),
            F.lit(1).alias("__is_right"),
            F.struct(
                F.col("__r_id"),
                _us(F.col(ts_col)).alias("__r_us"),
            ).alias("__r"),
        )
    )
    l = left.select(
        "*",
        F.col(ts_col).alias("__ts"),
        F.lit(0).alias("__is_right"),
        F.lit(None).cast(r.schema["__r"].dataType).alias("__r"),
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__is_right").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        l.unionByName(r, allowMissingColumns=True)
        .withColumn("__carry", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__is_right") == 0)
    )
    gap = _us(F.col(ts_col)) - F.col("__carry.__r_us")
    matched = F.col("__carry").isNotNull() & (
        F.lit(True)
        if tolerance_us is None
        else (gap <= F.lit(tolerance_us))
    )
    return carried.select(
        *left.columns,
        F.when(matched, F.col("__carry.__r_id"))
        .alias(f"asof_{right_id_col}"),
        F.when(matched, gap).alias("asof_gap_us"),
    )
