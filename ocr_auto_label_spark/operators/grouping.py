"""Auto-grouping: the reference's sequential-transitive neighbor assignment
(E1 stage 6), contained for Spark.

Reference semantics (grouping.ts:28-206): ungrouped items are visited in
ascending timestamp; each looks at ALL items within ±2 minutes that
currently hold a valid group, scores them (description tiers 0.8/0.6/0.3,
color similarity ×0.6 when ≥0.5, time decay ×0.2), and accepts the best
score strictly > 0.35.  Each acceptance commits *before* the next item is
examined, so grouping is sequential and **transitive** within a time
neighborhood.

Spark containment: items further apart than the window can never
influence each other, and influence only chains through consecutive gaps
≤ window.  So clusters = session windows with gap = window (per any
partition keys), which are provably independent — the order-dependent
fold runs *inside* each cluster via ``applyInPandas`` (Arrow grouped map,
not a per-row UDF), using the same pure-Python ``labelcore.similarity``
the oracle uses.  Cluster sizes are bounded by time density, not table
size, so the pandas fold never sees more than a neighborhood.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ocr_auto_label_spark.labelcore.similarity import (
    ACCEPT_THRESHOLD,
    TIME_WINDOW_MS,
    _color_part,
    _text_tier,
)

GROUPED_SCHEMA = StructType([
    StructField("id", StringType()),
    StructField("ts_ms", LongType()),
    StructField("group", StringType()),
    StructField("status", StringType()),
    StructField("grouping_confidence", DoubleType()),
])

# statuses eligible as grouping *sources* (grouping.ts:136)
_SOURCE_STATUSES = ("extracted", "auto_grouped", "user_grouped")
# statuses that *need* grouping (grouping.ts:33-38)
_TARGET_STATUSES = ("pending_grouping", "invalid_group")


def sequential_group_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
    """The exact reference fold over one time-cluster (pure pandas/python).

    Expects columns: id, ts_ms, group, status, desc, colors (list[str]),
    grouping_confidence.  Returns the grouped-state columns.
    """
    def _as_list(v) -> list:
        if v is None or (not hasattr(v, "__len__") and pd.isna(v)):
            return []
        return list(v)

    def _as_str(v):
        return None if v is None or (isinstance(v, float) and pd.isna(v)) else v

    rows = pdf.sort_values(["ts_ms", "id"]).to_dict("records")
    # normalize Arrow artifacts (numpy arrays, NaN) to plain Python, and
    # precompute the scorer's pair-cache keys once per row (lowered desc,
    # color tuple) — the inner loop then scores via lru hits
    for row in rows:
        row["colors"] = _as_list(row.get("colors"))
        row["desc"] = _as_str(row.get("desc"))
        row["group"] = _as_str(row.get("group"))
        row["_desc_l"] = row["desc"].lower() if row["desc"] else None
        row["_colors_t"] = tuple(row["colors"])
        row["_attr"] = (row["_desc_l"], row["_colors_t"])
    # rows are ts-sorted, so the ±window candidate set is the contiguous
    # slice [lo, hi) — bisect bounds turn the fold from O(n²) into
    # O(n·window_density) without changing iteration order (same
    # subsequence, same ts-ascending visit order → identical tie-breaks)
    from bisect import bisect_left, bisect_right

    ts_sorted = [r["ts_ms"] for r in rows]
    # pair-attribute score memo: the desc-tier + color components depend
    # only on the two rows' (_desc_l, _colors_t) attrs, which repeat
    # heavily inside a cluster — ONE dict hit replaces two lru calls; the
    # per-pair time decay is inlined (grouping.ts:187-190)
    pair_base: dict = {}
    # iterate targets in ascending timestamp (grouping.ts:33-38)
    for row in rows:
        if row["status"] not in _TARGET_STATUSES:
            continue
        best_score, best_group = 0.0, None
        row_ts = row["ts_ms"]
        row_id = row["id"]
        row_attr = row["_attr"]
        lo = bisect_left(ts_sorted, row_ts - TIME_WINDOW_MS)
        hi = bisect_right(ts_sorted, row_ts + TIME_WINDOW_MS)
        for i in range(lo, hi):
            cand = rows[i]
            if cand["id"] == row_id:
                continue
            # NOTE: cand["group"]/cand["status"] are re-read live each
            # iteration — earlier targets may have just committed
            # (transitivity), so eligibility cannot be precomputed
            if cand["group"] is None or cand["status"] not in _SOURCE_STATUSES:
                continue
            k = (row_attr, cand["_attr"])
            base = pair_base.get(k)
            if base is None:
                base = (
                    _text_tier(row_attr[0], cand["_attr"][0])
                    if row_attr[0] and cand["_attr"][0] else 0.0
                ) + _color_part(row_attr[1], cand["_attr"][1])
                pair_base[k] = base
            # bit-identical to grouping_score's decay expression — scores
            # feed strict > comparisons, so the float ops must not be
            # algebraically rearranged
            delta = cand["ts_ms"] - row_ts
            if delta < 0:
                delta = -delta
            decay = 1.0 - (delta / TIME_WINDOW_MS)
            score = base + (decay if decay > 0.0 else 0.0) * 0.2
            # strict > : first-seen wins on ties (grouping.ts:201)
            if score > best_score and score > ACCEPT_THRESHOLD:
                best_score, best_group = score, cand["group"]
        if best_group is not None:
            # committed immediately → visible to later rows (transitivity)
            row["group"] = best_group
            row["status"] = "auto_grouped"
            row["grouping_confidence"] = min(best_score, 1.0)
        else:
            row["status"] = "invalid_group" if row["status"] == "invalid_group" else "ungrouped"
            row["grouping_confidence"] = 0.0
    return pd.DataFrame(
        [{k: r[k] for k in ("id", "ts_ms", "group", "status", "grouping_confidence")} for r in rows]
    )


def with_time_clusters(
    df: DataFrame,
    ts_col: str = "ts_ms",
    key_cols: list[str] | None = None,
    window_ms: int = TIME_WINDOW_MS,
) -> DataFrame:
    """Connected components of consecutive-gap ≤ window — session clusters.

    One window pass: new-cluster flag via lag(), then a running sum.
    Clusters are independent for the grouping fold (see module docstring).

    SCALE HAZARD: with ``key_cols=[]`` the window is unpartitioned — one
    task sorts everything (reference-semantics-only, for small snapshot
    inputs).  At scale pass ``key_cols`` (conv_id / user_id analog); the
    registered ``auto_group_transitive`` entry uses the keyed form.
    """
    key_cols = key_cols or []
    w = (Window.partitionBy(*key_cols) if key_cols else Window.partitionBy()).orderBy(ts_col, "id")
    gap = F.col(ts_col) - F.lag(ts_col).over(w)
    is_new = F.when(gap.isNull() | (gap > window_ms), 1).otherwise(0)
    return df.withColumn("__cluster", F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)))


def _fold_keyed_batch(pdf: pd.DataFrame, key_cols: list[str]) -> pd.DataFrame:
    """Fold every key's rows inside one bucket (deterministic key order).

    ``dropna=False``: null keys form a group of their own, matching
    Spark's groupBy semantics — pandas' default would silently drop those
    rows (and an all-null bucket would make pd.concat crash on []).
    """
    outs = [
        sequential_group_cluster(g)
        for _, g in pdf.groupby(key_cols, sort=True, dropna=False)
    ]
    return pd.concat(outs, ignore_index=True)


def auto_group(
    df: DataFrame,
    key_cols: list[str] | None = None,
    fold_buckets: int | None = None,
) -> DataFrame:
    """Distributed auto-grouping via applyInPandas(sequential fold).

    Input columns: id, ts_ms, group, status, desc, colors; output: id,
    ts_ms, group, status, grouping_confidence.

    Partitioning correctness: the fold only pairs rows within ±window, and
    rows of *different* session clusters are always further apart than the
    window — so folding any union of whole clusters (sorted by ts) equals
    folding each cluster separately equals the reference's global
    sequential pass.  Two physical shapes follow:

    - with ``key_cols`` (e.g. conv_id): keys are hashed into
      ``fold_buckets`` batches and each key folds independently inside
      its bucket — exact, and the batching amortizes per-group Arrow
      overhead over many small keys.
    - global (reference semantics, no keys): session-cluster first, then
      batch whole clusters via pmod(cluster, buckets).

    Physical note: the bucket column is pinned with an explicit
    ``repartition(n, bucket)`` — a user repartition AQE will not coalesce.
    Letting AQE size this stage by shuffle *bytes* collapses the
    Python-heavy fold to one task (pandas work is CPU-bound per row, not
    byte-bound), serializing the whole operator.
    """
    spark = df.sparkSession
    n = fold_buckets or max(spark.sparkContext.defaultParallelism * 4, 16)
    if key_cols:
        bucketed = df.withColumn(
            "__bucket", F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(n))
        )
        return (
            bucketed.repartition(n, "__bucket")
            .groupBy("__bucket")
            .applyInPandas(
                lambda pdf: _fold_keyed_batch(pdf, key_cols), schema=GROUPED_SCHEMA
            )
        )
    clustered = with_time_clusters(df)
    bucketed = clustered.withColumn(
        "__bucket", F.pmod(F.col("__cluster"), F.lit(n))
    )
    return (
        bucketed.repartition(n, "__bucket")
        .groupBy("__bucket")
        .applyInPandas(lambda pdf: sequential_group_cluster(pdf), schema=GROUPED_SCHEMA)
    )
