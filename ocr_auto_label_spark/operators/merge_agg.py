"""Order-preserving group merges (SURVEY.md A6/U5).

The notebook's ``extend_unique`` (grouped_img_desc.ipynb cell 7) builds a
per-group union of list fields that is **unique and first-seen-ordered**,
and ``merge`` takes the first non-empty scalar.  ``collect_list`` under a
plain groupBy has nondeterministic order across partitions, so the exact
semantics need a *pinned* order: collect over an ordered window frame
(deterministic), keep one row per group, dedupe with ``array_distinct``
(which keeps the first occurrence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def ordered_distinct_union(
    df: DataFrame,
    group_col: str,
    item_col: str,
    order_cols: list[str],
) -> DataFrame:
    """Per group: unique items in first-seen order under ``order_cols``.

    Output: (group_col, items array).  One shuffle (the window sort);
    ``array_distinct`` preserves the first occurrence of each element, so
    the result is byte-deterministic under any input partitioning.
    """
    w = (
        Window.partitionBy(group_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    rn = F.row_number().over(Window.partitionBy(group_col).orderBy(*order_cols))
    return (
        df.withColumn("__items", F.array_distinct(F.collect_list(item_col).over(w)))
        .withColumn("__rn", rn)
        .filter(F.col("__rn") == 1)
        .select(F.col(group_col), F.col("__items").alias("items"))
    )


def first_non_null(
    df: DataFrame,
    group_col: str,
    value_col: str,
    order_cols: list[str],
) -> DataFrame:
    """Per group: first non-null/non-empty value under ``order_cols`` —
    the notebook ``merge`` rule for scalar fields."""
    w = Window.partitionBy(group_col).orderBy(*order_cols)
    nonempty = F.when(
        F.col(value_col).isNotNull() & (F.trim(F.col(value_col)) != ""),
        F.col(value_col),
    )
    picked = F.first(nonempty, ignorenulls=True).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    rn = F.row_number().over(w)
    return (
        df.withColumn("__v", picked)
        .withColumn("__rn", rn)
        .filter(F.col("__rn") == 1)
        .select(F.col(group_col), F.col("__v").alias(value_col))
    )
