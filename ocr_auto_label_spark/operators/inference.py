"""Single-pass group inference (SURVEY.md J2/W4/W5/X8/X10/X11).

The reference (groupInference.ts:289-445) loads an immutable snapshot
ordered by originalName, and for each unlabeled row scans its ±9-row
neighborhood for labeled rows matching BOTH the ≥2-meaningful-words
description rule and the color-family rule, inheriting the most recent
match's group at confidence 0.7.  Unlike the E1 auto-grouping, inferred
groups are NOT visible within the pass (snapshot semantics) — which is
exactly a window operator:

    collect_list(struct(...)) OVER (ORDER BY original_name
                                    ROWS BETWEEN 9 PRECEDING AND 9 FOLLOWING)

then one Arrow grouped projection applying the pure-Python matching core
(labelcore.inference) to each row's ≤19 neighbors.  No join, one shuffle
for the window sort.  ``key_cols`` (e.g. conv_id) bound the window per
group at scale; the reference's global variant is key_cols=[].
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from ocr_auto_label_spark.labelcore.inference import infer_group

PROXIMITY = 9  # groupInference.ts:359
INFERRED_CONFIDENCE = 0.7  # groupInference.ts:428


@pandas_udf(StringType())
def _infer_udf(desc: pd.Series, colors: pd.Series, neighbors: pd.Series) -> pd.Series:
    out = []
    for d, c, ns in zip(desc, colors, neighbors):
        target_desc = None if d is None or (isinstance(d, float) and pd.isna(d)) else d
        target_colors = None if c is None else list(c)
        neigh = [
            {
                "group": n["group"],
                "desc": n["desc"],
                "colors": None if n["colors"] is None else list(n["colors"]),
                "ts_ms": n["ts_ms"],
            }
            for n in (ns if ns is not None else [])
        ]
        out.append(infer_group(target_desc, target_colors, neigh))
    return pd.Series(out, dtype=object)


def infer_groups(
    df: DataFrame,
    key_cols: list[str] | None = None,
    order_col: str = "original_name",
) -> DataFrame:
    """Input columns: id, original_name, ts_ms, group, desc,
    colors (array<string> of hex).  Output: input + inferred_group +
    grouping_confidence (0.7 where inferred, null otherwise).

    SCALE HAZARD: ``key_cols=[]`` (the reference's exact snapshot
    semantics, groupInference.ts:354-366 — one global ±9-row ordering)
    uses an unpartitioned window: ONE task sorts the whole input.  That
    form is reference-semantics-only for small snapshots; at scale pass
    ``key_cols`` (e.g. the source/ingest-batch column) so every key's
    window sorts independently — this is the registered default
    (``infer_groups_keyed`` in entry_queries.py).
    """
    key_cols = key_cols or []
    w = (
        (Window.partitionBy(*key_cols) if key_cols else Window.partitionBy())
        .orderBy(order_col, "id")
        .rowsBetween(-PROXIMITY, PROXIMITY)
    )
    neighbor = F.struct(
        F.col("id").alias("nid"), F.col("group"), F.col("desc"),
        F.col("colors"), F.col("ts_ms"),
    )
    with_neigh = df.withColumn(
        "__neighbors",
        F.filter(
            F.collect_list(neighbor).over(w),
            lambda n: n["nid"] != F.col("id"),  # exclude self (ts:366)
        ),
    )
    unlabeled = F.col("group").isNull() | (F.trim(F.col("group")) == "")
    inferred = F.when(unlabeled, _infer_udf("desc", "colors", "__neighbors"))
    return (
        with_neigh.withColumn("inferred_group", inferred)
        .withColumn(
            "grouping_confidence",
            F.when(F.col("inferred_group").isNotNull(), F.lit(INFERRED_CONFIDENCE)),
        )
        .drop("__neighbors")
    )
