"""The complete E1 lifecycle (SURVEY.md §3 E1) as one composed plan.

Reference flow (upload.ts:711-741): extract per item → decision
(upload.ts:881-902: valid code → 'extracted' + group + smart name; no
code → 'pending_grouping') → resolveDuplicateNames → autoGroupImages →
resolveDuplicateNames.  Here:

  transcripts
    → extraction (Arrow UDF, rank-1 per turn)                 [narrow]
    → status decision + group assignment (column exprs)       [narrow]
    → webapp ordinal naming (W1 window per group)             [1 shuffle]
    → duplicate resolution (A2 windows)                       [1 shuffle]
    → per-conv transitive auto-grouping (applyInPandas)       [1 shuffle]
    → final re-naming over the merged state                   [1 shuffle]

Four shuffles total, each on a different key — at 10^12 turns each is a
plain hash partition; no driver-side loops, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ocr_auto_label_spark.operators.grouping import auto_group
from ocr_auto_label_spark.operators.naming import (
    resolve_duplicate_names,
    webapp_ordinal_names,
)
from ocr_auto_label_spark.plans.extraction_pipeline import best_labels


def decide_status(turns: DataFrame) -> DataFrame:
    """upload.ts:881-902 decision.  Our extraction only emits grammar-valid
    labels (invalid tokens are classified noise), so the reference's
    code-but-invalid branch ('invalid_group') is unreachable by
    construction; turns split into extracted vs pending_grouping."""
    return turns.select(
        F.concat_ws("#", "conv_id", F.col("turn_idx").cast("string")).alias("id"),
        "conv_id",
        "turn_idx",
        (F.col("ts").cast("timestamp").cast("long") * 1000).alias("ts_ms"),
        F.col("ts").alias("created_at"),
        F.col("label").alias("group"),
        F.when(F.col("label").isNotNull(), F.lit("extracted"))
        .otherwise(F.lit("pending_grouping")).alias("status"),
        F.when(F.col("label").isNotNull(), F.lit(1.0)).alias("grouping_confidence"),
        # grouping signals: the turn's normalized main content stands in for
        # the reference's objectDesc (first words ≈ an object description)
        F.concat_ws(" ", F.slice(F.split(F.coalesce("extracted_text", F.lit("")), " "), 1, 4)).alias("desc"),
        F.array().cast("array<string>").alias("colors"),
        F.concat_ws("_", "conv_id", F.col("turn_idx").cast("string")).alias("__stem"),
        F.concat(F.concat_ws("_", "conv_id", F.col("turn_idx").cast("string")),
                 F.lit(".txt")).alias("original_name"),
    )


def run_full_pipeline(transcripts: DataFrame) -> DataFrame:
    """transcripts → final labeled/named/grouped table.

    Output: id, conv_id, turn_idx, group, status, grouping_confidence,
    new_name (null for still-ungrouped rows).
    """
    turns = decide_status(best_labels(transcripts))

    # W1 names for extracted rows (grouped rows only get names)
    named = webapp_ordinal_names(
        turns, group_col="group", order_cols=["created_at", "id"],
        original_col="original_name", out_col="new_name",
    ).withColumn(
        "new_name", F.when(F.col("group").isNotNull(), F.col("new_name"))
    )

    # A2: duplicate resolution (earliest keeps, rest regenerate)
    resolved = resolve_duplicate_names(
        named, name_col="new_name", created_col="created_at",
        id_col="id", group_col="group", original_col="original_name",
    )

    # E1 stage 6: per-conversation transitive auto-grouping
    group_input = resolved.select(
        "id", "conv_id", "ts_ms", "group", "status", "desc", "colors",
        "grouping_confidence",
    )
    grouped = auto_group(group_input, key_cols=["conv_id"]).select(
        "id",
        F.col("group").alias("final_group"),
        F.col("status").alias("final_status"),
        F.col("grouping_confidence").alias("final_confidence"),
    )

    merged = resolved.join(grouped, "id", "left").select(
        "id", "conv_id", "turn_idx", "created_at", "original_name",
        F.coalesce("final_group", "group").alias("group"),
        F.coalesce("final_status", "status").alias("status"),
        F.coalesce("final_confidence", "grouping_confidence").alias("grouping_confidence"),
    )

    # final naming pass over the merged state (covers newly auto-grouped
    # rows), then one more duplicate sweep — mirrors the reference's
    # final resolveDuplicateNames (upload.ts:735)
    renamed = webapp_ordinal_names(
        merged, group_col="group", order_cols=["created_at", "id"],
        original_col="original_name", out_col="new_name",
    ).withColumn(
        "new_name", F.when(F.col("group").isNotNull(), F.col("new_name"))
    )
    final = resolve_duplicate_names(
        renamed, name_col="new_name", created_col="created_at",
        id_col="id", group_col="group", original_col="original_name",
    )
    return final.select(
        "id", "conv_id", "turn_idx", "group", "status",
        "grouping_confidence", "new_name",
    )
