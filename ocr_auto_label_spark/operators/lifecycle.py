"""E2 composed lifecycle: group reassignment → re-index affected groups →
status recompute (reference: backend/src/routes/images.ts:387-455 PUT
handler + reindexGroup images.ts:39-59 + generateSmartFilename
upload.ts:62-120).

The reference mutates one row, then loops over BOTH the old and the new
group re-running generateSmartFilename per member (N+1 queries).  The
set-based re-expression:

1. apply the moves (a small broadcast dim joined on id),
2. derive the affected-group set = old groups of moved rows ∪ non-empty
   new groups (tiny — broadcast semi-join),
3. recompute webapp ordinal names with ONE window over ONLY the affected
   groups' rows; every other row keeps its existing name untouched
   (exactly reindexGroup's scope — unaffected groups keep stale names).

Status rules on the moved rows (images.ts:407-419):
- non-empty new group → grouping_confidence 1.0,
  status = isValidSampleCode(group) ? 'user_grouped' : 'invalid_group'
- empty/null new group → new_name '', grouping_confidence 0.0,
  status 'ungrouped'

At scale: moves are interactive-edit-sized (≪ data), so both joins
broadcast; the re-index window shuffles only the affected groups' rows —
O(affected), not O(table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ocr_auto_label_spark.functions.grammar_sql import pattern_id_column
from ocr_auto_label_spark.operators.naming import (
    ext_last_dot_col,
    sanitize_filename_col,
)


def apply_group_moves(
    df: DataFrame,
    moves: DataFrame,
    id_col: str = "id",
    group_col: str = "group",
    original_col: str = "original_name",
    order_cols: list[str] | None = None,
    name_col: str = "new_name",
) -> DataFrame:
    """Apply ``moves(id, new_group)`` to ``df`` with E2 semantics.

    ``new_group`` NULL or '' ungroups the row.  Returns ``df``'s columns
    with ``group``, ``status``, ``grouping_confidence`` and ``new_name``
    updated; rows in unaffected groups are byte-identical to the input.

    If ``moves`` carries an ``old_group`` column (the reference's PUT
    handler reads the row before updating, images.ts:399-404, so callers
    usually have it), the affected-group set is computed from the tiny
    moves frame alone — saving two full scans of ``df`` at table scale.
    Without it, old groups are derived via a broadcast join (semantics
    identical; asserted by tests/test_lifecycle.py).
    """
    order_cols = order_cols or ["created_at", id_col]
    moved = moves.select(
        F.col(id_col).alias("__mv_id"),
        F.col("new_group").alias("__mv_group"),
    )
    # moves must be one row per id (the reference PUT semantics are a
    # dict of id → group); a duplicate would fan rows out through the
    # left join and corrupt the output.  moves is interactive-edit-sized
    # by contract, so the eager uniqueness check is one tiny job.
    if moved.groupBy("__mv_id").count().filter("count > 1").limit(1).count():
        raise ValueError("apply_group_moves: moves contains duplicate ids")
    joined = df.join(
        F.broadcast(moved), F.col(id_col) == F.col("__mv_id"), "left"
    )
    was_moved = F.col("__mv_id").isNotNull()
    new_group_norm = F.when(
        F.trim(F.coalesce(F.col("__mv_group"), F.lit(""))) == "", F.lit(None)
    ).otherwise(F.col("__mv_group"))
    applied = joined.select(
        *[c for c in df.columns if c not in (group_col, "status", "grouping_confidence", name_col)],
        F.when(was_moved, new_group_norm).otherwise(F.col(group_col)).alias(group_col),
        F.when(
            was_moved & new_group_norm.isNotNull(),
            F.when(pattern_id_column(new_group_norm).isNotNull(), F.lit("user_grouped"))
            .otherwise(F.lit("invalid_group")),
        )
        .when(was_moved, F.lit("ungrouped"))
        .otherwise(F.col("status"))
        .alias("status"),
        F.when(was_moved & new_group_norm.isNotNull(), F.lit(1.0))
        .when(was_moved, F.lit(0.0))
        .otherwise(F.col("grouping_confidence"))
        .alias("grouping_confidence"),
        F.when(was_moved & new_group_norm.isNull(), F.lit(""))
        .otherwise(F.col(name_col))
        .alias(name_col),
        was_moved.alias("__was_moved"),
    )

    # affected groups: old groups of moved rows ∪ their non-empty new groups
    if "old_group" in moves.columns:
        old_groups = moves.select(F.col("old_group").alias("g"))
    else:
        old_groups = (
            df.join(F.broadcast(moved), F.col(id_col) == F.col("__mv_id"))
            .select(F.col(group_col).alias("g"))
        )
    new_groups = moved.select(
        F.when(F.trim(F.coalesce("__mv_group", F.lit(""))) == "", None)
        .otherwise(F.col("__mv_group")).alias("g")
    )
    affected = (
        old_groups.unionByName(new_groups)
        .filter(F.col("g").isNotNull() & (F.trim("g") != ""))
        .distinct()
    )

    in_affected = applied.join(
        F.broadcast(affected), applied[group_col] == affected["g"], "left_semi"
    )
    not_affected = applied.join(
        F.broadcast(affected), applied[group_col] == affected["g"], "left_anti"
    )

    # reindexGroup (images.ts:39-59): webapp ordinal rule over created-at
    w = Window.partitionBy(group_col).orderBy(*[F.col(c) for c in order_cols])
    rn = F.row_number().over(w)
    reindexed_name = F.concat(
        sanitize_filename_col(F.col(group_col)),
        F.when(rn > 1, F.concat(F.lit("_"), rn.cast("string"))).otherwise(F.lit("")),
        ext_last_dot_col(F.col(original_col)),
    )
    reindexed = in_affected.withColumn(name_col, reindexed_name)
    return reindexed.unionByName(not_affected).drop("__was_moved")
