"""Ordinal naming + duplicate resolution as window operators.

Set-based re-expressions of the reference's per-row loops:

- W1 webapp rule (upload.ts:679-708): first group member bare, member i>0
  suffixed ``_{i+1}``, ordered by created-at; N+1 ``findMany`` per image
  becomes ONE window.
- A1 notebook rule (rename_photos.ipynb cell 4): every member numbered
  from ``_1``; extension = first-dot.
- A2 resolveDuplicateNames (upload.ts:747-825): group by name, keep the
  earliest, regenerate the rest — a window + recompute instead of a
  probe-loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sanitize_filename_col(col: F.Column) -> F.Column:
    """upload.ts:524-537 as a chained column expression (JVM-side)."""
    s = F.trim(col)
    s = F.regexp_replace(s, r"\s+", "_")
    s = F.regexp_replace(s, r'[<>:"/\\|?*]', "")
    s = F.regexp_replace(s, r"_+", "_")
    s = F.regexp_replace(s, r"^_+|_+$", "")
    return F.when(s == "", "untitled").otherwise(s)


def ext_last_dot_col(col: F.Column) -> F.Column:
    """Node path.extname: '.ext' for a trailing component, '' otherwise."""
    return F.regexp_extract(col, r"[^/]*?[^/.](\.[^./]*)$", 1)


def ext_first_dot_col(col: F.Column) -> F.Column:
    """Notebook rule: everything after the FIRST dot, default 'jpg'."""
    e = F.regexp_extract(col, r"^[^.]*\.(.+)$", 1)
    return F.when(e == "", "jpg").otherwise(e)


def webapp_ordinal_names(
    df: DataFrame,
    group_col: str = "group",
    order_cols: list[str] | None = None,
    original_col: str = "original_name",
    out_col: str = "new_name",
) -> DataFrame:
    order_cols = order_cols or ["created_at", "id"]
    w = Window.partitionBy(group_col).orderBy(*[F.col(c) for c in order_cols])
    rn = F.row_number().over(w)
    name = F.concat(
        sanitize_filename_col(F.col(group_col)),
        F.when(rn > 1, F.concat(F.lit("_"), rn.cast("string"))).otherwise(F.lit("")),
        ext_last_dot_col(F.col(original_col)),
    )
    return df.withColumn(out_col, name)


def notebook_ordinal_names(
    df: DataFrame,
    group_col: str = "group",
    order_cols: list[str] | None = None,
    original_col: str = "original_name",
    out_col: str = "new_name",
) -> DataFrame:
    order_cols = order_cols or ["__row_order"]
    w = Window.partitionBy(group_col).orderBy(*[F.col(c) for c in order_cols])
    rn = F.row_number().over(w)
    name = F.concat(
        F.col(group_col), F.lit("_"), rn.cast("string"),
        F.lit("."), ext_first_dot_col(F.col(original_col)),
    )
    return df.withColumn(out_col, name)


def find_duplicate_names(df: DataFrame, name_col: str = "new_name") -> DataFrame:
    """A2 detection half: names held by more than one row."""
    return (
        df.filter(F.col(name_col).isNotNull() & (F.col(name_col) != ""))
        .groupBy(name_col)
        .agg(F.count(F.lit(1)).alias("dup_count"))
        .filter(F.col("dup_count") > 1)
    )


def resolve_duplicate_names(
    df: DataFrame,
    name_col: str = "new_name",
    created_col: str = "created_at",
    id_col: str = "id",
    group_col: str = "group",
    original_col: str = "original_name",
) -> DataFrame:
    """A2 resolution half, set-based: keep earliest per duplicate name,
    regenerate the rest with the webapp rule appended *after* existing
    members (the reference regenerates via generateSmartFilename, which
    indexes by created-at within the group — upload.ts:795-801)."""
    w_name = Window.partitionBy(name_col).orderBy(F.col(created_col), F.col(id_col))
    named = F.col(name_col).isNotNull() & (F.col(name_col) != "")
    # null/empty names are not duplicates of each other (upload.ts:758-764)
    flagged = df.withColumn(
        "__dup_rank", F.when(named, F.row_number().over(w_name)).otherwise(F.lit(1))
    )
    w_group = Window.partitionBy(group_col).orderBy(F.col(created_col), F.col(id_col))
    regenerated = F.concat(
        sanitize_filename_col(F.coalesce(F.col(group_col), F.lit("ungrouped"))),
        F.when(F.row_number().over(w_group) > 1,
               F.concat(F.lit("_"), F.row_number().over(w_group).cast("string"))
               ).otherwise(F.lit("")),
        ext_last_dot_col(F.col(original_col)),
    )
    return flagged.withColumn(
        name_col,
        F.when(F.col("__dup_rank") > 1, regenerated).otherwise(F.col(name_col)),
    ).drop("__dup_rank")
