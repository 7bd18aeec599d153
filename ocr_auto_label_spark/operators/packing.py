"""Sequence packing: assign documents to fixed-token-budget packs.

LLM pretraining consumes documents as packed fixed-length sequences:
concatenate the corpus in a deterministic order and cut every ``budget``
tokens; each document belongs to the pack where it *starts*.  This module
computes that assignment relationally:

- **Deterministic order**: ``(xxhash64(id), id)`` — the same engine-stable
  hash family as the split/mixture operators, so the packing is identical
  across runs, partitionings, and engines (and is a cheap corpus shuffle:
  hash order ≈ random order, which is what training wants).
- **Sharded, not global**: a global running sum would serialize the
  corpus through one partition.  Real pipelines pack per worker; here
  each ``shard = pmod(xxhash64(id), n_shards)`` packs independently —
  one window shuffle keyed by shard, embarrassingly parallel, and the
  pack key is ``(shard, pack_id)``.
- **Pure integer math**: ``pack_id = start_offset // budget`` with
  ``start_offset`` the running token count before the doc — so a DuckDB
  oracle reproduces every assignment exactly.

A document longer than ``budget`` still gets the pack where it starts
(training cuts it across pack boundaries downstream); packs therefore
hold ≥1 document and their pre-overflow totals are < budget + the last
doc's length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ocr_auto_label_spark.operators.sampling import checked_id_hash
from ocr_auto_label_spark.operators.textstats import token_count


def pack_sequences(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 8,
    within_cols: list[str] | None = None,
) -> DataFrame:
    """Add ``(shard, n_tokens, start_offset, pack_id)`` per document.

    ``start_offset`` is the cumulative whitespace-token count of all
    earlier docs in the shard's ``(xxhash64(id), id)`` order;
    ``pack_id = start_offset // budget``.

    ``within_cols`` adds boundary columns to the pack partitioning — a
    pack never mixes rows across them.  The canonical use is
    ``within_cols=["split"]`` after ``deterministic_split``: training
    packs must never contain eval documents, so each (split, shard)
    stream packs independently.
    """
    if budget <= 0 or n_shards <= 0:
        raise ValueError("pack_sequences: budget and n_shards must be positive")
    within = list(within_cols or [])
    hash_col = checked_id_hash(F.col(id_col))
    w = (
        Window.partitionBy(*within, "shard")
        .orderBy(hash_col, id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_tokens = df.select(
        id_col,
        *within,
        F.pmod(hash_col, F.lit(n_shards)).cast("long").alias("shard"),
        # NULL text packs as 0 tokens (explicitly — a bare token_count
        # would propagate NULL through the running sum and leave the row
        # with pack_id NULL, silently outside every pack)
        F.coalesce(token_count(F.col(text_col)), F.lit(0))
        .cast("long").alias("n_tokens"),
    )
    return with_tokens.select(
        id_col,
        *within,
        "shard",
        "n_tokens",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start_offset"),
    ).withColumn(
        # integral `div`, not double division + cast: offsets can exceed
        # 2^53 at corpus scale, where double rounding would corrupt ids
        "pack_id", F.expr(f"start_offset div {budget}")
    )
