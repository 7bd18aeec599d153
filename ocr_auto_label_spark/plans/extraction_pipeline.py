"""The flagship plan: transcripts → per-turn extracted text + ranked labels.

Spark-first design notes (scale rationale, 100TB / 10^12 turns):

- Extraction is **embarrassingly parallel per turn**: one Arrow pandas UDF
  projects (text, tool) → struct.  No shuffle is needed for correctness of
  extraction or ranking (rank is computed inside the UDF per turn), so the
  narrow path is scan → project → write.
- **Skew**: hot conversations don't matter to the narrow path (rows, not
  conversations, are the unit), but input files may be clustered by
  conv_id.  ``salted_repartition`` spreads any hot conversation across the
  cluster with a salt on (conv_id, turn_idx) — the analog of the
  north_star's salted repartitioning — used before wide downstream ops.
- **Stable turn ordering** (W2) is an output-contract sort, applied at
  compare/export time, not a mid-plan barrier.
- **Lineage/resume** lives in ``lineage.py``: inputs are bucketed by
  ``pmod(xxhash64(conv_id), n_buckets)``; each completed bucket writes a
  lineage row; a restart anti-joins completed buckets and dynamic
  partition overwrite makes per-bucket output writes idempotent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ocr_auto_label_spark.functions.udfs import extract_turn_udf

# Columns of the flat (exploded) candidate output
CANDIDATE_COLS = [
    "label", "raw", "begin", "end", "source_col", "pattern_id",
    "corrections", "canonical", "canonical_sim", "confidence", "rank",
]

# The flagship entry's public projection (shared by the registry entry,
# the bench harness, and the SQL twin's output contract)
FLAGSHIP_COLS = [
    "conv_id", "turn_idx", "extracted_text", "label", "raw", "begin",
    "end", "source_col", "pattern_id", "corrections", "confidence", "rank",
]


def salted_repartition(df: DataFrame, num_partitions: int, salt_buckets: int = 16) -> DataFrame:
    """Spread hot conv_ids: repartition on (conv_id, salt) where
    salt = pmod(xxhash64(conv_id, turn_idx), salt_buckets).  Per-turn ops
    stay correct under any partitioning; this only balances work."""
    salt = F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(salt_buckets))
    return df.repartition(num_partitions, F.col("conv_id"), salt)


def extract_turns(df: DataFrame) -> DataFrame:
    """One row per turn: input columns + extracted_text + candidates array.

    Narrow (no shuffle): scan → ArrowEvalPython project.
    """
    return (
        df.withColumn("__x", extract_turn_udf(F.col("text"), F.col("tool")))
        .withColumn("extracted_text", F.col("__x.extracted_text"))
        .withColumn("candidates", F.col("__x.candidates"))
        .drop("__x")
    )


def extract_candidates_flat(df: DataFrame) -> DataFrame:
    """One row per (turn, candidate), span-level — the golden-table shape
    (FIXTURES.md §3).  Turns with no candidate keep a null-label row."""
    turns = extract_turns(df)
    exploded = turns.withColumn("c", F.explode_outer("candidates"))
    return exploded.select(
        "conv_id", "turn_idx", "role", "ts", "extracted_text",
        *[F.col(f"c.{name}").alias(name) for name in CANDIDATE_COLS],
    )


def best_labels(df: DataFrame) -> DataFrame:
    """Per-turn winner (rank 1) — analog of the reference's accepted code
    (upload.ts:881-902 decision step)."""
    flat = extract_candidates_flat(df)
    return flat.filter((F.col("rank") == 1) | F.col("rank").isNull())


def ordered_output(df: DataFrame) -> DataFrame:
    """Stable turn ordering (W2): conv_id, turn_idx, ts tiebreaker —
    the export/compare contract (images.ts:717-719 analog)."""
    return df.orderBy("conv_id", "turn_idx", "ts")
