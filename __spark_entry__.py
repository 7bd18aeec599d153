"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship extraction over the sf0.001 tables +
a deterministic synthetic transcript batch; ``queries()`` /
``oracle_sql()`` expose every implemented operator from SURVEY.md §2
(registry in ``ocr_auto_label_spark/entry_queries.py``).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: label extraction (grammar + confusion correction + fuzzy
    canonical match + confidence ranking) over transcript turns.

    Input = the sf0.001 ``documents`` table mapped to the transcript shape
    (one turn per document) unioned with a deterministic synthetic
    transcript batch carrying embedded/corrupted labels, so the result
    exercises both driver data and the full extraction surface.
    """
    from pyspark.sql import functions as F

    from ocr_auto_label_spark.datagen import transcripts_parquet
    from ocr_auto_label_spark.plans.extraction_pipeline import (
        extract_candidates_flat,
        ordered_output,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    doc_turns = docs.select(
        F.concat(F.lit("doc-"), F.col("source")).alias("conv_id"),
        F.col("doc_id").cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.col("text"),
        F.lit(None).cast("string").alias("tool"),
        F.to_timestamp(F.lit("2026-01-01 00:00:00")).alias("ts"),
    )
    synth = spark.read.parquet(transcripts_parquet(2_000))
    turns = doc_turns.unionByName(synth)
    return ordered_output(extract_candidates_flat(turns))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from ocr_auto_label_spark.entry_queries import build_queries

    return build_queries()


def oracle_sql() -> dict[str, str]:
    from ocr_auto_label_spark.entry_queries import build_oracle_sql

    return build_oracle_sql()
