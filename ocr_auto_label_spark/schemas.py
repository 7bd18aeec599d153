"""Fixed StructTypes — the engine's data model in one module.

Replaces the reference's Prisma-migrated SQLite schema
(backend/prisma/schema.prisma:13-45) with declared Spark schemas; nested
types are native (ArrayType/StructType), not JSON-in-string.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Primary input (BASELINE.json input_hint)
TRANSCRIPT_SCHEMA = StructType([
    StructField("conv_id", StringType()),
    StructField("turn_idx", IntegerType()),
    StructField("role", StringType()),
    StructField("text", StringType()),
    StructField("tool", StringType()),
    StructField("ts", TimestampType()),
])

# One extraction candidate (analog of GeminiResult, gemini.ts:6-12, made
# span-aware and deterministic)
CANDIDATE_SCHEMA = StructType([
    StructField("label", StringType()),
    StructField("raw", StringType()),
    StructField("begin", IntegerType()),
    StructField("end", IntegerType()),
    StructField("source_col", StringType()),
    StructField("pattern_id", StringType()),
    StructField("corrections", IntegerType()),
    StructField("canonical", StringType()),
    StructField("canonical_sim", DoubleType()),
    StructField("confidence", DoubleType()),
    StructField("rank", IntegerType()),
])

# Per-turn extraction UDF output
EXTRACT_RESULT_SCHEMA = StructType([
    StructField("extracted_text", StringType()),
    StructField("candidates", ArrayType(CANDIDATE_SCHEMA)),
])

# Canonical label dimension (broadcast side of J5/J6)
CANONICAL_SCHEMA = StructType([
    StructField("label", StringType()),
    StructField("pattern_id", StringType()),
])

# Per-partition lineage/checkpoint record (north_rule)
LINEAGE_SCHEMA = StructType([
    StructField("run_id", StringType()),
    StructField("part_bucket", IntegerType()),
    StructField("row_count", LongType()),
    StructField("turns_with_label", LongType()),
    StructField("candidate_count", LongType()),
    StructField("hit_rate", DoubleType()),
    StructField("checksum", LongType()),
    StructField("status", StringType()),
])
