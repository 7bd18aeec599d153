"""Custom stateful streaming operator (SURVEY.md §2.9) —
``applyInPandasWithState`` running per-conversation extraction totals.

The reference's incremental status pushes (per-item SSE updates,
upload.ts:966-1007) carry running per-session progress; stream-native
Spark expresses that as keyed state updated per microbatch: for each
``conv_id`` we keep (turns_seen, turns_with_label) across ALL batches and
emit the updated totals whenever the conversation receives new turns.

State is Arrow-batched grouped-map Python (FlatMapGroupsInPandasWithState
in the plan — no per-row Python), checkpointed by Structured Streaming's
state store, so a restart resumes the totals exactly — the streaming twin
of the batch lineage table.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ocr_auto_label_spark.plans.extraction_pipeline import extract_turns
from ocr_auto_label_spark.streaming.pipeline import read_transcript_stream

OUTPUT_SCHEMA = "conv_id string, turns bigint, turns_with_label bigint"
STATE_SCHEMA = "turns bigint, turns_with_label bigint"


def _update_conv_totals(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    turns, hits = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        turns += len(pdf)
        hits += int(sum(1 for c in pdf["candidates"] if c is not None and len(c) > 0))
    state.update((turns, hits))
    yield pd.DataFrame(
        {"conv_id": [key[0]], "turns": [turns], "turns_with_label": [hits]}
    )


def conv_running_totals(
    spark: SparkSession, input_path: str, max_files_per_trigger: int = 8
) -> DataFrame:
    """Streaming DF of running per-conv totals (update per microbatch)."""
    turns = extract_turns(
        read_transcript_stream(spark, input_path, max_files_per_trigger)
    )
    return (
        turns.select("conv_id", "candidates")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _update_conv_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_conv_running_totals(
    spark: SparkSession,
    input_path: str,
    checkpoint_path: str,
    query_name: str = "conv_totals",
    max_files_per_trigger: int = 8,
):
    """Drain everything present (availableNow) into an in-memory table of
    per-batch updates; the LAST update per conv_id is the final total."""
    return (
        conv_running_totals(spark, input_path, max_files_per_trigger)
        .writeStream.format("memory")
        .queryName(query_name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
