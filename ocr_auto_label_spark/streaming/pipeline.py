"""Structured Streaming analog of the batch pipeline (SURVEY.md §2.9).

The reference is incremental/evented (per-item status pushes over SSE,
bounded-concurrency queues — upload.ts:711-741, 966-1007); stream-native
Spark replaces all of that:

- incremental ingest = ``readStream`` with ``availableNow`` (process all
  files present, then stop — the batch/streaming duality of S1/S2),
- the same Arrow extraction UDF runs unchanged on the stream,
- ±2-minute proximity clustering (grouping.ts:123-125) becomes a
  watermarked session window,
- per-item status pushes become per-microbatch progress metrics.

Checkpointing is Spark-native here (offsets + sink commit log), which is
the streaming counterpart of the batch lineage table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from ocr_auto_label_spark.plans.extraction_pipeline import extract_turns
from ocr_auto_label_spark.schemas import TRANSCRIPT_SCHEMA


def read_transcript_stream(
    spark: SparkSession, input_path: str, max_files_per_trigger: int = 8
) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
    )


def stream_extraction(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Incremental extraction: new transcript files → extracted turns.

    ``availableNow`` drains everything currently present then stops —
    the idiomatic replacement for the reference's eager-vs-streamed ZIP
    scan duality (zipExtractor.ts:29-130 vs :161-269)."""
    turns = extract_turns(read_transcript_stream(spark, input_path))
    writer = (
        turns.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_label_counts(
    spark: SparkSession,
    input_path: str,
    window: str = "2 minutes",
    watermark: str = "4 minutes",
) -> DataFrame:
    """Watermarked tumbling-window label-hit counts — the streaming analog
    of the ±2-minute proximity clustering (grouping.ts:123-125) plus the
    grouped-success tally (grouping.ts:114)."""
    turns = extract_turns(read_transcript_stream(spark, input_path))
    return (
        turns.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("conv_id"))
        .agg(
            F.count(F.lit(1)).alias("turns"),
            F.sum((F.size("candidates") > 0).cast("long")).alias("turns_with_label"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "conv_id", "turns", "turns_with_label",
        )
    )


def run_windowed_counts(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
) -> StreamingQuery:
    """Append-mode semantics: only windows the watermark has finalized are
    written — windows newer than max(ts) − watermark stay in the state
    store when the availableNow drain stops (they'd flush on the next
    incremental run as more data arrives).  This is the deliberate
    late-data contract, not an optimization: a window is emitted exactly
    once, complete.  Consumers needing provisional tail windows should use
    update mode into a mutable sink (see streaming/stateful.py)."""
    counts = windowed_label_counts(spark, input_path)
    return (
        counts.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def deduped_transcript_stream(
    spark: SparkSession,
    input_path: str,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Ingest-time exact dedup with BOUNDED state: drop repeated payloads
    (same conv_id/turn content hash) arriving within the watermark
    horizon — the streaming counterpart of the batch exact-dedup
    operator, and the state-management shape that survives an unbounded
    stream: ``dropDuplicatesWithinWatermark`` evicts seen-keys older than
    the watermark, so state is O(arrival rate × horizon), not O(stream
    length).  Plain ``dropDuplicates`` on a stream would keep every key
    forever — the 10¹²-turn anti-pattern."""
    stream = read_transcript_stream(spark, input_path)
    keyed = stream.withColumn(
        "content_hash", F.md5(F.concat_ws("\x1f", "conv_id", "turn_idx", "text"))
    )
    return keyed.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["content_hash"]
    )


def run_deduped_ingest(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    watermark: str = "10 minutes",
) -> StreamingQuery:
    """availableNow drain of the deduped ingest → parquet."""
    deduped = deduped_transcript_stream(spark, input_path, watermark)
    return (
        deduped.drop("content_hash")
        .writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def run_term_sketch(
    spark: SparkSession,
    input_path: str,
    checkpoint_path: str,
    query_name: str,
) -> StreamingQuery:
    """Streaming count-min sketch over the transcript text stream — the
    sketch module's "same operator serves batch and streaming" claim
    made literal: ``operators.sketch.cms_build`` runs UNCHANGED on the
    stream (explode + aggregate are stream-native), and complete-mode
    output is safe precisely because the sketch is constant-size — the
    state and the emitted table are both ≤ depth×width cells no matter
    how long the stream runs.  An availableNow drain's final grid is
    bit-identical to the batch sketch over the same files (cell sums
    are order-independent integers)."""
    from ocr_auto_label_spark.operators.sketch import cms_build

    sketch = cms_build(
        read_transcript_stream(spark, input_path).select("text")
    )
    return (
        sketch.writeStream.format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )


def turn_tool_interval_join(
    spark: SparkSession,
    input_path: str,
    watermark: str = "120 minutes",
    horizon_minutes: int = 5,
    max_files_per_trigger: int = 8,
) -> DataFrame:
    """Watermarked STREAM-STREAM interval join — the bounded-state
    two-stream primitive (the last §2.9 Structured Streaming capability
    the suite exercises): the turn stream inner-joins the tool-event
    stream (tool-bearing turns of the same ingest) on conv_id where the
    tool event lands within ``horizon_minutes`` AFTER the turn.

    Why the shape is scale-safe: BOTH sides carry a watermark and the
    join predicate carries a closed event-time range, which is exactly
    what lets Spark expire buffered rows — left state is droppable once
    the right watermark passes ``ts + horizon``, right state once the
    left watermark passes ``tool_ts``.  Without either piece the join
    must buffer one side forever (state O(stream length) — the
    classic stream-join mistake this function exists to document).

    Drained (availableNow) results equal the batch join over the same
    files when the watermark covers the ingest's cross-file event-time
    spread (pytest identity in tests/test_streaming_io.py — the same
    drain-vs-batch contract every other streaming leg uses)."""
    base = read_transcript_stream(spark, input_path, max_files_per_trigger)
    left = base.select("conv_id", "turn_idx", "ts").withWatermark(
        "ts", watermark
    )
    right = (
        base.filter(F.col("tool").isNotNull())
        .select(
            F.col("conv_id").alias("tool_conv"),
            F.col("ts").alias("tool_ts"),
        )
        .withWatermark("tool_ts", watermark)
    )
    cond = (
        (F.col("conv_id") == F.col("tool_conv"))
        & (F.col("tool_ts") >= F.col("ts"))
        & (
            F.col("tool_ts")
            <= F.col("ts") + F.expr(f"INTERVAL {int(horizon_minutes)} MINUTES")
        )
    )
    return left.join(right, cond, "inner").select(
        "conv_id", "turn_idx", "ts", "tool_ts"
    )


def run_turn_tool_join(
    spark: SparkSession,
    input_path: str,
    checkpoint_path: str,
    query_name: str,
    watermark: str = "120 minutes",
    horizon_minutes: int = 5,
) -> StreamingQuery:
    """availableNow drain of the stream-stream interval join into a
    memory sink (append mode — inner stream-stream joins emit exactly
    the matched rows)."""
    joined = turn_tool_interval_join(
        spark, input_path, watermark, horizon_minutes
    )
    return (
        joined.writeStream.format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
