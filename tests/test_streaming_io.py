"""Structured Streaming pipeline + CSV export sink."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from ocr_auto_label_spark.datagen import generate_transcripts
from ocr_auto_label_spark.io.sources import export_csv, read_csv_multi
from ocr_auto_label_spark.streaming.pipeline import run_windowed_counts, stream_extraction


@pytest.fixture()
def stream_input(tmp_path):
    d = str(tmp_path / "in")
    os.makedirs(d)
    pdf = generate_transcripts(400, seed=5)
    # two files → two ingest increments
    pdf.iloc[:200].to_parquet(f"{d}/part1.parquet", index=False)
    pdf.iloc[200:].to_parquet(f"{d}/part2.parquet", index=False)
    return d


def test_stream_extraction_available_now(spark, stream_input, tmp_path):
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = stream_extraction(spark, stream_input, out, ckpt)
    q.awaitTermination(120)
    result = spark.read.parquet(out)
    assert result.count() == 400
    assert "candidates" in result.columns
    assert result.filter(F.size("candidates") > 0).count() > 0
    # incremental resume: re-running with the same checkpoint ingests nothing new
    q2 = stream_extraction(spark, stream_input, out, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == 400


def test_windowed_label_counts(spark, stream_input, tmp_path):
    out, ckpt = str(tmp_path / "wout"), str(tmp_path / "wckpt")
    q = run_windowed_counts(spark, stream_input, out, ckpt)
    q.awaitTermination(120)
    result = spark.read.parquet(out)
    assert result.count() > 0
    row = result.agg(F.sum("turns").alias("t"), F.sum("turns_with_label").alias("l")).collect()[0]
    assert row.t > 0 and 0 < row.l <= row.t


def test_export_csv_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [("a", 2, ["x", "y"]), ("b", 1, [])],
        "name: string, ts: int, tags: array<string>",
    )
    out_dir = str(tmp_path / "export")
    summary = export_csv(df, out_dir)
    assert summary == {"totalImages": 2}
    back = read_csv_multi(spark, [f"{out_dir}/csv"])
    rows = {r.name: r for r in back.collect()}
    assert rows["a"].tags == '["x","y"]'  # nested serialized at the boundary only
    assert os.path.exists(f"{out_dir}/export-summary.json")


def test_stateful_conv_totals_match_batch(spark, tmp_path):
    """applyInPandasWithState totals across microbatches == batch groupBy.

    The input dir is written as several files with maxFilesPerTrigger=8,
    so availableNow processes multiple microbatches and the keyed state
    genuinely accumulates across them."""
    import pyspark.sql.functions as F

    from ocr_auto_label_spark.datagen import generate_transcripts
    from ocr_auto_label_spark.plans.extraction_pipeline import extract_turns
    from ocr_auto_label_spark.schemas import TRANSCRIPT_SCHEMA
    from ocr_auto_label_spark.streaming.stateful import run_conv_running_totals

    pdf = generate_transcripts(600, seed=9)
    inp = tmp_path / "in"
    inp.mkdir()
    for i in range(4):
        part = pdf.iloc[i * 150:(i + 1) * 150]
        spark.createDataFrame(part.astype(object), TRANSCRIPT_SCHEMA).coalesce(1) \
            .write.mode("append").parquet(str(inp))

    # max_files_per_trigger=1 forces one microbatch per file (4+ batches),
    # so the keyed state genuinely accumulates across batches
    q = run_conv_running_totals(
        spark, str(inp), str(tmp_path / "ckpt"), "t_conv_totals",
        max_files_per_trigger=1,
    )
    q.awaitTermination()
    updates = spark.sql("SELECT * FROM t_conv_totals").toPandas()
    # final total per conv = max turns row (updates are monotone)
    final = updates.sort_values("turns").groupby("conv_id").last()

    batch = extract_turns(
        spark.createDataFrame(pdf.astype(object), TRANSCRIPT_SCHEMA)
    ).groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("turns"),
        F.sum((F.size("candidates") > 0).cast("long")).alias("turns_with_label"),
    ).toPandas().set_index("conv_id")

    assert set(final.index) == set(batch.index)
    for cid in batch.index:
        assert final.loc[cid, "turns"] == batch.loc[cid, "turns"], cid
        assert final.loc[cid, "turns_with_label"] == batch.loc[cid, "turns_with_label"], cid

    # plan audit: Arrow grouped-state map, no per-row Python
    from ocr_auto_label_spark.streaming.stateful import conv_running_totals
    plan = conv_running_totals(spark, str(inp))._jdf.queryExecution().analyzed().toString()
    assert "FlatMapGroupsInPandasWithState" in plan


def test_stream_checkpoint_resume_processes_only_new_files(spark, tmp_path):
    """availableNow + checkpoint: a second drain after new files arrive
    appends exactly the new turns — no reprocessing, no duplicates (the
    streaming twin of resume-from-lineage)."""
    from ocr_auto_label_spark.datagen import transcripts_parquet
    from ocr_auto_label_spark.streaming.pipeline import stream_extraction

    import pandas as pd

    src = transcripts_parquet(2_000)
    full = pd.read_parquet(src)
    inp = tmp_path / "inp"
    inp.mkdir()
    full.iloc[:1200].to_parquet(inp / "batch-0.parquet", index=False)

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    stream_extraction(spark, str(inp), out, ckpt).awaitTermination()
    assert spark.read.parquet(out).count() == 1200

    full.iloc[1200:].to_parquet(inp / "batch-1.parquet", index=False)
    stream_extraction(spark, str(inp), out, ckpt).awaitTermination()
    total = spark.read.parquet(out)
    assert total.count() == len(full)
    assert total.select("conv_id", "turn_idx").distinct().count() == len(full)


def test_deduped_ingest_drops_watermark_duplicates(spark, tmp_path):
    """dropDuplicatesWithinWatermark ingest: exact payload repeats within
    the horizon are dropped, uniques all survive."""
    from ocr_auto_label_spark.streaming.pipeline import run_deduped_ingest

    d = str(tmp_path / "in")
    os.makedirs(d)
    pdf = generate_transcripts(300, seed=9)
    pdf.to_parquet(f"{d}/part1.parquet", index=False)
    # re-deliver the first 120 rows (same conv/turn/text → same hash)
    pdf.iloc[:120].to_parquet(f"{d}/part2_dupes.parquet", index=False)

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = run_deduped_ingest(spark, d, out, ckpt)
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    assert got.count() == 300
    assert got.select("conv_id", "turn_idx").distinct().count() == 300


def test_streaming_sketch_equals_batch_sketch(spark, tmp_path):
    """The SAME cms_build operator on the stream vs on the batch read:
    the drained complete-mode grid is cell-for-cell identical (integer
    sums are order/microbatch-independent) — the sketch-as-streaming-
    state claim made concrete."""
    import uuid

    from ocr_auto_label_spark.datagen import transcripts_parquet
    from ocr_auto_label_spark.operators.sketch import cms_build
    from ocr_auto_label_spark.streaming.pipeline import run_term_sketch

    inp = transcripts_parquet(2_000)
    name = f"cms_stream_t_{uuid.uuid4().hex[:8]}"
    q = run_term_sketch(spark, inp, str(tmp_path / "ckpt"), query_name=name)
    q.awaitTermination()
    streamed = {
        (r.row_j, r.bucket): r.cnt for r in spark.table(name).collect()
    }
    batch = {
        (r.row_j, r.bucket): r.cnt
        for r in cms_build(
            spark.read.parquet(inp).select("text")
        ).collect()
    }
    assert streamed == batch and len(batch) > 0


def test_stream_stream_interval_join_equals_batch(spark, stream_input, tmp_path):
    """The watermarked stream-stream interval join's availableNow drain
    equals the batch join with the identical predicate over the same
    files (the drain-vs-batch contract every streaming leg uses), the
    join is non-trivial on the fixture, and the interval bound is real
    (shrinking the horizon shrinks the result)."""
    from ocr_auto_label_spark.streaming.pipeline import (
        run_turn_tool_join,
        turn_tool_interval_join,
    )

    q = run_turn_tool_join(
        spark, stream_input, str(tmp_path / "ckpt_j"), "ssjoin_t"
    )
    q.awaitTermination(120)
    drained = {tuple(r) for r in spark.sql("SELECT * FROM ssjoin_t").collect()}

    base = spark.read.parquet(stream_input)
    left = base.select("conv_id", "turn_idx", "ts")
    right = base.filter(F.col("tool").isNotNull()).select(
        F.col("conv_id").alias("tool_conv"), F.col("ts").alias("tool_ts")
    )
    cond = (
        (F.col("conv_id") == F.col("tool_conv"))
        & (F.col("tool_ts") >= F.col("ts"))
        & (F.col("tool_ts") <= F.col("ts") + F.expr("INTERVAL 5 MINUTES"))
    )
    want = {
        tuple(r)
        for r in left.join(right, cond, "inner")
        .select("conv_id", "turn_idx", "ts", "tool_ts")
        .collect()
    }
    assert drained == want
    assert len(want) > 0
    # the time bound binds: a zero-minute horizon keeps only ts == tool_ts
    tight = turn_tool_interval_join(spark, stream_input, horizon_minutes=0)
    assert tight.isStreaming
    want_tight = {
        t for t in want if t[2] == t[3]
    }
    assert len(want_tight) < len(want)
