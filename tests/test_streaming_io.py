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
