"""spark-submit entry point for the flagship extraction job.

Usage (cluster):
    spark-submit --py-files ocr_auto_label_spark.zip jobs/run_extraction.py \
        --input <iceberg-or-parquet path> --output out/ --lineage lineage/ \
        --run-id r1 [--n-buckets 256] [--wave-size 64]

Usage (sandbox):
    python jobs/run_extraction.py --gen-turns 20000 --output /tmp/out \
        --lineage /tmp/lin --run-id demo

Resumable: re-running with the same --run-id/--lineage skips completed
partition buckets (see ocr_auto_label_spark/lineage.py).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")  # allow running from repo root without install

from ocr_auto_label_spark.session import build_spark  # noqa: E402
from ocr_auto_label_spark.lineage import run_extraction_with_checkpoint  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", help="transcript table path (parquet dir or Iceberg table path)")
    p.add_argument("--gen-turns", type=int, help="generate a synthetic input of N turns instead")
    p.add_argument("--output", required=True)
    p.add_argument("--lineage", required=True)
    p.add_argument("--run-id", required=True)
    p.add_argument("--n-buckets", type=int, default=64)
    p.add_argument("--wave-size", type=int, default=32)
    p.add_argument("--input-format", default="parquet")
    p.add_argument("--output-format", default="parquet", choices=["parquet", "iceberg"],
                   help="iceberg: write via DataFrameWriterV2 overwritePartitions "
                        "into a catalog table (requires Iceberg jars + catalog conf; "
                        "--output is then a table identifier)")
    p.add_argument("--salt-partitions", type=int, default=0,
                   help="salted-repartition the input to N partitions before "
                        "extraction — for inputs whose files are clustered by "
                        "conv_id (hot conversations); 0 = narrow path")
    p.add_argument("--master", default=None)
    args = p.parse_args()

    input_path = args.input
    if args.gen_turns:
        from ocr_auto_label_spark.datagen import transcripts_parquet

        input_path = transcripts_parquet(args.gen_turns)
    if not input_path:
        p.error("one of --input / --gen-turns is required")

    spark = build_spark(app_name=f"extraction-{args.run_id}", master=args.master)
    t0 = time.time()
    summary = run_extraction_with_checkpoint(
        spark, input_path, args.output, args.lineage, args.run_id,
        n_buckets=args.n_buckets, wave_size=args.wave_size,
        input_format=args.input_format, salt_partitions=args.salt_partitions,
        output_format=args.output_format,
    )
    from ocr_auto_label_spark.lineage import read_output

    rows = read_output(spark, args.output, args.output_format).count()
    elapsed = time.time() - t0
    summary.update({
        "rows_out": rows,
        "elapsed_sec": round(elapsed, 2),
        "turns_per_sec": round(rows / elapsed, 1),
    })
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
