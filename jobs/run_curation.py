"""spark-submit entry point for the corpus-curation pipeline.

Usage (cluster):
    spark-submit --py-files ocr_auto_label_spark.zip jobs/run_curation.py \
        --input <documents parquet/Iceberg path> --output out/ \
        [--min-quality 0.5] [--min-tokens 1] [--max-dup-word-frac 1.0] \
        [--ngram-n 13] [--pack-budget 2048]

Usage (sandbox):
    python jobs/run_curation.py --input /root/testdata/sf0.01/documents.parquet \
        --output /tmp/curated

Quality gates -> exact dedup -> deterministic train/val/test split ->
13-gram decontamination report; prints one JSON summary line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")  # allow running from repo root without install

from ocr_auto_label_spark.session import build_spark  # noqa: E402
from ocr_auto_label_spark.plans.curation_pipeline import curate_corpus  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="documents table path")
    p.add_argument("--output", required=True)
    p.add_argument("--min-quality", type=float, default=0.5)
    p.add_argument("--min-tokens", type=int, default=1)
    p.add_argument("--max-dup-word-frac", type=float, default=1.0)
    p.add_argument("--ngram-n", type=int, default=13)
    p.add_argument("--pack-budget", type=int, default=0,
                   help="also write the sequence-packing assignment "
                        "(packs never cross split boundaries); 0 = off")
    p.add_argument("--chunk-budget", type=int, default=0,
                   help="also write token-window chunks of the curated "
                        "docs (chunks inherit their doc's split); 0 = off")
    p.add_argument("--chunk-overlap", type=int, default=0,
                   help="tokens shared by consecutive chunks")
    p.add_argument("--semdedup-embeddings", default=None,
                   help="embeddings parquet keyed by vec_id matching the "
                        "corpus ids; enables the SemDeDup semantic-dedup "
                        "stage between exact dedup and the split")
    p.add_argument("--semdedup-threshold", type=float, default=0.95)
    p.add_argument("--semdedup-centroids", type=int, default=16)
    p.add_argument("--semantic-decontam-threshold", type=float, default=None,
                   help="with --semdedup-embeddings: also report eval docs "
                        "whose embedding is cosine-similar (>= this) to any "
                        "train doc's (LSH-blocked; recall < 1 by design)")
    p.add_argument("--span-dedup-width", type=int, default=0,
                   help="rewrite the corpus with duplicated-substring "
                        "removal at this span width (Lee et al. 2021); "
                        "0 = off")
    p.add_argument("--dsir-target-lang", default=None,
                   help="DSIR selection target domain (a lang value)")
    p.add_argument("--dsir-keep-percent", type=int, default=None,
                   help="keep only the top X%% of docs by DSIR importance "
                        "weight toward --dsir-target-lang (before the split)")
    p.add_argument("--quality-label-lang", default=None,
                   help="target lang label for the trained hashed-LR "
                        "quality filter")
    p.add_argument("--quality-keep-percent", type=int, default=None,
                   help="train the LR quality model and keep only the "
                        "top X%% of docs by its score (model-based "
                        "selection, before DSIR)")
    p.add_argument("--bpe-merges", type=int, default=0,
                   help="train a BPE tokenizer (this many merges) on the "
                        "curated TRAIN split and write the merge table + "
                        "symbol vocab beside the corpus; 0 = off")
    p.add_argument("--temperature-alpha", type=float, default=None,
                   help="temperature-resample sources before the split: "
                        "group share proportional to n^alpha, alpha in "
                        "(0, 1] (XLM-R/mT5 mixing; needs "
                        "--temperature-total)")
    p.add_argument("--temperature-total", type=int, default=None,
                   help="target corpus size for --temperature-alpha "
                        "resampling (capped at the surviving corpus)")
    p.add_argument("--master", default=None)
    args = p.parse_args()

    spark = build_spark(app_name="curation", master=args.master)
    t0 = time.time()
    try:
        docs = spark.read.parquet(args.input)
        summary = curate_corpus(
            spark,
            docs,
            args.output,
            min_quality=args.min_quality,
            min_tokens=args.min_tokens,
            max_dup_word_frac=args.max_dup_word_frac,
            ngram_n=args.ngram_n,
            pack_budget=args.pack_budget,
            chunk_budget=args.chunk_budget,
            chunk_overlap=args.chunk_overlap,
            embeddings=(
                spark.read.parquet(args.semdedup_embeddings)
                if args.semdedup_embeddings else None
            ),
            semdedup_centroids=args.semdedup_centroids,
            semdedup_threshold=args.semdedup_threshold,
            semantic_decontam_threshold=args.semantic_decontam_threshold,
            dsir_target_lang=args.dsir_target_lang,
            dsir_keep_percent=args.dsir_keep_percent,
            span_dedup_width=args.span_dedup_width,
            bpe_merges=args.bpe_merges,
            quality_label_lang=args.quality_label_lang,
            quality_keep_percent=args.quality_keep_percent,
            temperature_alpha=args.temperature_alpha,
            temperature_total=args.temperature_total,
        )
        summary["elapsed_sec"] = round(time.time() - t0, 2)
        print(json.dumps(summary))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
