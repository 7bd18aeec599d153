"""Benchmark harness — one JSON line on stdout.

Headline: flagship extraction throughput (turns/sec) over the synthetic
transcript table at the target scale, plus per-query wall times for a
representative slice of the operator registry at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Usage:
    python bench.py                  # suite + N vs 4N scaling (default 2,8)
    python bench.py --no-scaling     # suite only
    SPARK_GRAFT_SCALE_PAIR=4,16 SPARK_GRAFT_SCALE_TURNS=800000 python bench.py

Every query is materialized through the noop sink so Catalyst can't
short-circuit column computation under count().
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

BENCH_QUERIES = [
    "extract_flagship",
    "extract_best_labels",
    "j5_join_suite",
    "j1_time_range_self_join",
    "w1_a1_j3_ordinal_naming",
    "w5_sliding_frame_avg",
    "w8_session_window",
    "a6_ordered_distinct_union",
    "lifecycle_e2_reindex",
    "infer_groups_keyed",
    "dedup_exact_hash",
    "dedup_ngram_jaccard",
    "dedup_minhash_variants",
    "embed_cosine_topk",
    "embed_ann_variants",
    "embed_neardup_pairs",
    "text_quality_stats",
    "text_language_id",
    "text_pii_scrub",
    "token_span_scan",
    "x2_grammar_validate",
    "auto_group_transitive",
]


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _sf_label(sf_dir: str) -> float:
    for tok in ("0.001", "0.01", "0.1"):
        if tok in sf_dir:
            return float(tok)
    return -1.0


def run_suite(master: str, shuffle_partitions: int) -> dict:
    from ocr_auto_label_spark.session import build_spark
    from ocr_auto_label_spark.entry_queries import build_queries, _sf_turns
    from ocr_auto_label_spark.datagen import transcripts_parquet

    transcripts_parquet(_sf_turns(SF_DIR))  # pre-generate outside timing
    spark = build_spark(app_name=f"bench-{master}", master=master,
                        shuffle_partitions=shuffle_partitions)
    # the bench artifact must end in one clean JSON line: silence JVM-side
    # logging (incl. the benign PythonAccumulatorV2 flush trace that a
    # stopping session can emit mid-suite)
    spark.sparkContext.setLogLevel("OFF")
    queries = build_queries()
    timings: dict[str, float] = {}
    n_turns = _sf_turns(SF_DIR)
    for name in BENCH_QUERIES:
        df = queries[name](spark, SF_DIR)
        # warm every query once: codegen + python-worker spawn + AQE state
        # are session artifacts, not operator cost — timing them makes the
        # numbers depend on where in the suite a query runs.  Best-of-2
        # timed runs: single-run timings showed 2-3× host-variance
        # outliers on the applyInPandas stages (BENCH/BASELINE.md r3).
        _materialize(df)
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            _materialize(df)
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
    extraction_sec = timings["extract_flagship"]
    result = {
        "master": master,
        "queries": timings,
        "extraction_sec": extraction_sec,
        "turns": n_turns,
        "turns_per_sec": round(n_turns / extraction_sec, 1),
        "total_sec": round(sum(timings.values()), 3),
    }
    spark.stop()
    return result


def scaling_run(master: str, shuffle_partitions: int, n_turns: int) -> float:
    """Warmed extraction-only throughput (turns/sec) at one parallelism.

    The two-cluster-size efficiency criterion needs the CPU-bound stage
    isolated from fixed costs (JVM/codegen/python-worker startup), so:
    warm once, then take the best of two timed runs on a large input."""
    from ocr_auto_label_spark.session import build_spark
    from ocr_auto_label_spark.entry_queries import build_queries
    from ocr_auto_label_spark.datagen import transcripts_parquet
    import ocr_auto_label_spark.entry_queries as eq

    transcripts_parquet(n_turns)
    spark = build_spark(app_name=f"scale-{master}", master=master,
                        shuffle_partitions=shuffle_partitions)
    spark.sparkContext.setLogLevel("OFF")
    original = eq._sf_turns
    eq._sf_turns = lambda _: n_turns  # point the flagship at the big input
    try:
        df = build_queries()["extract_flagship"](spark, SF_DIR)
        _materialize(df)  # warmup
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            _materialize(df)
            best = min(best, time.time() - t0)
    finally:
        eq._sf_turns = original
        spark.stop()
    return round(n_turns / best, 1)


def skew_run(n_turns: int) -> dict:
    """North-star skew leg: same input, same single shuffle, the ONLY
    difference is key balance — raw conv_id partitioning (the hot
    conversation, ~8% of all turns by construction, lands whole in one
    task) vs salted_repartition (pmod(xxhash64(conv_id, turn_idx)) spreads
    it).  Wall-clock ratio quantifies what salting buys on a
    conv-clustered layout."""
    from ocr_auto_label_spark.session import build_spark
    from ocr_auto_label_spark.datagen import transcripts_parquet
    from ocr_auto_label_spark.plans.extraction_pipeline import (
        extract_candidates_flat,
        salted_repartition,
    )

    path = transcripts_parquet(n_turns)
    spark = build_spark(app_name="bench-skew", master=f"local[{CPUS}]",
                        shuffle_partitions=max(CPUS, 32))
    spark.sparkContext.setLogLevel("OFF")
    df = spark.read.parquet(path)
    legs: dict[str, float] = {}
    for name, prep in (
        ("conv_partitioned_sec", lambda d: d.repartition(CPUS, "conv_id")),
        ("salted_sec", lambda d: salted_repartition(d, CPUS)),
    ):
        out = extract_candidates_flat(prep(df))
        _materialize(out)  # warm
        t0 = time.time()
        _materialize(out)
        legs[name] = round(time.time() - t0, 3)
    spark.stop()
    return {
        "turns": n_turns,
        **legs,
        "salting_speedup": round(legs["conv_partitioned_sec"] / legs["salted_sec"], 3),
    }


def main() -> None:
    if not os.path.isdir(SF_DIR):
        sys.exit(f"error: SPARK_GRAFT_SF_DIR does not exist: {SF_DIR}")
    p = argparse.ArgumentParser()
    p.add_argument("--scaling", action="store_true",
                   help="(kept for compatibility; scaling now runs by default)")
    p.add_argument("--no-scaling", action="store_true",
                   help="skip the N vs 4N cores efficiency measurement")
    args = p.parse_args()
    if args.scaling and args.no_scaling:
        p.error("--scaling and --no-scaling are mutually exclusive")
    args.scaling = not args.no_scaling

    main_run = run_suite(f"local[{CPUS}]", max(CPUS, 32))
    out = {
        "metric": "bench_suite_total",
        "value": main_run["total_sec"],
        "unit": "sec",
        "queries": main_run["queries"],
        "sf": _sf_label(SF_DIR),
        "turns_per_sec": main_run["turns_per_sec"],
        "extraction_turns": main_run["turns"],
        "cpus": CPUS,
    }
    if args.scaling:
        # pair 2,8 sits fully inside this 32-core host's capacity (≤8 busy
        # cores leaves the JVM headroom and avoids the host-level per-core
        # frequency/bandwidth decay measured in BENCH/BASELINE.md §control).
        # 4.8M turns: after the round-2 extraction speedup (~100k turns/s
        # at 32 cores) the old 1.6M input finished the local[8] leg in ~6 s,
        # where per-run fixed costs (scan planning, Arrow ramp-up) bias the
        # ratio — the larger input isolates the CPU-bound stage (measured:
        # 1.6M → eff 0.80, 3.2M → 0.85, 4.8M → 1.06 on the same build)
        n_turns = int(os.environ.get("SPARK_GRAFT_SCALE_TURNS", "4800000"))
        pair = os.environ.get("SPARK_GRAFT_SCALE_PAIR", "2,8")
        n_lo, n_hi = (int(x) for x in pair.split(","))
        lo = scaling_run(f"local[{n_lo}]", n_lo, n_turns)
        hi = scaling_run(f"local[{n_hi}]", n_hi, n_turns)
        speedup = hi / lo
        out["scaling"] = {
            "turns": n_turns,
            "cores_lo": n_lo,
            "cores_hi": n_hi,
            f"local{n_lo}_turns_per_sec": lo,
            f"local{n_hi}_turns_per_sec": hi,
            "speedup": round(speedup, 3),
            "efficiency": round(speedup / (n_hi / n_lo), 3),
        }
        out["skew"] = skew_run(
            int(os.environ.get("SPARK_GRAFT_SKEW_TURNS", str(n_turns)))
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
