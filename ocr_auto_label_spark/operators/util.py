"""Physical-shape helpers shared by the operator library."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Guarantee at least ``min_partitions`` (default: cluster default
    parallelism) ahead of a CPU-dense stage.

    On a production-size table this is a **no-op**: the scan already
    yields ≥ one task per file/split, far above core count, and we never
    add a shuffle.  It only repartitions when the source is a small
    single-file table (tests / local benches), whose one scan task would
    otherwise serialize interpreted higher-order-function stages
    (shingling, minhash, cosine) on a single core.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
