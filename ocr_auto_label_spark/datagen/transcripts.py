"""Deterministic synthetic transcript generator (FIXTURES.md §1).

Produces the primary input table ``(conv_id string, turn_idx int32,
role string, text string, tool string, ts timestamp)`` with:

- Zipf-skewed conversation sizes (a few hot conversations → exercises the
  salted repartition path),
- label-bearing turns (~30% one label, ~10% two, rest none),
- corruptions on label-bearing turns (~25% confusion char swap, ~10%
  missed period) that the extraction core must repair,
- boilerplate wrapping (HTML-ish tags, markdown fences, nav chrome),
- tool-call JSON payloads (sometimes fenced) that may carry labels,
- intra-conversation timestamps clustered so ±2-minute proximity windows
  are non-trivial.

Everything is a pure function of ``(n_turns, seed)`` — no wall clock, no
external data.  Labels are drawn from the grammar-derived canonical list
plus grammar-valid non-canonical codes.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from ocr_auto_label_spark.labelcore.canonical import canonical_labels

_EPOCH = np.datetime64("2026-01-01T00:00:00")

_FILLER = (
    "Let me check the results of that run.",
    "The sample was collected near the northern site boundary.",
    "I uploaded the batch and verified the checksum.",
    "Here is the summary you asked for.",
    "Processing completed without errors on the worker pool.",
    "That matches what the field team reported yesterday.",
    "We should re-run the failed shard with more memory.",
    "The photo shows a blue plastic container on a table.",
)

_NAV_LINES = (
    "Home | About | Contact",
    "Menu | Login | Register",
    "Share | Subscribe",
    "Skip to content",
)

_CONFUSION_FWD = {"D": "0", "B": "8", "1": "I", "0": "O"}


def _corrupt(rng: np.random.Generator, label: str) -> str:
    """Apply one deterministic corruption the extractor must repair."""
    kind = rng.random()
    if kind < 0.75:  # confusion char swap
        positions = [i for i, c in enumerate(label) if c in _CONFUSION_FWD]
        if positions:
            i = positions[int(rng.integers(len(positions)))]
            return label[:i] + _CONFUSION_FWD[label[i]] + label[i + 1:]
    # missed period: drop one interior '.'
    dots = [i for i, c in enumerate(label) if c == "."]
    if len(dots) > 1:
        i = dots[int(rng.integers(1, len(dots)))]
        return label[:i] + label[i + 1:]
    return label


def _conv_sizes(rng: np.random.Generator, n_turns: int) -> list[int]:
    """Heavy-tailed conversation sizes summing to n_turns; conv 0 is hot
    (~8% of all turns) to exercise skew handling."""
    sizes: list[int] = [max(8, n_turns // 12)]
    remaining = n_turns - sizes[0]
    while remaining > 0:
        s = int(min(remaining, max(1, rng.zipf(1.6))))
        s = min(s, max(2, n_turns // 50))
        sizes.append(s)
        remaining -= s
    return sizes


def generate_transcripts(n_turns: int, seed: int = 42) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    canon = [label for label, _ in canonical_labels()]

    conv_ids: list[str] = []
    turn_idxs: list[int] = []
    roles: list[str] = []
    texts: list[str] = []
    tools: list[object] = []
    ts_offsets: list[int] = []  # seconds from epoch

    role_cycle = ("user", "assistant", "tool")
    conv_start = 0
    for ci, size in enumerate(_conv_sizes(rng, n_turns)):
        conv_id = f"conv-{ci:07d}"
        conv_start += int(rng.integers(30, 3600))
        t = conv_start
        for ti in range(size):
            # gaps mostly short (<2min) with occasional jumps
            t += int(rng.integers(5, 90)) if rng.random() < 0.8 else int(rng.integers(180, 900))
            conv_ids.append(conv_id)
            turn_idxs.append(ti)
            roles.append(role_cycle[int(rng.integers(3))])
            ts_offsets.append(t)

            n_labels = 0
            r = rng.random()
            if r >= 0.9:
                n_labels = 2
            elif r >= 0.6:
                n_labels = 1
            parts = [str(_FILLER[int(rng.integers(len(_FILLER)))])]
            for _ in range(n_labels):
                label = canon[int(rng.integers(len(canon)))]
                cr = rng.random()
                if cr < 0.25:
                    label = _corrupt(rng, label)
                wrap = rng.random()
                if wrap < 0.25:
                    parts.append(f"Sample <b>{label}</b> recorded.")
                elif wrap < 0.35:
                    parts.append(f"<div class=\"note\">ID {label} confirmed</div>")
                else:
                    parts.append(f"Sample {label} recorded.")
            if rng.random() < 0.15:
                parts.insert(0, str(_NAV_LINES[int(rng.integers(len(_NAV_LINES)))]))
            if rng.random() < 0.1:
                parts.append("<p>&nbsp;</p>")
            text = "\n".join(parts)

            tool: object = None
            if rng.random() < 0.2:
                payload = '{"status": "ok", "items": %d' % int(rng.integers(1, 50))
                if rng.random() < 0.3:
                    label = canon[int(rng.integers(len(canon)))]
                    if rng.random() < 0.25:
                        label = _corrupt(rng, label)
                    payload += f', "sample_id": "{label}"'
                payload += "}"
                if rng.random() < 0.5:
                    payload = f"```json\n{payload}\n```"
                tool = payload
            tools.append(tool)
            texts.append(text)
        if len(conv_ids) >= n_turns:
            break

    n = min(n_turns, len(conv_ids))
    return pd.DataFrame({
        "conv_id": pd.array(conv_ids[:n], dtype="string"),
        "turn_idx": pd.array(turn_idxs[:n], dtype="int32"),
        "role": pd.array(roles[:n], dtype="string"),
        "text": pd.array(texts[:n], dtype="string"),
        "tool": pd.array(tools[:n], dtype="string"),
        "ts": _EPOCH + np.array(ts_offsets[:n], dtype="timedelta64[s]"),
    })


def transcripts_parquet(n_turns: int, seed: int = 42, base_dir: str = "/tmp/spark_graft_data") -> str:
    """Materialize (cached) the synthetic table as a parquet directory.

    Multi-file layout (chunks of ≤25k turns) mirrors a real Iceberg
    table's many data files: the scan stage gets one task per file and
    parallelizes instead of bottlenecking on a single-file byte-range
    split.  Cached by (n_turns, seed); written atomically (tmp dir +
    rename) for concurrent safety.
    """
    path = os.path.join(base_dir, f"transcripts_n{n_turns}_s{seed}.parquet")
    if os.path.isdir(path):
        return path
    if os.path.isfile(path):  # pre-multi-file cache from an older run
        # tolerant loser-discard, matching the rename path: a concurrent
        # caller may have removed it between the isfile check and here
        import contextlib

        with contextlib.suppress(FileNotFoundError):
            os.remove(path)
    os.makedirs(base_dir, exist_ok=True)
    pdf = generate_transcripts(n_turns, seed)
    # writer-private tmp dir: concurrent callers must not share one
    # (os.rename of a dir cannot overwrite an existing non-empty target,
    # so exactly one writer wins; losers discard their copy — the content
    # is deterministic, so any winner's output is identical)
    tmp = f"{path}.tmp.{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    chunk = 25_000
    n_files = max(1, -(-len(pdf) // chunk))
    for i in range(n_files):
        part = pdf.iloc[i * chunk:(i + 1) * chunk]
        part.to_parquet(
            os.path.join(tmp, f"part-{i:05d}.parquet"),
            index=False, row_group_size=8192,
        )
    try:
        os.rename(tmp, path)
    except OSError:
        if not os.path.isdir(path):  # lost the race some other way — re-raise
            raise
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    return path


def replicated_transcripts(
    spark,
    base_turns: int,
    factor: int,
    seed: int = 42,
    base_dir: str = "/tmp/spark_graft_data",
) -> str:
    """``factor``× replication of the cached base table with conv_ids
    remapped per copy (``r{k}-`` prefix) — a deterministic large input for
    the data-scaling bench leg without an O(n) Python generation loop.
    Written by Spark (parallel), cached by (base_turns, factor, seed),
    atomic via tmp-dir + rename like ``transcripts_parquet``."""
    from functools import reduce

    from pyspark.sql import DataFrame, functions as F

    path = os.path.join(
        base_dir, f"transcripts_n{base_turns}x{factor}_s{seed}.parquet"
    )
    if os.path.isdir(path):
        return path
    base = spark.read.parquet(transcripts_parquet(base_turns, seed, base_dir))
    copies = [
        base.withColumn("conv_id", F.concat(F.lit(f"r{k}-"), F.col("conv_id")))
        for k in range(factor)
    ]
    tmp = f"{path}.tmp.{os.getpid()}"
    reduce(DataFrame.unionByName, copies).write.mode("overwrite").parquet(tmp)
    try:
        os.rename(tmp, path)
    except OSError:
        if not os.path.isdir(path):
            raise
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    return path
