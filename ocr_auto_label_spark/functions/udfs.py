"""Arrow-vectorized pandas UDFs wrapping the pure-Python labelcore.

Contract (BASELINE.json north_star): **zero per-row Python UDFs** — every
Python crossing is an Arrow-batched ``pandas_udf`` (``ArrowEvalPython`` in
the physical plan, never ``BatchEvalPython``; asserted in tests).

Vectorization strategy for the extraction UDF:
  1. a vectorized ``Series.str.contains`` prefilter skips the ~60% of
     turns with no label-shaped token at all,
  2. surviving rows run the span scan (``re.finditer`` must yield offsets,
     which pandas ``str`` ops cannot),
  3. token-level results are memoized per batch — labels repeat heavily,
     so grammar validation / confusion fan-out / fuzzy match run once per
     distinct token, not once per occurrence.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

from ocr_auto_label_spark.labelcore.boilerplate import normalize_text
from ocr_auto_label_spark.labelcore.confusion import best_correction
from ocr_auto_label_spark.labelcore.extract import TOKEN_RE, Candidate, rank_candidates
from ocr_auto_label_spark.labelcore.fuzzy import canonical_match
from ocr_auto_label_spark.labelcore.grammar import normalize_code
from ocr_auto_label_spark.labelcore.scoring import NOISE_THRESHOLD, confidence
from ocr_auto_label_spark.schemas import CANDIDATE_SCHEMA, EXTRACT_RESULT_SCHEMA


def _normalize_series(s: pd.Series) -> pd.Series:
    """labelcore.boilerplate.normalize_text mapped over the batch —
    byte-identical by construction (ONE implementation for oracle and
    UDF).  Pandas str.replace loops rows in Python anyway, so mapping the
    scalar function costs the same per row while its match-impossible
    gates skip ~40% of the regex scans on typical turns."""
    return s.map(normalize_text, na_action="ignore")


@pandas_udf(StringType())
def normalize_text_udf(s: pd.Series) -> pd.Series:
    return _normalize_series(s)


def _resolve_token(token: str, cache: dict) -> tuple | None:
    """(label, pattern_id, corrections, canonical, sim, conf) or None (noise)."""
    hit = cache.get(token, False)
    if hit is not False:
        return hit
    norm = normalize_code(token)
    corrected = best_correction(norm)
    if corrected is None:
        cache[token] = None
        return None
    label, edits, pattern_id = corrected
    canon, sim = canonical_match(label)
    conf = confidence(True, sim, edits)
    res = None if conf <= NOISE_THRESHOLD else (label, pattern_id, edits, canon, sim, conf)
    cache[token] = res
    return res


def _scan_row(raw: str, source_col: str, cache: dict) -> list[Candidate]:
    out = []
    for m in TOKEN_RE.finditer(raw):
        res = _resolve_token(m.group(0), cache)
        if res is None:
            continue
        label, pattern_id, edits, canon, sim, conf = res
        out.append(Candidate(
            label=label, raw=m.group(0), begin=m.start(), end=m.end(),
            source_col=source_col, pattern_id=pattern_id, corrections=edits,
            canonical=canon, canonical_sim=sim, confidence=conf,
        ))
    return out


def _extract_batch(text: pd.Series, tool: pd.Series) -> pd.DataFrame:
    extracted = _normalize_series(text)
    # vectorized prefilter: rows that can possibly hold a candidate token
    has_text = text.str.contains(TOKEN_RE, na=False)
    has_tool = tool.str.contains(TOKEN_RE, na=False)
    cache: dict = {}
    cands_col: list[list[dict]] = []
    text_vals = text.to_numpy(dtype=object)
    tool_vals = tool.to_numpy(dtype=object)
    ht = has_text.to_numpy()
    hl = has_tool.to_numpy()
    for i in range(len(text_vals)):
        cands: list[Candidate] = []
        if ht[i]:
            cands.extend(_scan_row(text_vals[i], "text", cache))
        if hl[i]:
            cands.extend(_scan_row(tool_vals[i], "tool", cache))
        if len(cands) > 1:
            cands = rank_candidates(cands)
        elif cands:
            cands = [Candidate(**{**cands[0].__dict__, "rank": 1})]
        cands_col.append([c.__dict__ for c in cands])
    return pd.DataFrame({
        "extracted_text": extracted,
        "candidates": pd.Series(cands_col, index=text.index),
    })


@pandas_udf(EXTRACT_RESULT_SCHEMA)
def extract_turn_udf(text: pd.Series, tool: pd.Series) -> pd.DataFrame:
    """(text, tool) → struct<extracted_text, candidates array<struct>>.

    Ranking happens inside the UDF (per-turn argsort), so the flagship
    pipeline needs **no shuffle** for W7 candidate ranking — extraction is
    embarrassingly parallel per turn.
    """
    return _extract_batch(text, tool)


@pandas_udf(ArrayType(CANDIDATE_SCHEMA))
def extract_candidates_udf(text: pd.Series, tool: pd.Series) -> pd.Series:
    """Array-only variant (no normalized text) for span-level consumers."""
    return _extract_batch(text, tool)["candidates"]
