"""Deterministic candidate confidence scoring.

The reference takes its confidence from the LLM (gemini.ts:243, rubric at
gemini.ts:140-148).  Ours is a deterministic closed-form over the three
recognition signals, so both the Python oracle and the Spark plan compute
the identical value:

    confidence = 0.55 * grammar_valid
               + 0.25 * canonical_similarity       (1.0 exact member;
                                                    trigram sim if fuzzy-matched;
                                                    0.0 otherwise)
               + 0.20 * max(0, 1 - 0.34 * corrections)

rounded half-even to 6 decimals.  The noise gate mirrors the reference's
acceptance threshold 0.35 (grouping.ts:201).
"""

from __future__ import annotations

NOISE_THRESHOLD = 0.35  # grouping.ts:201 — `score > 0.35` acceptance gate


def confidence(grammar_valid: bool, canonical_sim: float, corrections: int) -> float:
    c = (0.55 if grammar_valid else 0.0)
    c += 0.25 * canonical_sim
    c += 0.20 * max(0.0, 1.0 - 0.34 * corrections)
    return round(c, 6)
