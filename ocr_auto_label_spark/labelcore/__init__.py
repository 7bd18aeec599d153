"""Pure-Python extraction core (no Spark imports).

Single source of truth for label-recognition semantics.  Both the pytest
oracle and the Arrow-vectorized pandas UDFs in
``ocr_auto_label_spark.functions.udfs`` call into this module, so Spark
output is byte-equal to the reference implementation by construction —
tests then verify the round trip through Arrow/Spark.

Reference parity (cited ``path:line`` into /root/reference):
- grammar:    backend/src/lib/sampleCodePatterns.ts:35-172
- confusion:  backend/src/services/gemini.ts:94-98,107-114,166
- fuzzy:      backend/src/services/gemini.ts:164-187 (generative prompt
              rules re-expressed as deterministic Levenshtein/trigram match)
- naming:     backend/src/routes/upload.ts:524-537,660-708
- grouping:   backend/src/services/grouping.ts:121-324
"""

from ocr_auto_label_spark.labelcore.grammar import (  # noqa: F401
    SAMPLE_CODE_PATTERNS,
    is_valid_sample_code,
    match_pattern_id,
)
from ocr_auto_label_spark.labelcore.extract import (  # noqa: F401
    Candidate,
    extract_candidates,
    extract_turn,
    normalize_text,
)
from ocr_auto_label_spark.labelcore.canonical import canonical_labels  # noqa: F401
