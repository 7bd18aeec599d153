"""Confusion correction + canonical fuzzy match (SURVEY.md X4, J6)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from ocr_auto_label_spark.labelcore.canonical import canonical_labels, canonical_label_set
from ocr_auto_label_spark.labelcore.confusion import (
    MAX_VARIANTS,
    best_correction,
    correction_candidates,
)
from ocr_auto_label_spark.labelcore.fuzzy import canonical_match, levenshtein, trigram_similarity
from ocr_auto_label_spark.labelcore.grammar import is_valid_sample_code

_CONFUSE = {"D": "0", "B": "8", "1": "I", "0": "O", "I": "1", "8": "B", "O": "0"}


def test_d_zero_confusion():
    # FIXTURES.md §3.2 / gemini.ts:94-98: MWI.1.1.18.10.7.11 → 1D
    assert best_correction("MWI.1.1.18.10.7.11") == ("MWI.1.1.18.1D.7.11", 1, "mwi_type_1")


def test_i_one_confusion():
    # gemini.ts:166: "'I' is actually '1'"
    got = best_correction("MWI.I.1.18.1D.7.11")
    assert got == ("MWI.1.1.18.1D.7.11", 1, "mwi_type_1")


def test_b_eight_confusion():
    got = best_correction("MWI.1.1.18.78.7.11")  # sample '78' → '7B'
    assert got == ("MWI.1.1.18.7B.7.11", 1, "mwi_type_1")


def test_missed_period():
    # gemini.ts:89/107-113: '11A' read as '1.1A'
    got = best_correction("MWI.1.1.11A.7.11")
    assert got == ("MWI.1.1.1.1A.7.11", 1, "mwi_type_1")


def test_valid_codes_are_not_touched():
    assert best_correction("MWI.1.2.15.7B.12.8") == ("MWI.1.2.15.7B.12.8", 0, "mwi_type_1")


def test_noise_unrecoverable():
    assert best_correction("MWI.9.9.99.99.99.99") is None
    assert best_correction("HTTP.FOO-BAR") is None


def test_fanout_bounded():
    assert len(correction_candidates("0D0D0D0D.0D0D0D0D.0D0D0D")) <= MAX_VARIANTS


def test_correction_deterministic_order():
    a = correction_candidates("MWI.1.1.18.10.7.11")
    b = correction_candidates("MWI.1.1.18.10.7.11")
    assert a == b and a, "correction fan-out must be deterministic"


def test_levenshtein():
    assert levenshtein("abc", "abc") == 0
    assert levenshtein("abc", "abd") == 1
    assert levenshtein("abc", "ab") == 1
    assert levenshtein("", "abc") == 3
    assert levenshtein("abc", "xyz", cap=1) == 2  # cap+1 on early exit


def test_trigram_similarity_bounds():
    assert trigram_similarity("MWI.1.2", "MWI.1.2") == 1.0
    assert 0.0 <= trigram_similarity("MWI.1.2", "KEN.0.1") < 1.0


def test_canonical_exact_and_fuzzy():
    label = canonical_labels()[100][0]
    assert canonical_match(label) == (label, 1.0)
    # one edit away from a canonical, still grammar-valid → fuzzy hit
    non_canon = "MWI.1.1.1.1A.1.2"
    if non_canon not in canonical_label_set():
        canon, sim = canonical_match(non_canon)
        if canon is not None:
            assert 0.0 < sim <= 1.0
            assert levenshtein(non_canon, canon) <= 1


@settings(max_examples=60)
@given(st.sampled_from([label for label, _ in canonical_labels()]), st.data())
def test_property_single_confusion_recovered(label, data):
    """A single confusion corruption of a canonical label is always repaired
    to *some* valid code with ≤1 edit (unambiguity of the exact original is
    not guaranteed — e.g. '1'→'I' may repair to a different valid digit)."""
    positions = [i for i, c in enumerate(label) if c in _CONFUSE]
    if not positions:
        return
    i = data.draw(st.sampled_from(positions))
    corrupted = label[:i] + _CONFUSE[label[i]] + label[i + 1:]
    if is_valid_sample_code(corrupted):
        return  # corruption landed on another valid code
    got = best_correction(corrupted)
    assert got is not None, f"{label} → {corrupted} not repaired"
    assert got[1] == 1


def test_optimized_matcher_equivalent_to_naive():
    """The arity-dispatch matcher + digit fast path + correction arity
    fast-reject must be observationally identical to the naive loop."""
    import random

    from ocr_auto_label_spark.labelcore.confusion import best_correction
    from ocr_auto_label_spark.labelcore.grammar import (
        SAMPLE_CODE_PATTERNS,
        _segment_ok,
        match_pattern_id,
        normalize_code,
    )

    def naive_match(code):
        if not code:
            return None
        segments = normalize_code(code).split(".")
        for pattern in SAMPLE_CODE_PATTERNS:
            if len(segments) != len(pattern.segments):
                continue
            if all(_segment_ok(s, d) for s, d in zip(segments, pattern.segments)):
                return pattern.id
        return None

    rng = random.Random(7)
    alphabet = "MWIKENAGO0123456789.B-D O8I1+"
    samples = ["MWI.0.1.4.10.15.7", "MWI.0.1.4.1OB.15.7", "MW1.0.1.4.10.15.7",
               "KEN.0.3.3.58.11", "AGO.1.0", "ago.1.0 ", "A.1", "", "x",
               "11A", "MWI.1.2.15.7B.12.8", "NBO.12345.1.C", "1.2.3.4.5.6.7.8"]
    samples += ["".join(rng.choice(alphabet) for _ in range(rng.randint(1, 24)))
                for _ in range(4000)]
    for s in samples:
        assert match_pattern_id(s) == naive_match(s), s
        # best_correction consistency: whatever it returns must validate,
        # and a None means the naive full fan-out also finds nothing
        norm = normalize_code(s)
        res = best_correction(norm)
        if res is not None:
            label, edits, pid = res
            assert match_pattern_id(label) == pid
            assert 0 <= edits <= 2


def test_deletion_index_match_equivalent_to_full_scan():
    """canonical_match's SymSpell-style candidate generation must return
    exactly what the full bucket scan returns, for hits and misses."""
    import random

    from ocr_auto_label_spark.labelcore.canonical import canonical_blocks
    from ocr_auto_label_spark.labelcore.fuzzy import (
        _within_one_edit,
        canonical_match,
        trigram_similarity,
    )

    def full_scan(label):
        segs = label.split(".")
        bucket = canonical_blocks().get((segs[0], len(segs)), ())
        best = None
        for canon in bucket:
            d = 1 if _within_one_edit(label, canon) else 2
            if d > 1:
                continue
            sim = trigram_similarity(label, canon)
            if best is None or (d, -sim, canon) < (best[0], -best[1], best[2]):
                best = (d, sim, canon)
        return (None, 0.0) if best is None else (best[2], round(best[1], 6))

    rng = random.Random(3)
    all_canon = [c for b in canonical_blocks().values() for c in b]
    samples = []
    for _ in range(600):
        c = rng.choice(all_canon)
        i = rng.randrange(len(c))
        op = rng.random()
        if op < 0.4:   # substitution
            s = c[:i] + rng.choice("0123456789ABXYZ.") + c[i + 1:]
        elif op < 0.7:  # deletion
            s = c[:i] + c[i + 1:]
        else:           # insertion
            s = c[:i] + rng.choice("0123456789ABXYZ.") + c[i:]
        samples.append(s)
    samples += ["ZZZ.9.9", "MWI", "", "MWI.0.1.4.10.15.77777"]
    for s in samples:
        if not s or s in set(all_canon):
            continue
        canonical_match.cache_clear()
        assert canonical_match(s) == full_scan(s), s


def test_x4_sql_twin_matches_python(spark):
    """The X4 SQL twin (functions/confusion_sql.py — the registered
    x4_confusion_repair entry) equals the pure-Python best_correction on
    the shared fixture, byte for byte.  The driver separately compares
    the Spark dialect against the DuckDB dialect; together the three
    formulations triangulate."""
    from ocr_auto_label_spark.functions.confusion_sql import (
        X4_FIXTURE_CODES,
        repair_select_sql,
    )
    from ocr_auto_label_spark.labelcore.grammar import normalize_code

    rows = spark.sql(repair_select_sql("spark", list(X4_FIXTURE_CODES))).collect()
    assert len(rows) == len(X4_FIXTURE_CODES)
    for r in rows:
        want = best_correction(normalize_code(r.code)) or (None, None, None)
        assert (r.repaired, r.edits, r.pattern_id) == want, r.code


def test_x4_sql_twin_matches_python_on_random_corruptions(spark):
    """Deterministic fuzz: corrupt canonical labels with confusion swaps
    and dropped periods, require SQL twin == Python on every token."""
    import random

    from ocr_auto_label_spark.functions.confusion_sql import repair_select_sql
    from ocr_auto_label_spark.labelcore.grammar import normalize_code

    rng = random.Random(7)
    tokens = []
    for label, _ in canonical_labels()[::17]:
        t = label
        for _ in range(rng.randint(0, 2)):
            kind = rng.random()
            if kind < 0.6:
                idxs = [i for i, ch in enumerate(t) if ch in _CONFUSE]
                if idxs:
                    i = rng.choice(idxs)
                    t = t[:i] + _CONFUSE[t[i]] + t[i + 1:]
            else:
                dots = [i for i, ch in enumerate(t) if ch == "."]
                if len(dots) > 1:
                    i = rng.choice(dots[1:])
                    t = t[:i] + t[i + 1:]
        tokens.append(t)
    rows = spark.sql(repair_select_sql("spark", tokens)).collect()
    for r in rows:
        want = best_correction(normalize_code(r.code)) or (None, None, None)
        assert (r.repaired, r.edits, r.pattern_id) == want, r.code


def test_x4_sql_twin_matches_python_on_junk(spark):
    """Adversarial fuzz: arbitrary strings over the confusion alphabet
    (dots, dashes, spaces, empty segments, long runs) — the SQL twin must
    equal Python best_correction on ALL of them, not just label-shaped
    tokens."""
    import random

    from ocr_auto_label_spark.functions.confusion_sql import repair_select_sql
    from ocr_auto_label_spark.labelcore.grammar import normalize_code

    rng = random.Random(23)
    alphabet = "MW1I0ODB8. -ken"
    tokens = ["".join(rng.choice(alphabet) for _ in range(rng.randint(0, 24)))
              for _ in range(60)]
    tokens += ["...", "MWI.", ".MWI", "MWI..0.1", "0", "00", "O" * 33]
    # de-dup while preserving order (duplicate VALUES rows are legal but
    # make the per-row assertion ambiguous)
    tokens = list(dict.fromkeys(tokens))
    rows = spark.sql(repair_select_sql("spark", tokens)).collect()
    assert len(rows) == len(tokens)
    for r in rows:
        want = best_correction(normalize_code(r.code)) or (None, None, None)
        assert (r.repaired, r.edits, r.pattern_id) == want, r.code
