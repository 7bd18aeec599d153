"""Grammar truth table incl. reference quirks (SURVEY.md X2, FIXTURES.md §3.4)."""

from __future__ import annotations

import pytest
from hypothesis import given, strategies as st

from ocr_auto_label_spark.labelcore.canonical import canonical_labels
from ocr_auto_label_spark.labelcore.grammar import (
    is_valid_sample_code,
    js_parse_int,
    match_pattern_id,
    normalize_code,
)


@pytest.mark.parametrize("code,valid", [
    # one clean example per reachable pattern (sampleCodePatterns.ts:35-104)
    ("AGO.1.0", True),
    ("MWI.1.2.15.7B.12.8", True),
    ("MWI.0.1.4.10.15.7", True),
    ("KEN.0.2.3.5.8.11", True),
    # trim + upper (sampleCodePatterns.ts:114)
    (" ago.1.0 ", True),
    ("mwi.1.2.15.7b.12.8", True),
    # parseInt quirk: range segment accepts trailing letters (ts:142-149)
    ("MWI.0.1.4.10B.15.7", True),
    ("KEN.0.2.3.5X.8.11", True),
    # kenya_new_format unreachable (ts:98,101,115,138)
    ("NBO-12345-1-C", False),
    ("NBO.12345.1.C", False),
    ("BUS.54321.9.G", False),
    # range violations
    ("MWI.1.4.15.7B.12.8", False),   # region 4 > 3
    ("MWI.1.2.25.7B.12.8", False),   # area 25 > 24
    ("MWI.1.2.15.11B.12.8", False),  # sample 11 > 10
    ("MWI.1.2.15.7E.12.8", False),   # letter E not in A-D
    ("MWI.1.2.15.10.12.8", False),   # rangeWithLetters needs a letter
    ("MWI.9.9.99.99.99.99", False),  # noise
    ("KEN.0.3.3.5.8.11", False),     # KEN region 3 > 2
    # structure violations
    ("MWI.1.2.15.7B.12", False),     # wrong segment count
    ("AGO.1", False),
    ("AG.1.0", False),               # country must be 3 letters
    ("AGOX.1.0", False),
    ("", False),
    (None, False),
    ("AGO..0", False),               # empty segment
])
def test_validator_truth_table(code, valid):
    assert is_valid_sample_code(code) is valid


def test_pattern_ids():
    assert match_pattern_id("AGO.1.0") == "generic_3_digit"
    assert match_pattern_id("MWI.1.2.15.7B.12.8") == "mwi_type_1"
    assert match_pattern_id("MWI.0.1.4.10.15.7") == "mwi_type_0"
    assert match_pattern_id("KEN.0.2.3.5.8.11") == "ken_type_0"
    # MWI.0... also matches generic? No: generic needs 3 segments.
    assert match_pattern_id("MWI.1.2") == "generic_3_digit"


def test_js_parse_int():
    assert js_parse_int("10B") == 10          # parseInt('10B') === 10
    assert js_parse_int("  7 ") == 7
    assert js_parse_int("B10") is None        # NaN
    assert js_parse_int("-3") == -3
    assert js_parse_int("") is None


def test_normalize():
    assert normalize_code(" ago.1.0 ") == "AGO.1.0"


def test_all_canonical_labels_validate():
    """The canonical table is grammar-derived: every member must validate
    and carry its generating pattern id."""
    for label, pattern_id in canonical_labels():
        assert match_pattern_id(label) == pattern_id, label


@given(st.sampled_from([label for label, _ in canonical_labels()]))
def test_property_canonical_always_valid(label):
    assert is_valid_sample_code(label)
    # lowercase + whitespace-wrapped still valid (trim+upper)
    assert is_valid_sample_code(f"  {label.lower()} ")
