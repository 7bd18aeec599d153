"""Naming rules (X5/X6/W1/A1) and grouping-score ingredients (X7-X11)."""

from __future__ import annotations

from ocr_auto_label_spark.labelcore.naming import (
    ext_first_dot,
    ext_last_dot,
    notebook_ordinal_name,
    sanitize_filename,
    webapp_ordinal_name,
)
from ocr_auto_label_spark.labelcore.similarity import (
    color_similarity,
    colors_are_similar,
    grouping_score,
    normalize_color,
    text_similarity,
)


def test_sanitize_filename():
    # upload.ts:524-537 step for step
    assert sanitize_filename("  my file  ") == "my_file"
    assert sanitize_filename('a<b>:c"/d\\e|f?g*h') == "abcdefgh"
    assert sanitize_filename("a   b") == "a_b"
    assert sanitize_filename("__a__b__") == "a_b"
    assert sanitize_filename("???") == "untitled"
    assert sanitize_filename("") == "untitled"


def test_extension_variants_conflict():
    # X6: webapp last-dot vs notebook first-dot — both preserved
    assert ext_last_dot("photo.MP.JPG") == ".JPG"
    assert ext_first_dot("photo.MP.JPG") == "MP.JPG"
    assert ext_last_dot("noext") == ""
    assert ext_first_dot("noext") == "jpg"       # notebook default
    assert ext_last_dot(".dotfile") == ""         # path.extname('.dotfile') === ''


def test_webapp_ordinal_rule():
    # upload.ts:697-699: first member bare, then _2, _3, ...
    assert webapp_ordinal_name("MWI.1.2", 0, "a.jpg") == "MWI.1.2.jpg"
    assert webapp_ordinal_name("MWI.1.2", 1, "a.jpg") == "MWI.1.2_2.jpg"
    assert webapp_ordinal_name("MWI.1.2", 4, "a.jpg") == "MWI.1.2_5.jpg"


def test_notebook_ordinal_rule():
    # rename_photos.ipynb cell 4: every member numbered from _1
    assert notebook_ordinal_name("MWI.1.2", 1, "a.jpg") == "MWI.1.2_1.jpg"
    assert notebook_ordinal_name("MWI.1.2", 2, "a.MP.JPG") == "MWI.1.2_2.MP.JPG"


def test_text_similarity_duplicate_counting():
    # grouping.ts:309-324: duplicates count; denominator is max token count
    assert text_similarity("blue spoon", "blue spoon") == 1.0
    assert text_similarity("blue blue", "blue spoon") == 1.0  # both words match 'blue'
    assert text_similarity("blue spoon", "red fork") == 0.0
    assert text_similarity("a b c d", "a b") == 0.5
    assert text_similarity(None, "x") == 0.0


def test_color_normalization_and_synonyms():
    assert normalize_color("Dark Orange") == "orange"
    assert colors_are_similar("light blue", "BLUE")
    assert colors_are_similar("orange", "dark orange")   # containment
    assert colors_are_similar("brown", "tan")            # synonym group
    assert not colors_are_similar("red", "blue")


def test_color_similarity_first_match_counted_once():
    # grouping.ts:243-259
    assert color_similarity(["blue", "red"], ["navy", "crimson"]) == 1.0
    assert color_similarity(["blue"], ["red", "blue", "green"]) == 1 / 3
    assert color_similarity([], ["red"]) == 0.0


def test_grouping_score_tiers_and_threshold():
    # desc tiers 0.8/0.6/0.3 (grouping.ts:162-177), color ×0.6 (:179-185),
    # time decay ×0.2 (:187-190)
    s = grouping_score("blue spoon", "blue spoon", [], [], 0)
    assert abs(s - 1.0) < 1e-9  # 0.8 desc + 0.2 time
    s = grouping_score(None, None, ["blue"], ["navy"], 120_000)
    assert abs(s - 0.6) < 1e-9  # color 1.0*0.6, time decay 0
    s = grouping_score(None, None, [], [], 60_000)
    assert abs(s - 0.1) < 1e-9  # time only: (1-0.5)*0.2
