"""Group inference: color families, meaningful words, and the window-based
single-pass operator vs a pure-Python snapshot oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from ocr_auto_label_spark.labelcore.inference import (
    extract_meaningful_words,
    get_color_family,
    has_matching_colors,
    has_matching_description,
    hex_to_hsl,
    infer_group,
)
from ocr_auto_label_spark.operators.inference import PROXIMITY, infer_groups


def test_hex_to_hsl_js_rounding():
    assert hex_to_hsl("#FF0000") == (0, 100, 50)
    assert hex_to_hsl("#00FF00") == (120, 100, 50)
    assert hex_to_hsl("0000FF") == (240, 100, 50)
    assert hex_to_hsl("#FFFFFF") == (0, 0, 100)
    assert hex_to_hsl("#000000") == (0, 0, 0)
    assert hex_to_hsl("not-hex") is None


def test_color_families():
    assert get_color_family("#FF0000") == "red"
    assert get_color_family("#0000FF") == "blue"
    assert get_color_family("#111111") == "black"   # l<25
    assert get_color_family("#F5F5F5") == "white"
    assert get_color_family("#808080") == "gray"
    # table order matters: dark orange hits 'red' first (h=15..30 overlap)
    assert get_color_family("#8B4513") in ("red", "orange", "brown")


def test_meaningful_words():
    # stopwords + len>2 filter (groupInference.ts:171-179)
    assert extract_meaningful_words("the quick brown fox") == ["quick", "brown", "fox"]
    assert extract_meaningful_words("a an to") == []
    assert extract_meaningful_words("it's blue-green!") == ["its", "bluegreen"]
    assert extract_meaningful_words(None) == []


def test_matching_description_needs_two_words():
    assert has_matching_description("blue plastic bottle", "blue plastic cup")
    assert not has_matching_description("blue bottle", "blue cup")  # only 1 shared
    assert not has_matching_description(None, "blue plastic cup")


def test_matching_colors_tiers():
    red, blue, white, black = "#FF0000", "#0000FF", "#FFFFFF", "#111111"
    assert has_matching_colors([red, white], [red, black])      # meaningful match
    assert not has_matching_colors([red], [blue])               # meaningful mismatch
    # both only neutral → neutral fallback
    assert has_matching_colors([white], [white])
    # meaningful vs neutral-only → never match (no cross-tier)
    assert not has_matching_colors([red], [white])
    # meaningful present on both but mismatched → NO neutral fallback
    assert not has_matching_colors([red, white], [blue, white])
    assert not has_matching_colors([], [red])


def test_infer_group_most_recent_wins():
    n = [
        {"group": "G1", "desc": "blue plastic cup", "colors": ["#0000FF"], "ts_ms": 100},
        {"group": "G2", "desc": "blue plastic cup", "colors": ["#0000FF"], "ts_ms": 300},
        {"group": "G3", "desc": "red metal fork", "colors": ["#FF0000"], "ts_ms": 500},
    ]
    got = infer_group("blue plastic bottle", ["#0000EE"], n)
    assert got == "G2"  # matches G1+G2; most recent of those wins


def _fixture(n=80, seed=9):
    rng = np.random.default_rng(seed)
    descs = ["blue plastic cup", "blue plastic bottle", "red metal fork", "green glass jar"]
    colsets = [["#0000FF"], ["#0000EE", "#FFFFFF"], ["#FF0000"], ["#00FF00"]]
    rows = []
    for i in range(n):
        di = int(rng.integers(len(descs)))
        labeled = rng.random() < 0.5
        rows.append({
            "id": f"x{i:03d}",
            "original_name": f"IMG_{int(rng.integers(10**6)):06d}.jpg",
            "ts_ms": int(rng.integers(10**6)),
            "group": f"G{int(rng.integers(6))}" if labeled else None,
            "desc": descs[di],
            "colors": colsets[di],
        })
    return pd.DataFrame(rows)


def _python_oracle(pdf: pd.DataFrame) -> dict[str, str | None]:
    """The reference pass: snapshot ordered by originalName, ±9 slice."""
    rows = pdf.sort_values(["original_name", "id"]).to_dict("records")
    out = {}
    for i, row in enumerate(rows):
        if row["group"] and str(row["group"]).strip():
            continue
        lo, hi = max(0, i - PROXIMITY), min(len(rows) - 1, i + PROXIMITY)
        neighbors = [
            {"group": r["group"], "desc": r["desc"], "colors": r["colors"], "ts_ms": r["ts_ms"]}
            for r in rows[lo:hi + 1] if r["id"] != row["id"]
        ]
        out[row["id"]] = infer_group(row["desc"], row["colors"], neighbors)
    return out


@pytest.mark.parametrize("seed", [9, 23])
def test_spark_inference_equals_snapshot_oracle(spark, seed):
    pdf = _fixture(seed=seed)
    want = _python_oracle(pdf)
    sdf = spark.createDataFrame(
        pdf, "id: string, original_name: string, ts_ms: long, group: string, "
             "desc: string, colors: array<string>")
    got = {r.id: r.inferred_group for r in infer_groups(sdf).collect()
           if r.group is None}
    assert got == want
    assert any(v is not None for v in want.values()), "fixture must infer something"


def test_cached_pair_predicates_equivalent():
    """_desc_match_cached / _colors_match_cached == the uncached reference
    predicates over randomized inputs."""
    import random

    from ocr_auto_label_spark.labelcore.inference import (
        _colors_match_cached,
        _desc_match_cached,
        has_matching_colors,
        has_matching_description,
    )

    rng = random.Random(23)
    descs = [None, "", "red notebook cover photo", "the a an of notebook cover",
             "red red notebook", "tiny", "notebook cover red extras here",
             "Shiny RED Notebook-Cover!", "cover cover cover"]
    pals = [None, [], ["#FF0000"], ["#FF0000", "#00FF00"], ["#FFFFFF"],
            ["#808080", "#000000"], ["zzz"], ["#D2B48C"], ["#FF0000", "#FFFFFF",
            "#00FF00", "#0000FF"]]
    for _ in range(4000):
        d1, d2 = rng.choice(descs), rng.choice(descs)
        c1, c2 = rng.choice(pals), rng.choice(pals)
        assert _desc_match_cached(d1, d2) == has_matching_description(d1, d2), (d1, d2)
        t1 = tuple(c1) if c1 is not None else None
        t2 = tuple(c2) if c2 is not None else None
        assert _colors_match_cached(t1, t2) == has_matching_colors(c1, c2), (c1, c2)
