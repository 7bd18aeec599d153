"""E2 composed lifecycle (group move → re-index old+new groups → status
recompute) vs a pure-Python port of the reference's per-row loop
(images.ts:387-455 PUT + reindexGroup images.ts:39-59)."""

from __future__ import annotations

from ocr_auto_label_spark.labelcore.grammar import is_valid_sample_code
from ocr_auto_label_spark.labelcore.naming import (
    ext_last_dot,
    sanitize_filename,
    webapp_ordinal_name,
)
from ocr_auto_label_spark.operators.lifecycle import apply_group_moves

COLS = "id: long, group: string, original_name: string, created_at: long, " \
       "status: string, grouping_confidence: double, new_name: string"


def _ref_apply(rows: list[dict], moves: dict[int, str | None]) -> list[dict]:
    """Per-row port of the reference PUT-then-reindex loop."""
    rows = [dict(r) for r in rows]
    by_id = {r["id"]: r for r in rows}
    affected: set[str] = set()
    for mid, g in moves.items():
        img = by_id[mid]
        old = img["group"]
        if g is not None and g.strip():
            img["group"] = g
            img["grouping_confidence"] = 1.0
            img["status"] = "user_grouped" if is_valid_sample_code(g) else "invalid_group"
            affected.add(g)
        else:
            img["group"] = None
            img["new_name"] = ""
            img["grouping_confidence"] = 0.0
            img["status"] = "ungrouped"
        if old is not None and old.strip():
            affected.add(old)
    for g in affected:  # reindexGroup per group, createdAt order
        members = sorted(
            (r for r in rows if r["group"] == g),
            key=lambda r: (r["created_at"], r["id"]),
        )
        for i, r in enumerate(members):
            r["new_name"] = webapp_ordinal_name(g, i, r["original_name"])
    return rows


def _rows():
    return [
        # group gA: 3 members, one will move away
        {"id": 1, "group": "gA", "original_name": "a1.jpg", "created_at": 10,
         "status": "auto_grouped", "grouping_confidence": 0.5, "new_name": "gA.jpg"},
        {"id": 2, "group": "gA", "original_name": "a2.jpg", "created_at": 20,
         "status": "auto_grouped", "grouping_confidence": 0.5, "new_name": "gA_2.jpg"},
        {"id": 3, "group": "gA", "original_name": "a3.png", "created_at": 30,
         "status": "auto_grouped", "grouping_confidence": 0.5, "new_name": "gA_3.png"},
        # group MWI.0.1.4.10.15.7 (valid sample code): receives a mover
        {"id": 4, "group": "MWI.0.1.4.10.15.7", "original_name": "b1.jpg",
         "created_at": 5, "status": "user_grouped", "grouping_confidence": 1.0,
         "new_name": "MWI.0.1.4.10.15.7.jpg"},
        # untouched group with a deliberately STALE name: must stay stale
        {"id": 5, "group": "gC", "original_name": "c1.jpg", "created_at": 1,
         "status": "auto_grouped", "grouping_confidence": 0.5, "new_name": "stale_name.jpg"},
        # ungrouped row, not moved
        {"id": 6, "group": None, "original_name": "d1.jpg", "created_at": 2,
         "status": "pending", "grouping_confidence": None, "new_name": ""},
    ]


MOVES = {
    2: "MWI.0.1.4.10.15.7",  # into a valid-code group → user_grouped
    3: "bad group!",          # new invalid-name group → invalid_group
    1: "",                    # ungroup → status ungrouped, name ''
}


def test_apply_group_moves_matches_reference_loop(spark):
    df = spark.createDataFrame(
        [tuple(r.values()) for r in _rows()], COLS
    )
    moves = spark.createDataFrame(
        [(k, v) for k, v in MOVES.items()], "id: long, new_group: string"
    )
    got = {
        r["id"]: r.asDict()
        for r in apply_group_moves(df, moves).collect()
    }
    want = {r["id"]: r for r in _ref_apply(_rows(), MOVES)}
    assert set(got) == set(want)
    for rid in sorted(want):
        for col in ("group", "status", "grouping_confidence", "new_name"):
            assert got[rid][col] == want[rid][col], (rid, col, got[rid], want[rid])


def test_unaffected_group_keeps_stale_name(spark):
    """reindexGroup only touches old+new groups — gC's stale name must
    survive (the reference does NOT globally re-index)."""
    df = spark.createDataFrame([tuple(r.values()) for r in _rows()], COLS)
    moves = spark.createDataFrame([(2, "MWI.0.1.4.10.15.7")], "id: long, new_group: string")
    out = {r["id"]: r.asDict() for r in apply_group_moves(df, moves).collect()}
    assert out[5]["new_name"] == "stale_name.jpg"
    assert out[6]["new_name"] == ""


def test_pure_python_twins_agree():
    assert sanitize_filename("bad group!") == "bad_group!"
    assert ext_last_dot("x.tar.gz") == ".gz"


def test_old_group_column_path_identical(spark):
    """moves carrying old_group (no derive-join) must produce exactly the
    same result as deriving old groups from df."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([tuple(r.values()) for r in _rows()], COLS)
    plain = spark.createDataFrame(
        [(k, v) for k, v in MOVES.items()], "id: long, new_group: string"
    )
    old_map = {r["id"]: r["group"] for r in _rows()}
    with_old = spark.createDataFrame(
        [(k, v, old_map[k]) for k, v in MOVES.items()],
        "id: long, new_group: string, old_group: string",
    )
    a = sorted(map(tuple, apply_group_moves(df, plain).collect()))
    b = sorted(map(tuple, apply_group_moves(df, with_old).collect()))
    assert a == b


def test_duplicate_move_ids_rejected(spark):
    import pytest

    df = spark.createDataFrame([tuple(r.values()) for r in _rows()], COLS)
    dup = spark.createDataFrame(
        [(2, "gA"), (2, "gC")], "id: long, new_group: string"
    )
    with pytest.raises(ValueError, match="duplicate ids"):
        apply_group_moves(df, dup)
