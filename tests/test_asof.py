"""As-of join (operators/asof.py) vs pandas.merge_asof — a third
independent implementation of the semantics (the driver oracle is
DuckDB's native ASOF JOIN) — plus the tie/inclusivity/tolerance edges.
"""

from __future__ import annotations

import pandas as pd
import pytest

from ocr_auto_label_spark.operators.asof import asof_join


def _pd_asof(purch, clicks, tol_us=None):
    """pandas twin: right deduped to max id per (user, ts) — the
    operator's documented tie-break — then backward inclusive asof."""
    r = (
        clicks.groupby(["user_id", "ts"], as_index=False)["event_id"]
        .max()
        .rename(columns={"event_id": "r_id"})
        .sort_values("ts", kind="stable")
    )
    got = pd.merge_asof(
        purch.sort_values("ts", kind="stable"),
        r,
        on="ts",
        by="user_id",
        direction="backward",
        allow_exact_matches=True,
        tolerance=(pd.Timedelta(microseconds=tol_us)
                   if tol_us is not None else None),
        suffixes=("", "_r"),
    )
    out = {}
    for row in got.itertuples():
        if pd.isna(row.r_id):
            out[row.event_id] = (None, None)
        else:
            rt = r[(r.user_id == row.user_id) & (r.r_id == row.r_id)]
            gap = int((row.ts - rt.iloc[0].ts).value // 1000)
            out[row.event_id] = (int(row.r_id), gap)
    return out


def test_asof_matches_pandas_on_fixture_events(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    pdf = ev.select("event_id", "user_id", "ts", "event_type").toPandas()
    purch = pdf[pdf.event_type == "purchase"].drop(columns=["event_type"])
    clicks = pdf[pdf.event_type == "click"].drop(columns=["event_type"])
    for tol in (None, 3_600_000_000):
        want = _pd_asof(purch, clicks, tol)
        got = {
            r.event_id: (r.asof_event_id, r.asof_gap_us)
            for r in asof_join(
                ev.filter("event_type = 'purchase'")
                .select("event_id", "user_id", "ts"),
                ev.filter("event_type = 'click'"),
                on=["user_id"],
                tolerance_us=tol,
            ).collect()
        }
        assert got == want, tol
    assert any(v != (None, None) for v in want.values())
    assert any(v == (None, None) for v in want.values())


def test_asof_edges_ties_inclusive_tolerance(spark):
    # left at t=100 must match a right row at exactly t=100 (inclusive);
    # two right rows at the same ts -> max id wins; gap == tolerance
    # survives, gap > tolerance nulls out
    rows_l = [(1, 7, "2024-01-01 00:00:00.000100"),
              (2, 7, "2024-01-01 00:00:00.000500"),
              (3, 8, "2024-01-01 00:00:00.000050")]
    rows_r = [(10, 7, "2024-01-01 00:00:00.000100"),
              (11, 7, "2024-01-01 00:00:00.000100"),
              (12, 7, "2024-01-01 00:00:00.000200"),
              (13, 9, "2024-01-01 00:00:00.000010")]
    l = spark.createDataFrame(rows_l, "event_id long, user_id long, s string") \
        .selectExpr("event_id", "user_id", "CAST(s AS TIMESTAMP) AS ts")
    r = spark.createDataFrame(rows_r, "event_id long, user_id long, s string") \
        .selectExpr("event_id", "user_id", "CAST(s AS TIMESTAMP) AS ts")
    got = {
        x.event_id: (x.asof_event_id, x.asof_gap_us)
        for x in asof_join(l, r, on=["user_id"]).collect()
    }
    assert got == {1: (11, 0), 2: (12, 300), 3: (None, None)}
    got_tol = {
        x.event_id: (x.asof_event_id, x.asof_gap_us)
        for x in asof_join(l, r, on=["user_id"], tolerance_us=300).collect()
    }
    assert got_tol[2] == (12, 300)  # boundary is inclusive
    got_tight = {
        x.event_id: (x.asof_event_id, x.asof_gap_us)
        for x in asof_join(l, r, on=["user_id"], tolerance_us=299).collect()
    }
    assert got_tight[2] == (None, None)
    with pytest.raises(ValueError):
        asof_join(l, r, on=[])
    with pytest.raises(ValueError):
        asof_join(l, r, on=["user_id"], tolerance_us=-1)
