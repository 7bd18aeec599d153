"""Hypothesis property tests for the DuckDB-SQL XXH64 family.

The fixed-vector tests in test_xxh64_sql.py pin every code path once;
these let hypothesis hunt the boundaries (stripe edges, tail shapes,
sign wrap, ASCII extremes) with batched DuckDB executions — one query
per generated batch, so hundreds of cases cost a handful of queries.
No Spark involved: the SQL is compared against the from-spec python
reference, which test_duck_xxh64_matches_spark already ties to Spark.
"""

from __future__ import annotations

import struct

import duckdb
from hypothesis import given, settings, strategies as st

from ocr_auto_label_spark.functions.xxh64_sql import (
    apply_stages,
    to_signed,
    xxh64_long8_stages,
    xxh64_str_staged_sql,
)
from test_xxh64_sql import xxh64_ref


def _signed(u: int) -> int:
    return u - 2**64 if u >= 2**63 else u


# printable-ASCII strings crossing every length regime the spec branches
# on: empty, <4, <8, <32, exactly one stripe, stripe+tail, multi-stripe
ascii_text = st.text(
    alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x7E),
    min_size=0,
    max_size=100,
)


@settings(max_examples=30, deadline=None)
@given(st.lists(ascii_text, min_size=1, max_size=40), st.integers(0, 2**31 - 1))
def test_str_path_matches_reference(strings, seed):
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT unnest($1::VARCHAR[]) AS s", [strings])
    q = xxh64_str_staged_sql("FROM t", "s", seed=str(seed))
    got = con.sql(f"SELECT s, {to_signed('__xxh_u')} AS h FROM ({q}) z").fetchall()
    want = {s: _signed(xxh64_ref(s.encode(), seed)) for s in strings}
    assert len(got) == len(strings)
    for s, h in got:
        assert h == want[s], repr(s)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(-2**63, 2**63 - 1), min_size=1, max_size=60))
def test_long8_path_matches_reference(longs):
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT unnest($1::BIGINT[]) AS l", [longs])
    q = apply_stages("SELECT l FROM t", xxh64_long8_stages("l", "42"))
    got = con.sql(f"SELECT l, {to_signed('__l8_u')} AS h FROM ({q}) z").fetchall()
    want = {l: _signed(xxh64_ref(struct.pack("<q", l), 42)) for l in longs}
    for l, h in got:
        assert h == want[l], l


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(-2**63, 2**63 - 1), min_size=1, max_size=60))
def test_split_bucket_arithmetic_matches_python(longs):
    """The full split-assignment arithmetic (hash → signed → pmod 100 →
    threshold) as one SQL expression vs pure python — the exact chain
    deterministic_split / the dedup_exact_hash oracle rely on."""
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT unnest($1::BIGINT[]) AS l", [longs])
    q = apply_stages("SELECT l FROM t", xxh64_long8_stages("l", "42"))
    got = con.sql(
        f"SELECT l, (({to_signed('__l8_u')} % 100) + 100) % 100 AS b FROM ({q}) z"
    ).fetchall()
    for l, b in got:
        s = _signed(xxh64_ref(struct.pack("<q", l), 42))
        assert b == ((s % 100) + 100) % 100, l
        assert 0 <= b < 100
