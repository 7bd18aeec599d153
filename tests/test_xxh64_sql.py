"""The DuckDB-SQL XXH64 (functions/xxh64_sql.py) must be bit-exact
against BOTH a pure-Python XXH64 reference implemented straight from the
public spec AND Spark's own ``F.xxhash64``, across inputs crossing every
code path (empty, <4, <8, <32 bytes, one stripe, multi-stripe, every
tail shape) and the chained (string, int) form the MinHash family uses."""

from __future__ import annotations

import random

import duckdb

from ocr_auto_label_spark.functions.xxh64_sql import (
    apply_stages,
    to_signed,
    xxh64_int4_u,
    xxh64_long8_stages,
    xxh64_str_staged_sql,
)

M = (1 << 64) - 1
P1, P2, P3, P4, P5 = (0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F,
                      0x165667B19E3779F9, 0x85EBCA77C2B2AE63, 0x27D4EB2F165667C5)


def _rotl(x, n):
    return ((x << n) | (x >> (64 - n))) & M


def _round(acc, inp):
    return (_rotl((acc + inp * P2) & M, 31) * P1) & M


def _merge(acc, v):
    return ((acc ^ _round(0, v)) * P1 + P4) & M


def xxh64_ref(data: bytes, seed: int) -> int:
    """Pure-Python XXH64 (Collet's spec), independent of both engines."""
    n, i = len(data), 0
    if n >= 32:
        v = [(seed + P1 + P2) & M, (seed + P2) & M, seed & M, (seed - P1) & M]
        while i + 32 <= n:
            for k in range(4):
                v[k] = _round(v[k], int.from_bytes(data[i:i + 8], "little"))
                i += 8
        acc = (_rotl(v[0], 1) + _rotl(v[1], 7) + _rotl(v[2], 12) + _rotl(v[3], 18)) & M
        for k in range(4):
            acc = _merge(acc, v[k])
    else:
        acc = (seed + P5) & M
    acc = (acc + n) & M
    while i + 8 <= n:
        acc = (_rotl(acc ^ _round(0, int.from_bytes(data[i:i + 8], "little")), 27) * P1 + P4) & M
        i += 8
    if i + 4 <= n:
        acc = (_rotl(acc ^ ((int.from_bytes(data[i:i + 4], "little") * P1) & M), 23) * P2 + P3) & M
        i += 4
    while i < n:
        acc = (_rotl(acc ^ ((data[i] * P5) & M), 11) * P1) & M
        i += 1
    acc ^= acc >> 33
    acc = (acc * P2) & M
    acc ^= acc >> 29
    acc = (acc * P3) & M
    acc ^= acc >> 32
    return acc


def _signed(h):
    return h - (1 << 64) if h >= (1 << 63) else h


def _fixture_strings():
    rng = random.Random(7)
    fixed = ["", "a", "abc", "abcd", "abcdefg", "abcdefgh",
             "x" * 31, "x" * 32, "x" * 33, "y" * 64, "z" * 65,
             "[-123,456,-789012345678,9]"]
    rand = ["".join(rng.choice("abcXYZ019 .,-[]") for _ in range(rng.randint(0, 120)))
            for _ in range(60)]
    return fixed + rand


def test_duck_xxh64_matches_python_reference():
    strs = _fixture_strings()
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT unnest($1) AS s", [strs])
    q = xxh64_str_staged_sql("FROM t", "s", seed="42")
    chained = ", ".join(
        to_signed(xxh64_int4_u(str(i), "__xxh_u")) + f" AS h{i}" for i in range(3)
    )
    rows = con.sql(
        f"SELECT s, {to_signed('__xxh_u')} AS h, {chained} FROM ({q}) z"
    ).fetchall()
    assert len(rows) == len(strs)
    for s, h, h0, h1, h2 in rows:
        base = xxh64_ref(s.encode(), 42)
        assert h == _signed(base), f"string path diverges on {s!r}"
        for i, got in enumerate((h0, h1, h2)):
            want = _signed(xxh64_ref(i.to_bytes(4, "little"), base))
            assert got == want, f"chained int path diverges on {s!r}, {i}"


def test_duck_xxh64_matches_spark(spark):
    from pyspark.sql import functions as F

    strs = [s for s in _fixture_strings() if s]  # createDataFrame rejects no rows anyway
    sdf = spark.createDataFrame([(s,) for s in strs], "s: string")
    want = {
        r.s: (r.h, r.h1)
        for r in sdf.select(
            "s", F.xxhash64("s").alias("h"),
            F.xxhash64(F.col("s"), F.lit(7)).alias("h1"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT unnest($1) AS s", [strs])
    q = xxh64_str_staged_sql("FROM t", "s", seed="42")
    rows = con.sql(
        f"SELECT s, {to_signed('__xxh_u')} AS h, "
        f"{to_signed(xxh64_int4_u('7', '__xxh_u'))} AS h1 FROM ({q}) z"
    ).fetchall()
    for s, h, h1 in rows:
        assert (h, h1) == want[s], f"spark parity diverges on {s!r}"


def _fixture_longs():
    rng = random.Random(13)
    fixed = [0, 1, -1, 42, 499, 2**31, -2**31, 2**63 - 1, -2**63]
    return fixed + [rng.randint(-2**63, 2**63 - 1) for _ in range(60)]


def test_duck_xxh64_long8_matches_python_reference():
    """LongType path (Spark XXH64.hashLong — 8-byte LE word): the staged
    DuckDB SQL must match the from-spec Python reference, including
    negative longs (two's-complement word)."""
    import struct

    longs = _fixture_longs()
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT unnest($1::BIGINT[]) AS l", [longs])
    q = apply_stages("SELECT l FROM t", xxh64_long8_stages("l", "42"))
    rows = con.sql(f"SELECT l, {to_signed('__l8_u')} AS h FROM ({q}) z").fetchall()
    assert len(rows) == len(longs)
    for l, h in rows:
        want = _signed(xxh64_ref(struct.pack("<q", l), 42))
        assert h == want, f"long8 path diverges on {l}"


def test_duck_xxh64_long8_matches_spark(spark):
    from pyspark.sql import functions as F

    longs = _fixture_longs()
    sdf = spark.createDataFrame([(l,) for l in longs], "l: long")
    want = {r.l: r.h for r in sdf.select("l", F.xxhash64("l").alias("h")).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT unnest($1::BIGINT[]) AS l", [longs])
    q = apply_stages("SELECT l FROM t", xxh64_long8_stages("l", "42"))
    for l, h in con.sql(f"SELECT l, {to_signed('__l8_u')} AS h FROM ({q}) z").fetchall():
        assert h == want[l], f"spark long parity diverges on {l}"


def test_non_ascii_input_raises_loudly():
    """The unicode(s[i]) byte access is ASCII-only; the staged query must
    REFUSE non-ASCII input (error()) rather than silently hash code
    points (review r4)."""
    import pytest

    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT 'café' AS s")
    q = xxh64_str_staged_sql("FROM t", "s")
    with pytest.raises(Exception, match="non-ASCII"):
        con.sql(f"SELECT __xxh_u FROM ({q}) z").fetchall()


def test_hashed_corpora_are_ascii():
    """Every corpus column the xxh64 oracles hash must be ASCII — the
    pinned transcripts (conv_id) and both sf documents tables (text)."""
    import os

    from ocr_auto_label_spark.datagen import transcripts_parquet

    con = duckdb.connect()
    p = transcripts_parquet(2_000)
    assert con.sql(
        f"SELECT count(*) FROM read_parquet('{p}/*.parquet') "
        "WHERE length(conv_id) <> octet_length(encode(conv_id))"
    ).fetchone()[0] == 0
    for sf in ("sf0.001", "sf0.01"):
        d = f"/root/testdata/{sf}/documents.parquet"
        if not os.path.exists(d):
            continue
        assert con.sql(
            f"SELECT count(*) FROM '{d}' "
            "WHERE length(text) <> octet_length(encode(text))"
        ).fetchone()[0] == 0, f"non-ASCII text in {sf}"
