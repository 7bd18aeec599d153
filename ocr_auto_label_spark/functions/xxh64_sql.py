"""XXH64 compiled to DuckDB SQL — the missing oracle primitive.

Spark's ``xxhash64`` (the engine's sketch/bucketing hash — MinHash
families, SimHash bits, fingerprints, lineage buckets) is standard XXH64
(Collet's public spec; Spark hashes strings as UTF-8 bytes, ints as
4-byte little-endian, and chains multi-arg calls by feeding the running
hash in as the next seed, starting from 42).  DuckDB has no xxhash64, so
every sketch entry was rows-only ("no DuckDB analog").  This module
REMOVES that analog gap: it emits DuckDB SQL computing bit-exact XXH64
from first principles.

DuckDB v1.0 constraints shape the encoding:

- no UHUGEINT and no wrapping arithmetic → all 64-bit modular math runs
  in signed HUGEINT (int128) with explicit ``% 2^64``; 64×64-bit
  multiplication splits the left operand into 32-bit limbs so no product
  exceeds 2^96;
- no BLOB indexing → bytes come from ``unicode(s[i])`` per character,
  which equals the UTF-8 byte only for ASCII — the staged query GUARDS
  this (length vs octet_length mismatch raises via ``error()`` instead
  of silently hashing code points), and the corpora are pytest-asserted
  ASCII;
- no list_reduce initial-value → the accumulator is ``list_prepend``-ed
  so the fold's first element IS the init (32-byte stripes fold over
  ``[v1..v4]`` lane lists, tails fold over scalar words);
- bitwise xor exists only for UBIGINT → values round-trip through
  ``CAST(x AS UBIGINT)`` at xor/shift sites (always < 2^64, safe).

``tests/test_xxh64_sql.py`` checks the generated SQL against BOTH a
pure-Python XXH64 reference and Spark's own ``F.xxhash64`` over
random-length inputs crossing every code path (empty, <4, <8, <32,
multi-stripe, all tail shapes) and chained string+int calls.
"""

from __future__ import annotations

W = "18446744073709551616"        # 2^64
H = "9223372036854775808"         # 2^63
TWO32 = "4294967296"
P1 = "11400714785074694791"
P2 = "14029467366897019727"
P3 = "1609587929392839161"
P4 = "9650029242287828579"
P5 = "2870177450012600261"


def _madd(*xs: str) -> str:
    return "((" + " + ".join(xs) + f") % {W})"


def _mmul(a: str, b: str) -> str:
    return (
        f"((({a}) % {TWO32}) * ({b}) "
        f"+ (((({a}) // {TWO32}) * ({b})) % {TWO32}) * {TWO32}) % {W}"
    )


def _rotl(x: str, r: int) -> str:
    lo = 2 ** (64 - r)
    return f"((({x}) % {lo}) * {2 ** r} + ({x}) // {lo})"


def _xor(a: str, b: str) -> str:
    return (
        f"CAST(xor(CAST(({a}) AS UBIGINT), CAST(({b}) AS UBIGINT)) AS HUGEINT)"
    )


def _shr(x: str, k: int) -> str:
    return f"(({x}) // {2 ** k})"


def _round(acc: str, w: str) -> str:
    return _mmul(_rotl(_madd(acc, _mmul(w, P2)), 31), P1)


def _merge(acc: str, v: str) -> str:
    return _madd(_mmul(_xor(acc, _round("0", v)), P1), P4)


def _w8(b: str, pos: str) -> str:
    """Little-endian 8-byte word from 1-based position ``pos`` of byte
    list ``b`` (sum < 2^64, no mod needed)."""
    return "(" + " + ".join(
        f"({b})[({pos}) + {k}] * {256 ** k}" for k in range(8)
    ) + ")"


def _w4(b: str, pos: str) -> str:
    return "(" + " + ".join(
        f"({b})[({pos}) + {k}] * {256 ** k}" for k in range(4)
    ) + ")"


def bytes_expr(s: str) -> str:
    """ASCII byte list of string expression ``s`` (1-based)."""
    return (
        f"list_transform(range(1, length({s}) + 1), "
        f"i -> CAST(unicode(({s})[i]) AS HUGEINT))"
    )


def avalanche(acc: str) -> str:
    x = _xor(acc, _shr(acc, 33))
    x = _mmul(x, P2)
    x = _xor(x, _shr(x, 29))
    x = _mmul(x, P3)
    return _xor(x, _shr(x, 32))


def xxh64_stages(b: str, n: str, seed: str) -> list[tuple[str, str]]:
    """Staged column expressions computing unsigned XXH64 of the byte
    list ``b`` (length ``n``) with HUGEINT seed expression ``seed``.
    Returns [(col_name, expr)] to splice into a chain of SELECTs; the
    final column is ``__xxh_u`` in [0, 2^64)."""
    v1 = _madd(seed, P1, P2)
    v2 = _madd(seed, P2)
    v3 = f"(({seed}) % {W})"
    v4 = _madd(seed, f"({W} - {P1})")
    stripe_words = (
        f"list_transform(range(0, ({n}) // 32), si -> ["
        + ", ".join(_w8(b, f"32 * si + {1 + 8 * k}") for k in range(4))
        + "])"
    )
    lanes = ", ".join(
        _round(f"acc[{k + 1}]", f"st[{k + 1}]") for k in range(4)
    )
    stripe_fold = (
        f"list_reduce(list_prepend([{v1}, {v2}, {v3}, {v4}], {stripe_words}), "
        f"(acc, st) -> [{lanes}])"
    )
    big = _madd(
        _rotl("__lanes[1]", 1), _rotl("__lanes[2]", 7),
        _rotl("__lanes[3]", 12), _rotl("__lanes[4]", 18),
    )
    for k in range(4):
        big = _merge(big, f"__lanes[{k + 1}]")
    small = _madd(seed, P5)
    tail8 = (
        f"list_reduce(list_prepend(__acc0, "
        f"list_transform(range(0, (({n}) % 32) // 8), "
        f"k -> {_w8(b, f'(({n}) // 32) * 32 + 8 * k + 1')})), "
        f"(a, w) -> {_madd(_mmul(_rotl(_xor('a', _round('0', 'w')), 27), P1), P4)})"
    )
    p4 = f"(({n}) // 32) * 32 + ((({n}) % 32) // 8) * 8"
    step4 = _madd(
        _mmul(_rotl(_xor("__acc8", _mmul(_w4(b, p4 + " + 1"), P1)), 23), P2),
        P3,
    )
    tail1 = (
        f"list_reduce(list_prepend(__acc4, "
        f"list_transform(range({p4} + (CASE WHEN ({n}) - ({p4}) >= 4 THEN 4 ELSE 0 END) + 1, ({n}) + 1), "
        f"i -> ({b})[i])), "
        f"(a, byt) -> {_mmul(_rotl(_xor('a', _mmul('byt', P5)), 11), P1)})"
    )
    return [
        ("__lanes", f"CASE WHEN ({n}) >= 32 THEN {stripe_fold} END"),
        ("__acc0", _madd(f"CASE WHEN ({n}) >= 32 THEN {big} ELSE {small} END", n)),
        ("__acc8", tail8),
        ("__acc4", f"CASE WHEN ({n}) - ({p4}) >= 4 THEN {step4} ELSE __acc8 END"),
        ("__acc1", tail1),
        ("__xxh_u", avalanche("__acc1")),
    ]


def xxh64_int4_stages(i: str, seed: str, prefix: str = "__i4") -> list[tuple[str, str]]:
    """Staged-column form of ``xxh64_int4_u`` — REQUIRED whenever the
    result feeds per-row vectorized evaluation at volume: the closed
    expression duplicates operands at every mmul/rotl/xor level (an
    inline copy is ~47 KB; 32 of them made a 9.7 MB query), while these
    stages each reference only the previous stage's COLUMN.  ``i`` and
    ``seed`` must be column references."""
    p = prefix
    return [
        (f"{p}_s0", _madd(seed, P5, "4")),
        (f"{p}_s1", _xor(f"{p}_s0", _mmul(i, P1))),
        (f"{p}_s2", _madd(_mmul(_rotl(f"{p}_s1", 23), P2), P3)),
        (f"{p}_a0", _xor(f"{p}_s2", _shr(f"{p}_s2", 33))),
        (f"{p}_a1", _mmul(f"{p}_a0", P2)),
        (f"{p}_a2", _xor(f"{p}_a1", _shr(f"{p}_a1", 29))),
        (f"{p}_a3", _mmul(f"{p}_a2", P3)),
        (f"{p}_u", _xor(f"{p}_a3", _shr(f"{p}_a3", 32))),
    ]


def xxh64_long8_stages(l: str, seed: str, prefix: str = "__l8") -> list[tuple[str, str]]:
    """Staged-column XXH64 of an 8-byte little-endian BIGINT — Spark's
    LongType hashing path (``XXH64.hashLong``: acc = seed + P5 + 8;
    acc ^= rotl(l·P2, 31)·P1; acc = rotl(acc, 27)·P1 + P4; avalanche).
    ``l`` and ``seed`` must be column references; negative longs wrap to
    their two's-complement unsigned 64-bit word.  Completes the family:
    strings hash as UTF-8 bytes (``xxh64_stages``), ints as 4-byte LE
    (``xxh64_int4_stages``), longs as 8-byte LE (this)."""
    p = prefix
    w = (
        f"(CASE WHEN CAST({l} AS HUGEINT) < 0 "
        f"THEN CAST({l} AS HUGEINT) + {W} ELSE CAST({l} AS HUGEINT) END)"
    )
    return [
        (f"{p}_w", w),
        (f"{p}_s0", _madd(seed, P5, "8")),
        (f"{p}_s1", _xor(f"{p}_s0", _round("0", f"{p}_w"))),
        (f"{p}_s2", _madd(_mmul(_rotl(f"{p}_s1", 27), P1), P4)),
        (f"{p}_a0", _xor(f"{p}_s2", _shr(f"{p}_s2", 33))),
        (f"{p}_a1", _mmul(f"{p}_a0", P2)),
        (f"{p}_a2", _xor(f"{p}_a1", _shr(f"{p}_a1", 29))),
        (f"{p}_a3", _mmul(f"{p}_a2", P3)),
        (f"{p}_u", _xor(f"{p}_a3", _shr(f"{p}_a3", 32))),
    ]


def apply_stages(src_sql: str, stages: list[tuple[str, str]]) -> str:
    """Wrap ``src_sql`` (a full SELECT) in one nested SELECT per stage."""
    q = f"({src_sql})"
    for name, expr in stages:
        q = f"(SELECT *, {expr} AS {name} FROM {q})"
    return f"SELECT * FROM {q}"


def xxh64_int4_u(i: str, seed: str) -> str:
    """Unsigned XXH64 of the 4-byte little-endian int ``i`` (must be in
    [0, 2^31)) with seed expression ``seed`` — the closed small-input
    path (Spark hashes IntegerType children this way when chaining)."""
    acc = _madd(seed, P5, "4")
    acc = _xor(acc, _mmul(i, P1))
    acc = _madd(_mmul(_rotl(acc, 23), P2), P3)
    return avalanche(acc)


def xxh64_int4_py(i: int, seed: int) -> int:
    """Pure-Python twin of :func:`xxh64_int4_u` (XXH64 of the 4-byte LE
    int, the path Spark uses for IntegerType children) — for oracle
    GENERATORS that need hash values at SQL-build time (e.g. folding the
    derived LSH hyperplane weights into a static oracle query)."""
    m = (1 << 64) - 1
    p1, p2, p3, p5 = int(P1), int(P2), int(P3), int(P5)
    acc = (seed + p5 + 4) & m
    acc ^= (i * p1) & m
    acc = (((acc << 23 | acc >> 41) & m) * p2 + p3) & m
    acc ^= acc >> 33
    acc = (acc * p2) & m
    acc ^= acc >> 29
    acc = (acc * p3) & m
    acc ^= acc >> 32
    return acc


def to_signed(h: str) -> str:
    """Unsigned [0, 2^64) → Spark's signed BIGINT rendering."""
    return (
        f"CAST(CASE WHEN ({h}) >= {H} THEN ({h}) - {W} ELSE ({h}) END AS BIGINT)"
    )


def xxh64_str_staged_sql(src_sql: str, s_col: str, seed: str = "42") -> str:
    """Subquery computing ``__xxh_u`` (unsigned XXH64 of ``s_col``'s
    UTF-8/ASCII bytes) alongside all columns of ``src_sql``."""
    n_guard = (
        f"CASE WHEN length({s_col}) <> octet_length(encode({s_col})) "
        f"THEN error('xxh64_sql: non-ASCII input — unicode(s[i]) bytes "
        f"are only valid for ASCII') ELSE length({s_col}) END"
    )
    inner = f"SELECT *, {bytes_expr(s_col)} AS __b, {n_guard} AS __n {src_sql}"
    q = f"({inner})"
    for name, expr in xxh64_stages("__b", "__n", seed):
        q = f"(SELECT *, {expr} AS {name} FROM {q})"
    return f"SELECT * EXCLUDE (__b, __n, __lanes, __acc0, __acc8, __acc4, __acc1) FROM {q}"
