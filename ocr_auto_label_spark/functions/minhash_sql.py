"""The xxhash64 sketch family compiled to DuckDB SQL.

``dedup_minhash_variants`` was the canonical "no DuckDB analog" entry:
every stage leans on Spark's ``xxhash64``.  With XXH64 itself compiled
to DuckDB SQL (functions/xxh64_sql.py, bit-exact vs Spark), the ENTIRE
pipeline becomes oracle-checkable:

- char-5 / word-3 MinHash: k=32 hash families h_i(sh) =
  xxhash64(sh, i) — the chained string→int form — min-aggregated per
  doc into signatures;
- LSH banding: band_hash = xxhash64(to_json(slice(sig, ...)), band)
  (the JSON rendering of signed longs is replicated verbatim);
- the signature-estimate prefilter (mean of 32 equalities ≥
  threshold − 0.15, the Python-float literal reproduced exactly) and
  the exact shingle-Jaccard verification;
- SimHash: per-token xxhash64 bit votes, 64 vectorized sum aggregates;
- rolling-hash fingerprint: min over width-8 substring hashes.

Hash volume is tamed by hashing each DISTINCT string once (shingle /
band-JSON / token vocabularies) and joining back — the expensive staged
string hash runs O(|vocab|) times while the cheap chained int
finalization runs as STAGED vectorized columns over an exploded
(doc, shingle, hash-index) table (xxh64_int4_stages — the closed
expression form blew the query up to 9.7 MB and minutes of planning).
Multi-referenced CTEs are MATERIALIZED (DuckDB inlines otherwise).
"""

from __future__ import annotations

from ocr_auto_label_spark.functions.xxh64_sql import (
    apply_stages,
    to_signed,
    xxh64_int4_stages,
    xxh64_str_staged_sql,
)


def _char_shingles(col: str, width: int) -> str:
    return (
        f"list_distinct(list_transform("
        f"range(1, greatest(length({col}) - {width - 1}, 1) + 1), "
        f"i -> substring({col}, i, {width})))"
    )


def _word_shingles(col: str, width: int) -> str:
    toks = f"regexp_split_to_array(lower(trim({col})), '\\s+')"
    return (
        f"list_distinct(list_transform("
        f"range(1, greatest(len({toks}) - {width - 1}, 1) + 1), "
        f"i -> array_to_string(({toks})[i : i + {width - 1}], ' ')))"
    )


def _variant_sql(
    tag: str,
    shingles: str,
    num_hashes: int,
    bands: int,
    threshold: float,
) -> tuple[str, str]:
    """(CTE block, output select) for one MinHash+LSH variant."""
    r = num_hashes // bands
    est_lit = repr(threshold - 0.15)
    # the k hash families are a function of the SHINGLE alone — run the
    # int128-heavy chained finalization once per (vocab shingle, i)
    # (|vocab|·k rows), then join doc instances to precomputed hashes
    # (the per-instance explode is a cheap join + MIN, no HUGEINT math;
    # doing the math per instance was 3.35M heavy rows / 70 s)
    vh32_inner = (
        f"SELECT v.sh, v.__xxh_u, ii.i "
        f"FROM {tag}_vh v, (SELECT unnest(range(0, {num_hashes})) AS i) ii"
    )
    vh32 = apply_stages(vh32_inner, xxh64_int4_stages("i", "__xxh_u"))
    bh_inner = (
        f"SELECT j.doc_id, j.b AS i, v.__xxh_u "
        f"FROM {tag}_bj j JOIN {tag}_bjh v USING (bj)"
    )
    bh = apply_stages(bh_inner, xxh64_int4_stages("i", "__xxh_u"))
    cte = f"""
{tag}_sh AS MATERIALIZED (SELECT doc_id, unnest({shingles}) AS sh FROM documents),
{tag}_vocab AS (SELECT DISTINCT sh FROM {tag}_sh),
{tag}_vh AS ({xxh64_str_staged_sql(f'FROM {tag}_vocab', 'sh')}),
{tag}_vh32 AS MATERIALIZED (
  SELECT sh, i, {to_signed('__i4_u')} AS h FROM ({vh32}) z),
{tag}_sig AS MATERIALIZED (
  SELECT doc_id, list(mh ORDER BY i) AS sig FROM (
    SELECT s.doc_id, v.i, min(v.h) AS mh
    FROM {tag}_sh s JOIN {tag}_vh32 v USING (sh)
    GROUP BY s.doc_id, v.i) m
  GROUP BY doc_id),
{tag}_bj AS (
  SELECT doc_id, b,
         '[' || array_to_string(sig[b * {r} + 1 : b * {r} + {r}], ',') || ']' AS bj
  FROM {tag}_sig, (SELECT unnest(range(0, {bands})) AS b) bb),
{tag}_bjvocab AS (SELECT DISTINCT bj FROM {tag}_bj),
{tag}_bjh AS ({xxh64_str_staged_sql(f'FROM {tag}_bjvocab', 'bj')}),
{tag}_bandh AS MATERIALIZED (
  SELECT doc_id, i AS b, {to_signed('__i4_u')} AS bh FROM ({bh}) z),
{tag}_cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b
  FROM {tag}_bandh a JOIN {tag}_bandh b2
    ON a.b = b2.b AND a.bh = b2.bh AND a.doc_id < b2.doc_id),
{tag}_est AS (
  SELECT c.id_a, c.id_b
  FROM {tag}_cand c
  JOIN {tag}_sig sa ON sa.doc_id = c.id_a
  JOIN {tag}_sig sb ON sb.doc_id = c.id_b
  WHERE len(list_filter(range(1, {num_hashes + 1}),
                        i -> sa.sig[i] = sb.sig[i])) / {num_hashes}.0
        >= {est_lit}),
{tag}_shl AS MATERIALIZED (SELECT doc_id, {shingles} AS sh FROM documents),
{tag}_pairs AS (
  SELECT e.id_a, e.id_b,
         round(len(list_intersect(a.sh, b.sh))
               / greatest(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)), 1),
               6) AS jac
  FROM {tag}_est e
  JOIN {tag}_shl a ON a.doc_id = e.id_a
  JOIN {tag}_shl b ON b.doc_id = e.id_b)"""
    out = (
        f"SELECT '{tag}' AS variant, CAST(id_a AS BIGINT) AS id_a, "
        f"CAST(id_b AS BIGINT) AS id_b, CAST(jac AS VARCHAR) AS val "
        f"FROM {tag}_pairs WHERE jac >= {threshold}"
    )
    return cte, out


def dedup_minhash_variants_duck_sql(
    num_hashes: int = 32,
    threshold: float = 0.7,
) -> str:
    from ocr_auto_label_spark.operators.dedup import optimal_bands

    bands = optimal_bands(num_hashes, threshold)
    c5_cte, c5_out = _variant_sql(
        "char5", _char_shingles("text", 5), num_hashes, bands, threshold
    )
    w3_cte, w3_out = _variant_sql(
        "word3", _word_shingles("text", 3), num_hashes, bands, threshold
    )
    # SimHash: ±1 votes per bit of each token hash, bit set iff positive
    votes = ", ".join(
        f"sum(CASE WHEN (CAST(__xxh_u AS UBIGINT) >> {j}) & 1 = 1 "
        f"THEN 1 ELSE -1 END) AS v{j}"
        for j in range(64)
    )
    sim_val = " + ".join(
        f"(CASE WHEN v{j} > 0 THEN CAST({2 ** j} AS HUGEINT) ELSE 0 END)"
        for j in range(64)
    )
    toks = "regexp_split_to_array(lower(trim(text)), '\\s+')"
    sim_cte = f"""
tok AS MATERIALIZED (SELECT doc_id, unnest({toks}) AS t FROM documents),
tokvocab AS (SELECT DISTINCT t FROM tok),
tokh AS ({xxh64_str_staged_sql('FROM tokvocab', 't')}),
tokv AS (SELECT k.doc_id, h.__xxh_u FROM tok k JOIN tokh h USING (t)),
simv AS (SELECT doc_id, {votes} FROM tokv GROUP BY doc_id),
sim AS (SELECT doc_id, {to_signed(f'({sim_val})')} AS simhash FROM simv)"""
    sim_out = (
        "SELECT 'simhash' AS variant, CAST(doc_id AS BIGINT) AS id_a, "
        "CAST(NULL AS BIGINT) AS id_b, CAST(simhash AS VARCHAR) AS val FROM sim"
    )
    # rolling-hash fingerprint: min over width-8 substring hashes
    fp_cte = f"""
f_sh AS MATERIALIZED (SELECT doc_id, unnest({_char_shingles('text', 8)}) AS sh FROM documents),
f_vocab AS (SELECT DISTINCT sh FROM f_sh),
f_vh AS ({xxh64_str_staged_sql('FROM f_vocab', 'sh')}),
fp AS (
  SELECT s.doc_id, min({to_signed('v.__xxh_u')}) AS fingerprint
  FROM f_sh s JOIN f_vh v USING (sh) GROUP BY s.doc_id)"""
    fp_out = (
        "SELECT 'fingerprint' AS variant, CAST(doc_id AS BIGINT) AS id_a, "
        "CAST(NULL AS BIGINT) AS id_b, CAST(fingerprint AS VARCHAR) AS val FROM fp"
    )
    return (
        "WITH " + ",".join([c5_cte, w3_cte, sim_cte, fp_cte])
        + f"\n{c5_out}\nUNION ALL\n{w3_out}\nUNION ALL\n{sim_out}"
        + f"\nUNION ALL\n{fp_out}"
    )
