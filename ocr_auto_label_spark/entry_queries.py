"""Driver-contract query registry: every implemented operator from
SURVEY.md §2 as a (Spark query, DuckDB oracle SQL) pair.

Most queries are written in the dialect-neutral SQL subset shared by
Spark SQL and DuckDB, so the *same string* is both the query and the
oracle.  Where dialects diverge (list vs array functions, strftime,
regexp flags) the two strings differ but compute the same result.
Operators whose semantics aren't SQL-expressible (Arrow-UDF extraction,
xxhash64-based MinHash/SimHash/LSH, the sequential-transitive grouping
fold) are registered without an oracle → the driver records a rows-only
check, per the contract.

Column-naming rule: every computed column is aliased identically on both
sides (the driver sorts columns by name before value-hashing).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from ocr_auto_label_spark.functions.grammar_sql import (
    is_valid_sql,
    pattern_id_column,
    pattern_id_sql,
)
from ocr_auto_label_spark.labelcore.canonical import canonical_labels

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_views(spark: SparkSession, sf_dir: str) -> None:
    for t in TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)


def _sql_query(sql: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        load_views(spark, sf_dir)
        return spark.sql(sql)

    return run


# ---------------------------------------------------------------- dialects

def _spark_tokens(col: str) -> str:
    return f"split(lower(trim({col})), '\\\\s+')"


def _duck_tokens(col: str) -> str:
    return f"regexp_split_to_array(lower(trim({col})), '\\s+')"


def _lang_id_query_sql(dialect: str) -> str:
    """text_language_id (operators/textstats.py) as a named-score-column
    query: ONE token split per row and one set-intersect per language.
    The round-1 formulation inlined ``array_contains(split(...), w)`` per
    stopword, re-splitting the text ~20× per row (2× slower measured).
    Score semantics identical (stopword lists are distinct, so
    |tokens ∩ panel| = Σ contains); tie-break preserved: strict > while
    visiting languages in ascending order ⇒ ties → smallest language."""
    from ocr_auto_label_spark.operators.textstats import LANG_STOPWORDS

    tokens = _spark_tokens("text") if dialect == "spark" else _duck_tokens("text")
    score_cols = []
    for lang in sorted(LANG_STOPWORDS):
        words = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
        if dialect == "spark":
            expr = f"size(array_intersect(toks, array({words})))"
        else:
            expr = f"len(list_distinct(list_intersect(toks, [{words}])))"
        score_cols.append(f"{expr} AS s_{lang}")
    guess, best = "'und'", "0"
    for lang in sorted(LANG_STOPWORDS):
        guess = f"(CASE WHEN s_{lang} > {best} THEN '{lang}' ELSE {guess} END)"
        best = f"greatest({best}, s_{lang})"
    return (
        f"SELECT lang, {guess} AS lang_guess, count(*) AS cnt FROM ("
        "SELECT lang, " + ", ".join(score_cols) + " FROM ("
        f"SELECT lang, {tokens} AS toks FROM documents) t) s "
        "GROUP BY 1, 2"
    )


def _textstats_sql(dialect: str) -> str:
    tokens = _spark_tokens("text") if dialect == "spark" else _duck_tokens("text")
    tlen = "size" if dialect == "spark" else "len"
    flags = "" if dialect == "spark" else ", 'g'"
    tc = f"{tlen}({tokens})"
    pr = f"(length(text) - length(regexp_replace(text, '[^\\\\s\\\\w]', ''))) * 1.0 / greatest(length(text), 1)" \
        if dialect == "spark" else \
        f"(length(text) - length(regexp_replace(text, '[^\\s\\w]', ''{flags}))) * 1.0 / greatest(length(text), 1)"
    length_band = "(CASE WHEN length(text) < 20 THEN 0.0 WHEN length(text) > 8000 THEN 0.3 ELSE 1.0 END)"
    mean_word = f"length(text) * 1.0 / greatest({tc}, 1)"
    word_band = f"(CASE WHEN {mean_word} >= 3 AND {mean_word} <= 12 THEN 1.0 ELSE 0.4 END)"
    quality = f"0.4 * {length_band} + 0.3 * (1 - {pr}) + 0.3 * {word_band}"
    bpe = f"{tlen}(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]', 0))"
    # CAST to DOUBLE: Spark parses 0.4-style literals as DECIMAL, DuckDB as
    # DOUBLE — cast both so types and hashes line up
    return (
        "SELECT lang, "
        f"CAST(round(avg({tc}), 4) AS DOUBLE) AS avg_tokens, "
        f"CAST(round(avg({pr}), 4) AS DOUBLE) AS avg_punct, "
        f"CAST(round(avg({quality}), 4) AS DOUBLE) AS avg_quality, "
        f"CAST(round(avg({bpe}), 4) AS DOUBLE) AS avg_bpe_tokens, "
        "count(*) AS cnt "
        "FROM documents GROUP BY lang"
    )


_TEXTSTATS_METRICS = ("avg_tokens", "avg_punct", "avg_quality", "avg_bpe_tokens")


def _text_quality_stats_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """text_quality_stats, long-normalized, + the unigram-NLL variant
    (VERDICT r3 #3): the per-lang panel metrics stack into (variant, k,
    cnt, val) rows off ONE documents scan, unioned with the REAL
    ``operators.textstats.unigram_nll`` operator (vocab agg + AQE-chosen
    join + per-doc fold) — val for NLL rows is floor(raw·1000)/1000, a
    1e-3 quantization of the UNROUNDED mean so cross-engine libm log
    differences (≲1 ulp) can't flip a compared digit (the
    round(double, 6) HALF_UP-vs-binary trap, see module docstring)."""
    from ocr_auto_label_spark.operators.textstats import (
        dsir_logweights,
        duplicated_span_stats,
        exact_group_quantiles,
        repetition_stats,
        stupid_backoff_scores,
        tfidf_top_terms,
        unigram_nll,
    )
    from ocr_auto_label_spark.operators.util import ensure_parallelism

    load_views(spark, sf_dir)
    wide = spark.sql(_textstats_sql("spark"))
    long_stats = wide.select(
        F.col("lang").alias("k"),
        F.col("cnt"),
        F.explode(F.array(*[
            F.struct(F.lit(m).alias("variant"), F.col(m).alias("val"))
            for m in _TEXTSTATS_METRICS
        ])).alias("x"),
    ).select("x.variant", "k", "cnt", "x.val")
    docs = ensure_parallelism(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    nll = unigram_nll(docs, round_digits=None).select(
        F.lit("unigram_nll").alias("variant"),
        F.col("id").cast("string").alias("k"),
        F.col("token_cnt").cast("bigint").alias("cnt"),
        (F.floor(F.col("avg_nll") * 1000) / 1000).alias("val"),
    )
    # Gopher-style repetition gates (real operator; exact int/int ratios
    # so no rounding is needed for the cross-engine hash)
    rep = repetition_stats(docs)
    dup = rep.select(
        F.lit("dup_word_frac").alias("variant"),
        F.col("id").cast("string").alias("k"),
        F.col("token_cnt").cast("bigint").alias("cnt"),
        F.col("dup_word_frac").alias("val"),
    )
    top = rep.select(
        F.lit("top_bigram_frac").alias("variant"),
        F.col("id").cast("string").alias("k"),
        F.col("bigram_cnt").alias("cnt"),
        F.col("top_bigram_frac").alias("val"),
    )
    # exact per-lang token-count quantiles (nearest-rank; relational
    # distinct-value-compressed path — the 100-TB exact-quantile shape),
    # oracled by DuckDB's independent quantile_disc implementation
    qs = exact_group_quantiles(
        docs.select("lang", F.expr(f"size({_spark_tokens('text')})").alias("tc")),
        "tc", "lang",
    ).select(
        F.concat(F.lit("p"), F.col("percentile").cast("string"),
                 F.lit("_tokens")).alias("variant"),
        F.col("lang").alias("k"),
        F.col("n").cast("bigint").alias("cnt"),
        F.col("val").cast("double").alias("val"),
    )
    # Lee et al. 2021 duplicated-span fraction (25-token windows whose
    # exact span occurs more than once anywhere in the corpus)
    spans = duplicated_span_stats(docs).select(
        F.lit("dup_span_frac").alias("variant"),
        F.col("id").cast("string").alias("k"),
        F.col("n_spans").alias("cnt"),
        F.col("dup_span_frac").alias("val"),
    )
    # DSIR importance reweighting (Xie et al. 2023): hashed-bigram
    # log(p_target/p_raw) per doc, target = the English slice; the
    # DuckDB oracle replays pmod(xxhash64(gram), 1024) via the XXH64-SQL
    # compiler.  Same 1e-3 floor quantization as unigram_nll (libm ln
    # ulps + summation order must not flip a compared digit).
    dsir = dsir_logweights(docs, target=(F.col("lang") == "en")).select(
        F.lit("dsir_logweight").alias("variant"),
        F.col("doc_id").cast("string").alias("k"),
        F.col("n_grams").alias("cnt"),
        (F.floor(F.col("avg_logweight") * 1000) / 1000).alias("val"),
    )
    # per-doc top-3 TF-IDF keywords (ratio-form idf so score doubles are
    # bit-stable cross-engine — compared RAW, no quantization needed)
    tfidf = tfidf_top_terms(docs, k=3).select(
        F.lit("tfidf_top3").alias("variant"),
        F.concat_ws("/", F.col("doc_id"), F.col("rank"), F.col("term"))
        .alias("k"),
        F.col("tf").alias("cnt"),
        F.col("score").alias("val"),
    )
    # Stupid-Backoff bigram LM scoring (Brants et al. 2007): model =
    # the English slice, every doc scored against it.  Mean conditional
    # PROBABILITY (not log) + ordered left-fold ⇒ the raw double is
    # bit-identical cross-engine and compared UNQUANTIZED.
    sbo = stupid_backoff_scores(
        docs, model_predicate=(F.col("lang") == "en")
    ).select(
        F.lit("sbo_meanprob").alias("variant"),
        F.col("id").cast("string").alias("k"),
        F.col("token_cnt").alias("cnt"),
        F.col("sbo_mean").alias("val"),
    )
    # Trained hashed-LR quality classifier (CCNet-style fastText-like
    # filter): 3 GD iterations with the algebraic sigmoid + ordered
    # folds ⇒ TRAINING ITSELF is bit-reproducible, and the DuckDB
    # oracle replays the whole loop (weights AND per-doc scores
    # compared RAW, no quantization).
    from ocr_auto_label_spark.operators.quality_model import (
        LR_BUCKETS,
        train_quality_lr,
    )

    lr_w, _, lr_scored = train_quality_lr(
        docs, label_expr=(F.col("lang") == "en")
    )
    lrw = spark.createDataFrame(
        [(b, lr_w[b]) for b in range(LR_BUCKETS)], "bucket int, w double"
    ).select(
        F.lit("lr_weight").alias("variant"),
        F.col("bucket").cast("string").alias("k"),
        F.col("bucket").cast("long").alias("cnt"),
        F.col("w").alias("val"),
    )
    lrs = lr_scored.select(
        F.lit("lr_score").alias("variant"),
        F.col("id").cast("string").alias("k"),
        F.col("y").cast("long").alias("cnt"),
        F.col("score").alias("val"),
    )
    return (
        long_stats.unionByName(nll).unionByName(dup).unionByName(top)
        .unionByName(qs).unionByName(spans).unionByName(dsir)
        .unionByName(tfidf).unionByName(sbo).unionByName(lrw)
        .unionByName(lrs)
    )


def _lr_duck_ctes() -> tuple[str, str, str]:
    """Chained-CTE replay of the hashed-LR training loop
    (operators/quality_model.py) — per iteration: bucket-ordered dot
    fold → algebraic sigmoid error → doc-ordered gradient fold →
    ``w − lr·(g/N)``.  Returns (ctes_sql, final_weight_cte, sigmoid_sql)
    — the sigmoid string is shared with the score union leg so the two
    copies can never drift."""
    from ocr_auto_label_spark.functions.xxh64_sql import xxh64_str_staged_sql
    from ocr_auto_label_spark.operators.quality_model import (
        LR_BUCKETS,
        LR_ITERATIONS,
        LR_RATE,
    )

    lr_hash = xxh64_str_staged_sql("FROM (SELECT word FROM vocab) lv", "word")
    zero = "CAST(0.0 AS DOUBLE)"
    sig = (
        "(CAST(0.5 AS DOUBLE) + dot / (CAST(2.0 AS DOUBLE) * "
        "(CAST(1.0 AS DOUBLE) + abs(dot))))"
    )
    ctes = [
        f"lfw AS MATERIALIZED (SELECT word, CAST(__xxh_u % {LR_BUCKETS} AS "
        f"BIGINT) AS bucket FROM ({lr_hash}) zl)",
        "lfc AS MATERIALIZED (SELECT t.doc_id, CASE WHEN d.lang = 'en' "
        f"THEN CAST(1.0 AS DOUBLE) ELSE {zero} END AS y, w.bucket, "
        "count(*) AS cnt FROM toksf t JOIN lfw w USING (word) "
        "JOIN documents d ON t.doc_id = d.doc_id GROUP BY 1, 2, 3)",
        "lfx AS MATERIALIZED (SELECT f.doc_id, f.y, f.bucket, "
        "CAST(f.cnt AS DOUBLE) / CAST(s.dl AS DOUBLE) AS x FROM lfc f "
        "JOIN (SELECT doc_id, sum(cnt) AS dl FROM lfc GROUP BY 1) s "
        "ON f.doc_id = s.doc_id)",
        "lnd AS (SELECT count(DISTINCT doc_id) AS nd FROM lfx)",
        f"lw0 AS MATERIALIZED (SELECT CAST(unnest(range({LR_BUCKETS})) AS "
        f"BIGINT) AS bucket, {zero} AS w)",
    ]
    for k in range(LR_ITERATIONS):
        ctes.append(
            f"ldt{k} AS (SELECT f.doc_id, f.y, list_reduce(list_prepend("
            f"{zero}, list(w.w * f.x ORDER BY f.bucket)), (a, s) -> a + s)"
            f" AS dot FROM lfx f JOIN lw{k} w USING (bucket) "
            "GROUP BY f.doc_id, f.y)"
        )
        ctes.append(
            f"ler{k} AS (SELECT doc_id, {sig} - y AS e FROM ldt{k})"
        )
        ctes.append(
            f"lgr{k} AS (SELECT f.bucket, list_reduce(list_prepend("
            f"{zero}, list(er.e * f.x ORDER BY f.doc_id)), (a, s) -> a + s)"
            f" AS g FROM lfx f JOIN ler{k} er USING (doc_id) "
            "GROUP BY f.bucket)"
        )
        ctes.append(
            f"lw{k + 1} AS MATERIALIZED (SELECT w.bucket, w.w - "
            f"CAST({LR_RATE!r} AS DOUBLE) * (coalesce(g.g, {zero}) / "
            f"CAST(n.nd AS DOUBLE)) AS w FROM lw{k} w LEFT JOIN lgr{k} g "
            "USING (bucket) CROSS JOIN lnd n)"
        )
    final = f"lw{LR_ITERATIONS}"
    ctes.append(
        f"ldtf AS (SELECT f.doc_id, f.y, list_reduce(list_prepend({zero}, "
        "list(w.w * f.x ORDER BY f.bucket)), (a, s) -> a + s) AS dot "
        f"FROM lfx f JOIN {final} w USING (bucket) GROUP BY f.doc_id, f.y)"
    )
    return ",\n".join(ctes), final, sig


def _text_quality_stats_duck() -> str:
    from ocr_auto_label_spark.functions.xxh64_sql import xxh64_str_staged_sql

    unions = " UNION ALL ".join(
        f"SELECT '{m}' AS variant, lang AS k, cnt, {m} AS val FROM w"
        for m in _TEXTSTATS_METRICS
    )
    _duck_tokens_len = f"len({_duck_tokens('text')})"
    gram_hash = xxh64_str_staged_sql("FROM dvocab", "gram")
    lr_ctes, lr_final, lr_sig = _lr_duck_ctes()
    return f"""
WITH w AS ({_textstats_sql('duck')}),
toks AS (
  SELECT doc_id, unnest({_duck_tokens('text')}) AS word FROM documents),
toksf AS (SELECT doc_id, word FROM toks WHERE word <> ''),
vocab AS (SELECT word, count(*) AS vcnt FROM toksf GROUP BY word),
tot AS (SELECT sum(vcnt) AS n_tokens, count(*) AS v_size FROM vocab),
scored AS (
  SELECT t.doc_id,
         -ln((v.vcnt + 0.5) / (tot.n_tokens + 0.5 * tot.v_size)) AS nll
  FROM toksf t JOIN vocab v USING (word) CROSS JOIN tot),
rt AS MATERIALIZED (SELECT doc_id, {_duck_tokens('text')} AS t FROM documents),
rbase AS (
  SELECT doc_id, len(t) AS token_cnt,
         1.0 - len(list_distinct(t)) / len(t) AS dupf, t FROM rt),
rgrams AS (
  SELECT doc_id, unnest(list_transform(range(1, greatest(len(t) - 1, 0) + 1),
                                       i -> concat(t[i], ' ', t[i + 1]))) AS gram
  FROM rt),
rper AS (SELECT doc_id, gram, count(*) AS cnt FROM rgrams GROUP BY 1, 2),
rdoc AS (SELECT doc_id, max(cnt) AS top_cnt,
                CAST(sum(cnt) AS BIGINT) AS bigram_cnt
         FROM rper GROUP BY 1),
sp AS (SELECT doc_id, unnest(list_transform(range(1, len(t) - 25 + 2),
                             i -> array_to_string(list_slice(t, i, i + 24), ' '))) AS span
       FROM rt),
sper AS (SELECT doc_id, span, count(*) AS c FROM sp GROUP BY 1, 2),
sw AS (SELECT doc_id, c, sum(c) OVER (PARTITION BY span) AS stot FROM sper),
sdoc AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_spans,
                CAST(coalesce(sum(c) FILTER (stot > 1), 0) AS BIGINT) AS dup_spans
         FROM sw GROUP BY 1),
qt AS (SELECT lang, count({_duck_tokens_len}) AS n,
              quantile_disc({_duck_tokens_len}, 0.50) AS p50,
              quantile_disc({_duck_tokens_len}, 0.90) AS p90,
              quantile_disc({_duck_tokens_len}, 0.99) AS p99
       FROM documents GROUP BY lang),
dtok AS MATERIALIZED (
  SELECT doc_id, lang,
         list_filter({_duck_tokens('text')}, w -> w <> '') AS t
  FROM documents),
dgram AS MATERIALIZED (
  SELECT doc_id, (lang = 'en') AS is_tgt,
         unnest(list_transform(range(1, greatest(len(t) - 1, 0) + 1),
                i -> concat(t[i], ' ', t[i + 1]))) AS gram
  FROM dtok),
dvocab AS (SELECT DISTINCT gram FROM dgram),
dhash AS MATERIALIZED (
  SELECT gram, CAST(__xxh_u % 1024 AS BIGINT) AS bucket
  FROM ({gram_hash}) z),
docc AS MATERIALIZED (
  SELECT g.doc_id, g.is_tgt, h.bucket, count(*) AS k
  FROM dgram g JOIN dhash h USING (gram) GROUP BY 1, 2, 3),
ddist AS MATERIALIZED (
  SELECT bucket, sum(k) AS raw_cnt,
         sum(CASE WHEN is_tgt THEN k ELSE 0 END) AS tgt_cnt
  FROM docc GROUP BY bucket),
dtot AS (SELECT sum(raw_cnt) AS raw_tot, sum(tgt_cnt) AS tgt_tot FROM ddist),
dlw AS (
  SELECT bucket,
         ln((tgt_cnt + 1.0) / (tgt_tot + 1024.0))
           - ln((raw_cnt + 1.0) / (raw_tot + 1024.0)) AS lw
  FROM ddist CROSS JOIN dtot),
spos AS MATERIALIZED (
  SELECT doc_id, (lang = 'en') AS is_model, pos,
         CASE WHEN pos = 0 THEN NULL ELSE t[pos] END AS w1,
         t[pos + 1] AS w2
  FROM (SELECT doc_id, lang, t, unnest(range(len(t))) AS pos
        FROM dtok WHERE len(t) > 0) zs),
suni AS (SELECT w2 AS w, count(*) AS uc FROM spos WHERE is_model
         GROUP BY 1),
stot AS (SELECT sum(uc) AS n_total FROM suni),
sbig AS (SELECT w1, w2, count(*) AS bc FROM spos
         WHERE is_model AND w1 IS NOT NULL GROUP BY 1, 2),
srows AS (
  SELECT p.doc_id, p.pos,
         CASE WHEN p.pos = 0
              THEN coalesce(CAST(u2.uc AS DOUBLE) /
                            CAST(s.n_total AS DOUBLE), CAST(0.0 AS DOUBLE))
              WHEN b.bc IS NOT NULL
              THEN CAST(b.bc AS DOUBLE) / CAST(u1.uc AS DOUBLE)
              ELSE CAST(0.4 AS DOUBLE) *
                   coalesce(CAST(u2.uc AS DOUBLE) /
                            CAST(s.n_total AS DOUBLE), CAST(0.0 AS DOUBLE))
         END AS score
  FROM spos p LEFT JOIN suni u2 ON p.w2 = u2.w
  LEFT JOIN suni u1 ON p.w1 = u1.w
  LEFT JOIN sbig b ON p.w1 = b.w1 AND p.w2 = b.w2
  CROSS JOIN stot s),
sfold AS (
  SELECT doc_id, count(*) AS token_cnt,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                  list(score ORDER BY pos)),
                     (a, s) -> a + s) / CAST(count(*) AS DOUBLE) AS sbo
  FROM srows GROUP BY doc_id),
ttf AS MATERIALIZED (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id,
               unnest(list_filter({_duck_tokens('text')}, w -> w <> '')) AS term
        FROM documents) z
  GROUP BY 1, 2),
tdf AS (SELECT term, count(*) AS dfc FROM ttf GROUP BY term),
tn AS (SELECT count(*) AS n_docs FROM documents),
trk AS (
  SELECT doc_id, term, tf,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rk,
         score
  FROM (SELECT t.doc_id, t.term, t.tf,
               CAST(t.tf AS DOUBLE) * (tn.n_docs + 1) / (d.dfc + 1) AS score
        FROM ttf t JOIN tdf d USING (term) CROSS JOIN tn) s),
{lr_ctes}
{unions}
UNION ALL
SELECT 'unigram_nll' AS variant, CAST(doc_id AS VARCHAR) AS k,
       count(*) AS cnt, floor(avg(nll) * 1000) / 1000 AS val
FROM scored GROUP BY doc_id
UNION ALL
SELECT 'dup_word_frac' AS variant, CAST(b.doc_id AS VARCHAR) AS k,
       CAST(b.token_cnt AS BIGINT) AS cnt, b.dupf AS val FROM rbase b
UNION ALL
SELECT 'top_bigram_frac' AS variant, CAST(b.doc_id AS VARCHAR) AS k,
       CAST(coalesce(d.bigram_cnt, 0) AS BIGINT) AS cnt,
       coalesce(d.top_cnt / d.bigram_cnt, 0.0) AS val
FROM rbase b LEFT JOIN rdoc d USING (doc_id)
UNION ALL
SELECT 'p50_tokens' AS variant, lang AS k, n AS cnt, CAST(p50 AS DOUBLE) AS val FROM qt
UNION ALL
SELECT 'p90_tokens' AS variant, lang AS k, n AS cnt, CAST(p90 AS DOUBLE) AS val FROM qt
UNION ALL
SELECT 'p99_tokens' AS variant, lang AS k, n AS cnt, CAST(p99 AS DOUBLE) AS val FROM qt
UNION ALL
SELECT 'dup_span_frac' AS variant, CAST(d.doc_id AS VARCHAR) AS k,
       coalesce(s.n_spans, 0) AS cnt,
       coalesce(CAST(s.dup_spans AS DOUBLE) / s.n_spans, 0.0) AS val
FROM documents d LEFT JOIN sdoc s USING (doc_id)
UNION ALL
SELECT 'dsir_logweight' AS variant, CAST(o.doc_id AS VARCHAR) AS k,
       CAST(sum(o.k) AS BIGINT) AS cnt,
       floor((sum(o.k * l.lw) / sum(o.k)) * 1000) / 1000 AS val
FROM docc o JOIN dlw l USING (bucket) GROUP BY o.doc_id
UNION ALL
SELECT 'tfidf_top3' AS variant,
       concat(doc_id, '/', rk, '/', term) AS k,
       CAST(tf AS BIGINT) AS cnt, score AS val
FROM trk WHERE rk <= 3
UNION ALL
SELECT 'sbo_meanprob' AS variant, CAST(doc_id AS VARCHAR) AS k,
       CAST(token_cnt AS BIGINT) AS cnt, sbo AS val
FROM sfold
UNION ALL
SELECT 'lr_weight' AS variant, CAST(bucket AS VARCHAR) AS k,
       CAST(bucket AS BIGINT) AS cnt, w AS val
FROM {lr_final}
UNION ALL
SELECT 'lr_score' AS variant, CAST(doc_id AS VARCHAR) AS k,
       CAST(y AS BIGINT) AS cnt, {lr_sig} AS val
FROM ldtf
"""


def _color_family_sql() -> str:
    """X10 (groupInference.ts:105-166) as dialect-neutral SQL: synthesize a
    deterministic RGB per doc, convert to HSL with JS Math.round semantics
    (floor(x+0.5)), classify into the reference's 12 families (first match
    wins, hue wrap-around).  Generated from labelcore's COLOR_FAMILIES so
    SQL and the pure-Python oracle share one source of truth."""
    from ocr_auto_label_spark.labelcore.inference import COLOR_FAMILIES

    def h_cond(h0: int, h1: int) -> str:
        if h0 <= h1:
            return f"h BETWEEN {h0} AND {h1}"
        return f"(h >= {h0} OR h <= {h1})"

    whens = []
    for name, ranges in COLOR_FAMILIES:
        conds = " OR ".join(
            f"({h_cond(h0, h1)} AND s BETWEEN {s0} AND {s1} AND l BETWEEN {l0} AND {l1})"
            for h0, h1, s0, s1, l0, l1 in ranges
        )
        whens.append(f"WHEN {conds} THEN '{name}'")
    family_case = "CASE " + " ".join(whens) + " ELSE NULL END"
    return f"""
WITH rgb AS (
  SELECT doc_id,
         CAST(floor(((doc_id * 2654435761) % 16777216) / 65536.0) AS INT) AS r,
         CAST(floor((((doc_id * 2654435761) % 16777216) % 65536) / 256.0) AS INT) AS g,
         CAST((((doc_id * 2654435761) % 16777216) % 256) AS INT) AS b
  FROM documents),
norm AS (
  SELECT doc_id, r / 255.0 AS rn, g / 255.0 AS gn, b / 255.0 AS bn,
         greatest(r, g, b) / 255.0 AS mx, least(r, g, b) / 255.0 AS mn
  FROM rgb),
pre AS (
  SELECT doc_id, rn, gn, bn, mx, mn, mx - mn AS d, (mx + mn) / 2 AS l0 FROM norm),
hsl AS (
  SELECT doc_id,
         CAST(floor(360 * (CASE WHEN mx = mn THEN 0
           ELSE (CASE WHEN mx = rn THEN (gn - bn) / d + (CASE WHEN gn < bn THEN 6 ELSE 0 END)
                      WHEN mx = gn THEN (bn - rn) / d + 2
                      ELSE (rn - gn) / d + 4 END) / 6 END) + 0.5) AS INT) AS h,
         CAST(floor(100 * (CASE WHEN mx = mn THEN 0
           ELSE (CASE WHEN l0 > 0.5 THEN d / (2 - mx - mn) ELSE d / (mx + mn) END) END) + 0.5) AS INT) AS s,
         CAST(floor(100 * l0 + 0.5) AS INT) AS l
  FROM pre)
SELECT family, count(*) AS cnt
FROM (SELECT doc_id, {family_case} AS family FROM hsl) f
GROUP BY family
"""


# ------------------------------------------------------- grammar fixture

def _grammar_codes() -> list[str]:
    codes = [label for label, _ in canonical_labels()[::29]]
    codes += [
        "MWI.0.1.4.10B.15.7", " ago.1.0 ", "mwi.1.2.15.7b.12.8",
        "NBO-12345-1-C", "NBO.12345.1.C", "BUS.54321.9.G",
        "MWI.1.1.18.10.7.11", "MWI.9.9.99.99.99.99", "KEN.0.3.3.5.8.11",
        "MWI.1.2.15.7E.12.8", "AGO..0", "A.1.0", "KEN.0.2.3.5X.8.11",
        "MWI.1.2.15.11B.12.8", "not a code", "MWI.1.2",
    ]
    return codes


def _grammar_validate_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = spark.createDataFrame([(c,) for c in _grammar_codes()], "code: string")
    pid = pattern_id_column(F.col("code"))
    return df.select(
        "code",
        pid.alias("pattern_id"),
        pid.isNotNull().cast("int").alias("is_valid"),
    )


def _grammar_validate_duck() -> str:
    vals = ", ".join("('{}')".format(c.replace("'", "''")) for c in _grammar_codes())
    return (
        f"SELECT code, {pattern_id_sql('code')} AS pattern_id, "
        f"CAST({is_valid_sql('code')} AS INT) AS is_valid "
        f"FROM (VALUES {vals}) AS t(code)"
    )


# Step-1-of-the-flagship token scan regex now lives in
# functions/flagship_sql.py (SCAN_RX) where the composed twin reuses it;
# kept under the old private name for the entry SQL below.
from ocr_auto_label_spark.functions.flagship_sql import SCAN_RX as _SCAN_RX


def _token_scan_sql(dialect: str, table: str = "documents") -> str:
    """Token span scan + grammar validity (flagship steps 1-3 minus
    repair) under the driver oracle: scan text synthesized from documents
    (injected label tokens — valid, corrupt, lowercase, junk — around a
    sanitized prose fragment), emit (token, 0-based begin/end offsets,
    pattern_id, is_valid) per match.  Offsets are reconstructed from the
    split/extract-all arrays: begin_p = Σ|segs≤p| + Σ|fulls<p| + the
    consumed-boundary width of match p."""
    cast_str = "STRING" if dialect == "spark" else "VARCHAR"
    gflag = "" if dialect == "spark" else ", 'g'"
    frag = f"regexp_replace(lower(substring(text, 1, 60)), '[^a-z ]', ''{gflag})"
    src = (
        "SELECT doc_id, concat('see ', "
        "CASE WHEN doc_id % 4 = 0 THEN 'MW1.1.2.15.7B.12.8' "
        "WHEN doc_id % 4 = 1 THEN 'ago.10 and KEN.0.2.3.5.8.11' "
        "WHEN doc_id % 4 = 2 THEN 'ZZZ.99.Q near AB1.2x' "
        "ELSE 'plain prose only' END, ' ', "
        f"{frag}, ' tail MWI.0.1.4.', CAST(doc_id % 20 AS {cast_str}), '.15.7') AS s "
        f"FROM {table}"
    )
    from ocr_auto_label_spark.functions.flagship_sql import token_matches_sql

    exploded = token_matches_sql(dialect, ["doc_id"], "src")
    pid = pattern_id_sql("token")
    return (
        f"WITH src AS ({src}), x AS ({exploded}) "
        f"SELECT doc_id, tok_idx, token, begin_off, "
        f"begin_off + length(token) AS end_off, {pid} AS pattern_id, "
        f"CAST(({pid}) IS NOT NULL AS INT) AS is_valid FROM x"
    )


# PII scrubbing (training-data hygiene): regexes are RE2+Java compatible
# (no lookarounds, no capture groups — explicit group 0 everywhere since
# Spark's regexp_extract_all defaults to group 1 when parens exist).
_PII_RULES: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"[+]?[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}", "<PHONE>"),
    ("ip", r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>"),
)


def _pii_scrub_sql(dialect: str) -> str:
    """PII scrub + tally over text synthesized from documents (injected
    deterministic email/phone/IP around a sanitized prose fragment):
    per-type match counts on the raw string, then ordered redaction
    (email → phone → IP) to typed placeholders.  The scrubbed string is
    hash-compared verbatim, so both engines must agree on every
    replacement boundary."""
    cast_str = "STRING" if dialect == "spark" else "VARCHAR"
    gflag = "" if dialect == "spark" else ", 'g'"
    esc = (lambda rx: rx.replace("\\", "\\\\")) if dialect == "spark" else (lambda rx: rx)
    size_fn = "size" if dialect == "spark" else "len"
    frag = f"regexp_replace(lower(substring(text, 1, 60)), '[^a-z ]', ''{gflag})"
    src = (
        "SELECT doc_id, concat('contact u', CAST(doc_id AS {c}), '@example.com ', "
        "CASE WHEN doc_id % 3 = 0 THEN concat('call ', lpad(CAST(doc_id % 1000 AS {c}), 3, '9'), "
        "'-', lpad(CAST(doc_id % 100 AS {c}), 3, '0'), '-', lpad(CAST(doc_id % 10000 AS {c}), 4, '0'), ' ') "
        "ELSE '' END, "
        "'from 10.0.', CAST(doc_id % 256 AS {c}), '.', CAST(doc_id % 100 AS {c}), ' ', "
        "{frag}) AS s FROM documents"
    ).format(c=cast_str, frag=frag)
    counts = ", ".join(
        f"{size_fn}(regexp_extract_all(s, '{esc(rx)}', 0)) AS n_{name}"
        for name, rx, _ in _PII_RULES
    )
    scrubbed = "s"
    for _, rx, repl in _PII_RULES:
        scrubbed = f"regexp_replace({scrubbed}, '{esc(rx)}', '{repl}'{gflag})"
    return (
        f"WITH src AS ({src}) "
        f"SELECT doc_id, {counts}, {scrubbed} AS scrubbed FROM src"
    )


def _token_scan_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread the scan: the local documents table is one parquet file
    # (1 scan task) and the regex pipeline is per-row CPU; on a real
    # multi-file Iceberg table ensure_parallelism is a no-op
    from ocr_auto_label_spark.operators.util import ensure_parallelism

    docs = ensure_parallelism(
        spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    )
    docs.createOrReplaceTempView("__token_scan_docs")
    return spark.sql(_token_scan_sql("spark", table="__token_scan_docs"))


def _x4_confusion_repair_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 confusion correction under the driver oracle (VERDICT r2 #1):
    the exact best_correction fan-out — substitutions → period insertions
    → two-edit composites, first-grammar-valid-wins — compiled to SQL
    (functions/confusion_sql.py) over the shared fixture.  The pure-Python
    twin equality is asserted byte-for-byte in tests/test_confusion_fuzzy.py;
    reference semantics gemini.ts:94-98, 107-114, 166."""
    from ocr_auto_label_spark.functions.confusion_sql import (
        X4_FIXTURE_CODES,
        repair_select_sql,
    )

    return spark.sql(repair_select_sql("spark", list(X4_FIXTURE_CODES)))


def _x4_confusion_repair_duck() -> str:
    from ocr_auto_label_spark.functions.confusion_sql import (
        X4_FIXTURE_CODES,
        repair_select_sql,
    )

    return repair_select_sql("duck", list(X4_FIXTURE_CODES))


def _fuzzy_join_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ocr_auto_label_spark.operators.fuzzy_join import fuzzy_canonical_join

    codes = [(i, c) for i, c in enumerate(_grammar_codes())]
    df = spark.createDataFrame(codes, "code_id: int, code: string")
    return fuzzy_canonical_join(df)


def _fuzzy_join_duck() -> str:
    from ocr_auto_label_spark.labelcore.canonical import canonical_labels

    dim_vals = ", ".join(f"('{label}')" for label, _ in canonical_labels())
    probe_vals = ", ".join(
        "({}, '{}')".format(i, c.replace("'", "''")) for i, c in enumerate(_grammar_codes())
    )
    return f"""
WITH dim AS (SELECT label FROM (VALUES {dim_vals}) d(label)),
probe AS (SELECT code_id, code FROM (VALUES {probe_vals}) t(code_id, code)),
scored AS (
  SELECT p.code_id, p.code, d.label AS canon,
         levenshtein(upper(trim(p.code)), d.label) AS dist
  FROM probe p LEFT JOIN dim d
    ON string_split(d.label, '.')[1] = string_split(upper(trim(p.code)), '.')[1]
   AND len(string_split(d.label, '.')) = len(string_split(upper(trim(p.code)), '.'))),
masked AS (
  SELECT code_id, code, canon,
         CASE WHEN dist <= 1 THEN dist END AS mdist
  FROM scored),
ranked AS (
  SELECT code_id, code, canon, mdist,
         row_number() OVER (PARTITION BY code_id
                            ORDER BY mdist ASC NULLS LAST, canon ASC NULLS LAST) AS rn
  FROM masked)
SELECT code_id, code,
       CASE WHEN mdist IS NOT NULL THEN canon END AS canonical,
       mdist AS distance
FROM ranked WHERE rn = 1
"""


def _multimodal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One plan exercising the whole multimodal surface: codec-decoded
    features + resize planning + video frame-sample counts (see
    operators/multimodal.py ``media_profile``)."""
    from ocr_auto_label_spark.operators.multimodal import media_profile, synth_media

    return media_profile(synth_media(spark, n=120))


def _multimodal_profile_duck() -> str:
    """Golden-replay oracle (r5 — the last rows-only entry converted):
    the generator recomputes the expected profile OUTSIDE Spark from the
    same deterministic synthetic rows — the REAL stdlib-wave codec for
    audio, the byte-derived fallback for the env-blocked image/video
    decoders, the resize rule via the Decimal(repr)·HALF_UP device that
    replicates Spark's BigDecimal rounding, frame counts by integer
    arithmetic — and emits it as a VALUES table.

    What the driver row certifies: the distributed plumbing end-to-end —
    mapInPandas Arrow batching, the float32 feature round-trip, the
    ordered fold, the join/fill composition — produces exactly the
    reference computation's bytes at any parallelism.  What it does NOT
    certify: the codec algorithms themselves against an independent
    implementation (the decode IS the reference; its from-scratch checks
    live in tests/test_fuzzy_multimodal.py).  Documented in ORACLES.md."""
    from decimal import ROUND_HALF_UP, Decimal

    import pandas as pd

    from ocr_auto_label_spark.operators.multimodal import (
        WavAudioCodec,
        synth_media_rows,
    )

    rows = synth_media_rows(n=120, seed=13)
    payloads = pd.Series([bytes(p) for _, _, p, _ in rows])
    mtypes = pd.Series([mt for _, mt, _, _ in rows])
    feats = WavAudioCodec().decode_batch(payloads, mtypes)

    out_rows = []
    for (mid, mt, payload, meta), fvec in zip(rows, feats):
        w, h, dur, _codec = meta
        s = 0.0
        for v in fvec:  # the exact left fold Spark's aggregate() runs
            s += float(v)
        needs = int(len(payload) > 4 * 1024 * 1024 or max(w, h) > 1024)
        scale = min(1.0, 1024 / float(max(w, h)))
        tw = int(Decimal(repr(w * scale)).quantize(Decimal("1"), ROUND_HALF_UP))
        th = int(Decimal(repr(h * scale)).quantize(Decimal("1"), ROUND_HALF_UP))
        n_frames = max(1, dur // 5000) if mt == "video" else 0
        out_rows.append(
            f"({mid}, '{mt}', {len(payload)}, CAST({s!r} AS DOUBLE), "
            f"{needs}, {tw}, {th}, {n_frames})"
        )
    vals = ",\n".join(out_rows)
    return f"""
SELECT CAST(media_id AS BIGINT) AS media_id, media_type,
       CAST(payload_bytes AS INT) AS payload_bytes, feature_sum,
       CAST(needs_resize AS INT) AS needs_resize,
       CAST(target_width AS INT) AS target_width,
       CAST(target_height AS INT) AS target_height,
       CAST(n_frames AS BIGINT) AS n_frames
FROM (VALUES
{vals}
) v(media_id, media_type, payload_bytes, feature_sum, needs_resize,
    target_width, target_height, n_frames)
"""


def _layout_fixture_sql(dialect: str) -> str:
    """Deterministic layout-block fixture from the documents table, one
    SELECT per dialect with IDENTICAL semantics: each doc gets
    ``doc_id % 3 + 1`` pages, each page four typed geometry blocks — a
    running header, two columns of content (text windows shifted per
    page), and a constant footer.  Headers/footers recur at the same
    (text, y-band) across pages, which is exactly what the chrome rule
    detects on multi-page docs."""
    if dialect == "spark":
        pages = (
            "SELECT doc_id, lang, text, page FROM documents "
            "LATERAL VIEW explode(sequence(1, CAST(doc_id % 3 + 1 AS INT))) t AS page"
        )
    else:
        pages = (
            "SELECT doc_id, lang, text, CAST(unnest(range(1, "
            "CAST(doc_id % 3 + 2 AS BIGINT))) AS INT) AS page FROM documents"
        )
    return f"""
SELECT doc_id, page, b.block_id,
  CASE b.block_id WHEN 0 THEN 50 WHEN 1 THEN 40 WHEN 2 THEN 520 ELSE 400 END AS x,
  CASE b.block_id WHEN 0 THEN 10 WHEN 1 THEN CAST(100 + (doc_id % 7) * 10 AS INT)
       WHEN 2 THEN 120 ELSE 950 END AS y,
  CASE b.block_id WHEN 0 THEN 900 WHEN 3 THEN 200 ELSE 440 END AS w,
  CASE b.block_id WHEN 0 THEN 20 WHEN 3 THEN 15 ELSE 300 END AS h,
  CASE b.block_id WHEN 0 THEN concat('CONFIDENTIAL ', lang)
       WHEN 1 THEN substr(text, 1 + (page - 1) * 17, 40)
       WHEN 2 THEN substr(text, 1 + (page - 1) * 29, 40)
       ELSE 'generated by layout parser' END AS text
FROM ({pages}) p
CROSS JOIN (VALUES (0), (1), (2), (3)) AS b(block_id)
"""


def _multimodal_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic planning half of the multimodal/document
    surface under the driver oracle, two variants:

    - ``resize`` (VERDICT r2 #4): the REAL ``resize_metadata`` operator
      (gemini.ts:26-31 resize-if-large planning as pure column math)
      over a media-shaped frame synthesized from documents — typed meta
      struct + an actual binary payload whose length feeds the >4MB
      rule.  Codec features stay in the rows-only ``multimodal_profile``
      (decode is environment-blocked for image/video).
    - ``layout`` (the north rule's "PDF/layout parse" leg): the REAL
      ``layout_reading_order`` operator — running header/footer removal
      by (text, y-band) recurrence across pages + XY-cut-lite
      multi-column reading order — over the deterministic block-geometry
      fixture; the DuckDB oracle replays fixture AND analysis in SQL.

    Normalized to (variant, k, v1, v2, v3): resize → (media_id,
    needs_resize, target_w, target_h); layout → (doc*1000 + page*10 +
    block, is_chrome, ord|NULL, page)."""
    from ocr_auto_label_spark.operators.multimodal import (
        layout_reading_order,
        resize_metadata,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.expr("cast(repeat('x', cast(doc_id % 50 + 1 as int)) as binary)").alias("payload"),
        F.struct(
            (F.lit(64) + (F.col("doc_id") * 37) % 3000).cast("int").alias("width"),
            (F.lit(64) + (F.col("doc_id") * 53) % 2000).cast("int").alias("height"),
            F.lit(0).cast("int").alias("duration_ms"),
            F.lit("jpeg").alias("codec"),
        ).alias("meta"),
    )
    resize = resize_metadata(media).select(
        F.lit("resize").alias("variant"),
        F.col("media_id").cast("long").alias("k"),
        F.col("needs_resize").cast("long").alias("v1"),
        F.col("target_width").cast("long").alias("v2"),
        F.col("target_height").cast("long").alias("v3"),
    )
    docs.createOrReplaceTempView("__layout_docs")
    blocks = spark.sql(
        _layout_fixture_sql("spark").replace("FROM documents", "FROM __layout_docs")
    )
    layout = layout_reading_order(blocks).select(
        F.lit("layout").alias("variant"),
        (F.col("doc_id") * 1000 + F.col("page") * 10 + F.col("block_id"))
        .cast("long").alias("k"),
        F.col("is_chrome").cast("long").alias("v1"),
        F.col("ord").cast("long").alias("v2"),
        F.col("page").cast("long").alias("v3"),
    )
    return resize.unionByName(layout)


def _resize_layout_duck() -> str:
    fixture = _layout_fixture_sql("duck")
    return f"""
WITH m AS (SELECT doc_id AS media_id,
  CAST(64 + (doc_id * 37) % 3000 AS INT) AS w,
  CAST(64 + (doc_id * 53) % 2000 AS INT) AS h,
  CAST(doc_id % 50 + 1 AS INT) AS plen FROM documents),
blocks AS MATERIALIZED ({fixture}),
marked AS MATERIALIZED (
  SELECT bl.*, bl.y // 50 AS yband,
         CASE WHEN ch.doc_id IS NULL THEN 0 ELSE 1 END AS is_chrome
  FROM blocks bl LEFT JOIN (
    SELECT doc_id, text, y // 50 AS yband FROM blocks
    GROUP BY 1, 2, 3 HAVING count(DISTINCT page) >= 2) ch
  ON bl.doc_id = ch.doc_id AND bl.text = ch.text AND bl.y // 50 = ch.yband),
ranked AS (
  SELECT doc_id, page, block_id, is_chrome,
         row_number() OVER (PARTITION BY doc_id, is_chrome
           ORDER BY page, x // 500, y, x, block_id) AS rn
  FROM marked)
SELECT 'resize' AS variant, CAST(media_id AS BIGINT) AS k,
  CAST((plen > 4194304 OR greatest(w, h) > 1024) AS BIGINT) AS v1,
  CAST(round(w * least(1.0, 1024 / CAST(greatest(w, h) AS DOUBLE))) AS BIGINT) AS v2,
  CAST(round(h * least(1.0, 1024 / CAST(greatest(w, h) AS DOUBLE))) AS BIGINT) AS v3
FROM m
UNION ALL
SELECT 'layout' AS variant,
  CAST(doc_id * 1000 + page * 10 + block_id AS BIGINT) AS k,
  CAST(is_chrome AS BIGINT) AS v1,
  CAST(CASE WHEN is_chrome = 0 THEN rn END AS BIGINT) AS v2,
  CAST(page AS BIGINT) AS v3
FROM ranked
"""


# ------------------------------------------------------ operator-backed

def _sf_turns(sf_dir: str) -> int:
    if "0.001" in sf_dir:
        return 2_000
    if "0.01" in sf_dir:
        return 20_000
    return 100_000


def _synthetic_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ocr_auto_label_spark.datagen import transcripts_parquet

    return spark.read.parquet(transcripts_parquet(_sf_turns(sf_dir)))


def _extract_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ocr_auto_label_spark.plans.extraction_pipeline import (
        FLAGSHIP_COLS,
        extract_candidates_flat,
    )

    # Narrow path, zero shuffles: per-turn extraction needs no repartition —
    # scan parallelism comes from the (multi-file) table layout, exactly as
    # on a real Iceberg table.  Salted repartitioning (north_star) is an
    # explicit primitive (plans.extraction_pipeline.salted_repartition,
    # exposed as jobs/run_extraction.py --salt-partitions) for inputs whose
    # files are clustered by conv_id; the sequential-transitive fold cannot
    # be salted (a conversation must fold whole), so hot-conv folds rely on
    # session-cluster containment instead (operators/grouping.py).
    flat = extract_candidates_flat(_synthetic_transcripts(spark, sf_dir))
    # begin/end widened to the twin oracle's BIGINT offsets (projection
    # only — the Arrow plan underneath is the production one)
    return (
        flat.select(*FLAGSHIP_COLS)
        .withColumn("begin", F.col("begin").cast("long"))
        .withColumn("end", F.col("end").cast("long"))
    )


def _extract_flagship_duck() -> str:
    """Oracle for the sf-scale flagship run itself (VERDICT r4 #3): the
    composed SQL twin (functions/flagship_sql.py) over the SAME cached
    synthetic corpus the Spark entry reads.  The driver evaluates
    correctness at sf0.01, so the oracle targets the 20 000-turn cache by
    default; the local contract test exports ENTRY_TEST_SF_DIR and gets
    the matching size.  Dialect parity of the twin is pinned byte-equal at
    2 000 turns in tests/test_flagship_twin.py; this entry extends the
    certification to the full driver-scale corpus (22 528 rows at sf0.01)."""
    import os

    from ocr_auto_label_spark.datagen import transcripts_parquet
    from ocr_auto_label_spark.functions.flagship_sql import flagship_twin_sql

    turns = _sf_turns(os.environ.get("ENTRY_TEST_SF_DIR", "/root/testdata/sf0.01"))
    path = transcripts_parquet(turns)
    return flagship_twin_sql("duck", f"read_parquet('{path}/*.parquet')")


def _extract_best_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-turn winner (rank-1 decision, upload.ts:881-902 analog) —
    the REAL ``best_labels`` Arrow plan over the pinned corpus, oracle =
    the SQL twin filtered the same way.  (The same plan at sf scale is
    ``extract_flagship``, which also carries the bench timing — this
    entry's job is the decision-step correctness row.)"""
    from ocr_auto_label_spark.datagen import transcripts_parquet
    from ocr_auto_label_spark.operators.util import ensure_parallelism
    from ocr_auto_label_spark.plans.extraction_pipeline import best_labels

    df = ensure_parallelism(spark.read.parquet(transcripts_parquet(2_000)))
    return best_labels(df).select(
        "conv_id", "turn_idx", "extracted_text", "label", "confidence"
    )


def _extract_best_labels_duck() -> str:
    from ocr_auto_label_spark.datagen import transcripts_parquet
    from ocr_auto_label_spark.functions.flagship_sql import flagship_twin_sql

    path = transcripts_parquet(2_000)
    twin = flagship_twin_sql("duck", f"read_parquet('{path}/*.parquet')")
    return (
        f"SELECT conv_id, turn_idx, extracted_text, label, confidence "
        f"FROM ({twin}) t WHERE t.\"rank\" = 1 OR t.\"rank\" IS NULL"
    )


def _extract_lineage_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-bucket lineage stats off the REAL operator chain
    (``with_part_bucket`` = pmod(xxhash64(conv_id), 16), Arrow
    ``extract_turns``) over the pinned corpus — oracle-backed since r4:
    XXH64 itself is compiled to DuckDB SQL (functions/xxh64_sql.py), so
    the bucket assignment AND the has-label extraction both replay in the
    oracle.  The at-scale lineage/resume machinery stays exercised by
    ``jobs/run_extraction.py`` + tests/test_lineage.py."""
    from ocr_auto_label_spark.datagen import transcripts_parquet
    from ocr_auto_label_spark.lineage import with_part_bucket
    from ocr_auto_label_spark.operators.util import ensure_parallelism
    from ocr_auto_label_spark.plans.extraction_pipeline import extract_turns

    pinned = ensure_parallelism(spark.read.parquet(transcripts_parquet(2_000)))
    df = with_part_bucket(pinned, 16)
    out = extract_turns(df)
    return out.groupBy("part_bucket").agg(
        F.count(F.lit(1)).alias("row_count"),
        F.sum((F.size("candidates") > 0).cast("long")).alias("turns_with_label"),
        F.round(F.avg((F.size("candidates") > 0).cast("double")), 6).alias("hit_rate"),
    )


def _extract_lineage_stats_duck() -> str:
    """pmod(xxhash64(conv_id), 16) replayed via the SQL XXH64 (16 divides
    2^64, so the signed pmod equals the unsigned remainder), has-label
    via the repair twin-lite."""
    from ocr_auto_label_spark.datagen import transcripts_parquet
    from ocr_auto_label_spark.functions.confusion_sql import repair_query_sql
    from ocr_auto_label_spark.functions.flagship_sql import token_matches_sql
    from ocr_auto_label_spark.functions.xxh64_sql import xxh64_str_staged_sql

    path = transcripts_parquet(2_000)
    scan = token_matches_sql("duck", ["conv_id", "turn_idx"], "scan_src")
    repair = repair_query_sql(
        "duck", "FROM matches", carry_cols=["conv_id", "turn_idx"],
        code_col="token",
    )
    convh = xxh64_str_staged_sql("FROM convs", "conv_id")
    return f"""
WITH src AS (SELECT conv_id, turn_idx, text, tool
             FROM read_parquet('{path}/*.parquet')),
scan_src AS (
  SELECT conv_id, turn_idx, text AS s FROM src
  UNION ALL
  SELECT conv_id, turn_idx, tool AS s FROM src WHERE tool IS NOT NULL),
matches AS ({scan}),
repairq AS ({repair}),
hits AS (SELECT DISTINCT conv_id, turn_idx FROM repairq
         WHERE repaired IS NOT NULL),
convs AS (SELECT DISTINCT conv_id FROM src),
cb AS (SELECT conv_id, CAST(__xxh_u % 16 AS INT) AS part_bucket
       FROM ({convh}) z),
turns AS (
  SELECT s.conv_id, (h.conv_id IS NOT NULL) AS has_label
  FROM src s LEFT JOIN hits h
    ON s.conv_id = h.conv_id AND s.turn_idx = h.turn_idx)
SELECT b.part_bucket, count(*) AS row_count,
       CAST(sum(CASE WHEN t.has_label THEN 1 ELSE 0 END) AS BIGINT)
         AS turns_with_label,
       CAST(round(avg(CASE WHEN t.has_label THEN 1.0 ELSE 0.0 END), 6)
         AS DOUBLE) AS hit_rate
FROM turns t JOIN cb b USING (conv_id) GROUP BY b.part_bucket
"""


def _flagship_twin_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL Arrow-UDF flagship pipeline vs the composed SQL twin
    (functions/flagship_sql.py — token scan → confusion repair → blocked
    fuzzy canonical match → confidence rank + the boilerplate-normalizer
    twin): the Spark side here runs ``extract_candidates_flat`` itself
    (ArrowEvalPython, the production operator), and the driver hashes it
    against the twin's DuckDB dialect — so the driver-side green row
    certifies the ARROW extraction output, not merely a SQL
    reformulation of it.  The Spark-SQL dialect of the twin is pinned
    byte-equal to both in tests/test_flagship_twin.py (three independent
    implementations agree).  VERDICT r3 #2.

    Corpus pinned at 2 000 turns regardless of sf (like the streaming
    entries): the oracle SQL is a static string, so both sides must agree
    on the input independent of the driver's sf_dir; the at-scale
    flagship itself stays the separate ``extract_flagship`` entry."""
    from ocr_auto_label_spark.datagen import transcripts_parquet
    from ocr_auto_label_spark.operators.util import ensure_parallelism
    from ocr_auto_label_spark.plans.extraction_pipeline import (
        FLAGSHIP_COLS,
        extract_candidates_flat,
    )

    df = ensure_parallelism(spark.read.parquet(transcripts_parquet(2_000)))
    flat = extract_candidates_flat(df).select(*FLAGSHIP_COLS)
    # span/count types widened to the twin's SQL types (BIGINT offsets)
    return flat.withColumn("begin", F.col("begin").cast("long")).withColumn(
        "end", F.col("end").cast("long")
    )


def _flagship_twin_duck() -> str:
    """DuckDB oracle for the composed twin over the same pinned 2 000-turn
    cached parquet (read directly — the synthetic transcripts aren't among
    the driver's pre-registered views)."""
    from ocr_auto_label_spark.datagen import transcripts_parquet
    from ocr_auto_label_spark.functions.flagship_sql import flagship_twin_sql

    path = transcripts_parquet(2_000)
    return flagship_twin_sql("duck", f"read_parquet('{path}/*.parquet')")


def _full_pipeline_e1_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL composed E1 plan (plans/full_pipeline.py — Arrow
    extraction, applyInPandas fold, window naming) over the pinned 2k
    corpus, hash-compared against functions/e1_sql.py's DuckDB
    reformulation by the driver."""
    from ocr_auto_label_spark.datagen import transcripts_parquet
    from ocr_auto_label_spark.operators.util import ensure_parallelism
    from ocr_auto_label_spark.plans.full_pipeline import run_full_pipeline

    df = ensure_parallelism(spark.read.parquet(transcripts_parquet(2_000)))
    return run_full_pipeline(df)


def _full_pipeline_e1_duck() -> str:
    from ocr_auto_label_spark.datagen import transcripts_parquet
    from ocr_auto_label_spark.functions.e1_sql import full_pipeline_e1_duck_sql
    from ocr_auto_label_spark.functions.flagship_sql import flagship_twin_sql

    path = transcripts_parquet(2_000)
    rp = f"read_parquet('{path}/*.parquet')"
    return full_pipeline_e1_duck_sql(flagship_twin_sql("duck", rp), rp)


def _main_content_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Main-content extraction, two strategies over the pinned 2 000-turn
    transcript corpus as a variant union:

    - ``density``: per-line DOM-density classifier (Boilerpipe /
      jusText-lite: markup density, text length, separator density — see
      functions/maincontent_sql.py).  Pure higher-order column
      expressions — whole-stage codegen, zero Python, zero shuffles.
    - ``line_freq``: corpus-level boilerplate removal by cross-document
      line frequency (the CCNet/RefinedWeb rule — a line recurring in ≥5
      distinct conversations is chrome).  One line-key count-distinct
      aggregate + join-back + per-turn regroup.

    Both complement the flagship's ordered-regex normalizer
    (labelcore/boilerplate.py, the generalization of gemini.ts:223-231);
    both kept texts are hash-compared verbatim against the DuckDB dialect
    of the same generators."""
    from ocr_auto_label_spark.datagen import transcripts_parquet
    from ocr_auto_label_spark.functions.maincontent_sql import (
        line_freq_sql,
        main_content_sql,
    )

    from ocr_auto_label_spark.operators.dedup import remove_duplicated_spans
    from ocr_auto_label_spark.operators.util import ensure_parallelism

    path = transcripts_parquet(2_000)
    src = f"parquet.`{path}`"
    density = spark.sql(main_content_sql("spark", src)).select(
        F.lit("density").alias("variant"), "*"
    )
    line_freq = spark.sql(line_freq_sql("spark", src)).select(
        F.lit("line_freq").alias("variant"), "*"
    )
    # Lee et al. 2021 duplicated-substring REMOVAL (the transform behind
    # the dup_span_frac signal): the REAL operator runs Spark-side, the
    # driver hashes its rewritten text against the independent DuckDB
    # replay below — counts normalized into the entry schema (n_lines =
    # tokens before, n_kept = tokens after)
    spans = remove_duplicated_spans(
        ensure_parallelism(spark.read.parquet(path)), width=8
    ).select(
        F.lit("span_removal").alias("variant"),
        "conv_id",
        "turn_idx",
        F.col("new_text").alias("main_text"),
        F.col("n_tokens").alias("n_lines"),
        F.col("n_kept_tokens").alias("n_kept"),
        F.length("new_text").cast("long").alias("kept_chars"),
    )
    return density.unionByName(line_freq).unionByName(spans)


def _span_removal_duck(source: str, width: int) -> str:
    """Independent DuckDB replay of ``remove_duplicated_spans`` (Lee et
    al. 2021 one-copy-survives substring dedup) normalized to the
    main_content_extract schema."""
    w = width
    strip = "regexp_replace(text, '^\\s+|\\s+$', '', 'g')"
    return f"""
WITH sr_base AS MATERIALIZED (
  SELECT conv_id, turn_idx,
         CASE WHEN text IS NULL OR {strip} = '' THEN []
              ELSE regexp_split_to_array({strip}, '\\s+') END AS toks,
         CASE WHEN text IS NULL OR {strip} = '' THEN 0
              ELSE len(regexp_split_to_array({strip}, '\\s+')) END AS n
  FROM {source}),
sr_tok AS MATERIALIZED (
  SELECT conv_id, turn_idx, u.pos AS pos, u.token AS token
  FROM (SELECT conv_id, turn_idx,
               unnest(list_transform(range(1, len(toks) + 1),
                      i -> struct_pack(pos := i - 1, token := toks[i]))) AS u
        FROM sr_base) z),
sr_occ AS MATERIALIZED (
  SELECT conv_id, turn_idx, u.p AS p, u.span AS span,
         concat(conv_id, '/', lpad(CAST(turn_idx AS VARCHAR), 12, '0'),
                '/', lpad(CAST(u.p AS VARCHAR), 12, '0')) AS okey
  FROM (SELECT conv_id, turn_idx,
               unnest(list_transform(range(1, greatest(n - {w} + 1, 0) + 1),
                      i -> struct_pack(p := i - 1,
                        span := array_to_string(list_slice(toks, i, i + {w} - 1), ' ')))) AS u
        FROM sr_base) z),
sr_stats AS MATERIALIZED (
  SELECT span, count(*) AS c, min(okey) AS canon FROM sr_occ GROUP BY span),
sr_cov AS (
  SELECT DISTINCT conv_id, turn_idx, pos FROM (
    SELECT o.conv_id, o.turn_idx, unnest(range(o.p, o.p + {w})) AS pos
    FROM sr_occ o JOIN sr_stats s USING (span)
    WHERE s.c > 1 AND o.okey <> s.canon) q),
sr_kept AS (
  SELECT t.conv_id, t.turn_idx, t.pos, t.token
  FROM sr_tok t ANTI JOIN sr_cov c
    ON t.conv_id = c.conv_id AND t.turn_idx = c.turn_idx AND t.pos = c.pos),
sr_reb AS (
  SELECT conv_id, turn_idx, string_agg(token, ' ' ORDER BY pos) AS nt,
         count(*) AS nk
  FROM sr_kept GROUP BY 1, 2)
SELECT 'span_removal' AS variant, b.conv_id, b.turn_idx,
       coalesce(r.nt, '') AS main_text,
       CAST(b.n AS BIGINT) AS n_lines,
       CAST(coalesce(r.nk, 0) AS BIGINT) AS n_kept,
       CAST(length(coalesce(r.nt, '')) AS BIGINT) AS kept_chars
FROM sr_base b LEFT JOIN sr_reb r USING (conv_id, turn_idx)
"""


def _main_content_duck() -> str:
    from ocr_auto_label_spark.datagen import transcripts_parquet
    from ocr_auto_label_spark.functions.maincontent_sql import (
        line_freq_sql,
        main_content_sql,
    )

    path = transcripts_parquet(2_000)
    src = f"read_parquet('{path}/*.parquet')"
    return (
        f"SELECT 'density' AS variant, * FROM ({main_content_sql('duck', src)}) a "
        f"UNION ALL SELECT 'line_freq' AS variant, * FROM ({line_freq_sql('duck', src)}) b "
        f"UNION ALL SELECT * FROM ({_span_removal_duck(src, 8)}) c"
    )


_SEARCH_POSTING_TERMS = ("merge", "spark", "window")
# the AND query probes exactly the posting-variant terms — one constant,
# so the two variants can't silently diverge
_SEARCH_MUST_TERMS = list(_SEARCH_POSTING_TERMS)
# "table hash" occurs ~48× across ~46 docs at sf0.01 — a phrase query
# with both multi-doc hits and a repeat-within-doc hit
_PHRASE_TERMS = ("table", "hash")
# CMS probes: the query terms, the phrase words, and one absent term
# (exercises the missing-cell → 0 path, modulo collisions, identically
# in both engines)
_CMS_PROBE_TERMS = ("merge", "spark", "window", "table", "zzz_absent")
_BM25_TOP_K = 25
_F1_F5_BASE_SQL = (
    "SELECT 'status_agg' AS variant, event_type AS k, count(*) AS cnt, "
    "round(sum(value), 4) AS val "
    "FROM events WHERE event_type IN ('click', 'purchase') GROUP BY event_type "
    "UNION ALL "
    "SELECT 'search' AS variant, CAST(doc_id AS {str_t}) AS k, "
    "CAST(n_chars AS BIGINT) AS cnt, CAST(NULL AS DOUBLE) AS val "
    "FROM documents WHERE text LIKE '%spark%' AND lang = 'en'"
)


_SEARCH_INDEX_BUCKETS = 16


def _f1_f5_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F6 status-set agg + F5 contains-search (images.ts:143-149)
    PLUS the shape the contains-scan grows into at 10¹² docs: an
    inverted index (term → df + sorted postings) and an index-backed
    boolean AND query answered by posting intersection — no text scan
    at query time (operators/search.py).  Variants:

    - ``posting``: k = term, cnt = df, val = Σ posting ids (an exact
      integer-valued double — the postings checksum);
    - ``bool_search``: docs containing ALL of {merge, spark, window},
      k = doc_id, cnt = the doc's n_chars;
    - ``bm25``: ranked retrieval over the same query — ratio-idf BM25
      (bit-exact doubles cross-engine, operators/search.py:bm25_search),
      global top-25 by (score DESC, id), k = doc_id, cnt = doc length;
    - ``phrase``: positional-index exact-phrase query "table hash",
      k = doc_id, cnt = number of start positions;
    - ``cms``: count-min-sketch point estimates (operators/sketch.py,
      grid rebuilt bit-exactly in DuckDB via the staged XXH64 SQL) for
      five probe terms, k = term, cnt = estimate, val = true count —
      the CMS one-sided-error invariant (cnt ≥ val) is driver-visible;
    - ``hll_reg`` / ``hll_est``: HyperLogLog distinct-count sketch —
      every register exactly compared (integer-only rank math), plus
      the raw estimate (one exact-integer sum → one cast → one divide,
      bit-stable) next to the true vocabulary size.
    """
    from ocr_auto_label_spark.operators.search import (
        bm25_search_indexed,
        boolean_search_indexed,
        phrase_search,
        read_index_terms,
        write_search_index,
    )
    from ocr_auto_label_spark.operators.sketch import (
        bloom_build,
        bloom_might_contain,
        cms_build,
        cms_estimate,
        hll_estimate,
        hll_registers,
    )
    from ocr_auto_label_spark.operators.textstats import word_tokens

    from ocr_auto_label_spark.operators.util import ensure_parallelism

    load_views(spark, sf_dir)
    base = spark.sql(_F1_F5_BASE_SQL.format(str_t="STRING"))
    # spread the single-file scan: the index build's tokenize+explode map
    # side is the CPU-dense part (no-op on multi-file production layouts);
    # then materialize once — seven operators below (index, bm25, phrase,
    # true counts, CMS, Bloom, HLL) each derive their own token stream,
    # and without the checkpoint each would re-read the parquet
    docs = ensure_parallelism(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    ).localCheckpoint(eager=True)
    # MATERIALIZED index (VERDICT r4 #6): written partitionBy(term-hash
    # bucket) once, so the posting / bool_search / bm25 rows below are
    # answered by PARTITION-PRUNED index reads, never a corpus rescan —
    # the driver row now certifies the production (on-disk) search path.
    # Per-process FIXED path + overwrite mode: rebuilt per entry build,
    # never accumulating tempdirs across runs.  The three search legs
    # share ONE pruned slice read (the posting and query term sets are
    # the same constants), checkpointed so each leg reuses the pruned
    # scan instead of re-listing and re-reading the buckets.
    import os
    import tempfile

    from ocr_auto_label_spark.operators.search import (
        bm25_from_index_slice,
        boolean_search,
    )

    idx_path = os.path.join(
        tempfile.gettempdir(), f"spark_graft_search_idx_{os.getpid()}", "index"
    )
    write_search_index(docs, idx_path, n_buckets=_SEARCH_INDEX_BUCKETS)
    probe_all = sorted(set(_SEARCH_POSTING_TERMS) | set(_SEARCH_MUST_TERMS))
    idx_slice = read_index_terms(
        spark, idx_path, probe_all
    ).localCheckpoint(eager=True)
    posting = idx_slice.filter(
        F.col("term").isin(list(_SEARCH_POSTING_TERMS))
    ).select(
        F.lit("posting").alias("variant"),
        F.col("term").alias("k"),
        F.col("df_cnt").alias("cnt"),
        F.expr(
            "CAST(aggregate(postings, 0L, (s, x) -> s + x) AS DOUBLE)"
        ).alias("val"),
    )
    found = boolean_search(idx_slice, _SEARCH_MUST_TERMS).join(
        docs.select(F.col("doc_id").alias("id"), "n_chars"), "id"
    ).select(
        F.lit("bool_search").alias("variant"),
        F.col("id").cast("string").alias("k"),
        F.col("n_chars").cast("long").alias("cnt"),
        F.lit(None).cast("double").alias("val"),
    )
    bm = bm25_from_index_slice(
        spark,
        idx_slice.filter(F.col("term").isin(list(_SEARCH_MUST_TERMS))),
        idx_path,
        list(_SEARCH_MUST_TERMS),
        top_k=_BM25_TOP_K,
    ).select(
        F.lit("bm25").alias("variant"),
        F.col("id").cast("string").alias("k"),
        F.col("dl").cast("long").alias("cnt"),
        F.col("score").alias("val"),
    )
    ph = phrase_search(docs, list(_PHRASE_TERMS)).select(
        F.lit("phrase").alias("variant"),
        F.col("id").cast("string").alias("k"),
        F.col("n_match").cast("long").alias("cnt"),
        F.lit(None).cast("double").alias("val"),
    )
    probe_terms = list(_CMS_PROBE_TERMS)
    truec = (
        docs.select(
            F.explode(
                F.filter(
                    word_tokens(F.col("text")), lambda w: w != F.lit("")
                )
            ).alias("term")
        )
        .filter(F.col("term").isin(probe_terms))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("true_cnt"))
    )
    cms = (
        cms_estimate(cms_build(docs), probe_terms)
        .join(truec, "term", "left")
        .select(
            F.lit("cms").alias("variant"),
            F.col("term").alias("k"),
            F.col("est").cast("long").alias("cnt"),
            F.coalesce(F.col("true_cnt"), F.lit(0))
            .cast("double")
            .alias("val"),
        )
    )
    blm = bloom_might_contain(bloom_build(docs), probe_terms).select(
        F.lit("bloom").alias("variant"),
        F.col("term").alias("k"),
        F.col("hits").alias("cnt"),
        F.when(F.col("might_contain"), F.lit(1.0))
        .otherwise(F.lit(0.0))
        .alias("val"),
    )
    regs = hll_registers(docs)
    hllr = regs.select(
        F.lit("hll_reg").alias("variant"),
        F.col("bucket").cast("string").alias("k"),
        F.col("max_rank").cast("long").alias("cnt"),
        F.lit(None).cast("double").alias("val"),
    )
    hlle_base = hll_estimate(regs).crossJoin(
        # the HLL truth: distinct-term count — one row per term in the
        # materialized index, counted across all buckets
        spark.read.parquet(f"{idx_path}/terms")
        .agg(F.count(F.lit(1)).alias("n_terms"))
    )
    # raw estimator compared RAW (exact-integer sum → one divide);
    # the linear-counting branch goes through ln → 1e-3 floor (the
    # unigram_nll precedent)
    hlle = hlle_base.select(
        F.lit("hll_est").alias("variant"),
        F.lit("raw").alias("k"),
        F.col("n_terms").cast("long").alias("cnt"),
        F.col("estimate_raw").alias("val"),
    ).unionByName(
        hlle_base.select(
            F.lit("hll_est").alias("variant"),
            F.lit("corrected").alias("k"),
            F.col("n_terms").cast("long").alias("cnt"),
            (F.floor(F.col("estimate") * 1000) / 1000).alias("val"),
        )
    )
    return (
        base.unionByName(posting)
        .unionByName(found)
        .unionByName(bm)
        .unionByName(ph)
        .unionByName(cms)
        .unionByName(blm)
        .unionByName(hllr)
        .unionByName(hlle)
    )


def _f1_f5_suite_duck() -> str:
    from ocr_auto_label_spark.functions.xxh64_sql import (
        xxh64_int4_py,
        xxh64_str_staged_sql,
    )
    from ocr_auto_label_spark.operators.search import BM25_B, BM25_K1
    from ocr_auto_label_spark.operators.sketch import (
        BLOOM_M,
        CMS_DEPTH,
        CMS_WIDTH,
        HLL_P,
        hll_constants,
    )

    terms = ", ".join(f"'{t}'" for t in _SEARCH_POSTING_TERMS)
    must = ", ".join(f"'{t}'" for t in _SEARCH_MUST_TERMS)
    base = _F1_F5_BASE_SQL.format(str_t="VARCHAR")

    # ---- bm25: replicate bm25_search's exact IEEE op tree (constants
    # folded in Python exactly as the operator folds them) ------------
    k1, b = BM25_K1, BM25_B
    k1p1, omb = k1 + 1.0, 1.0 - b
    avgdl = "(CAST(s.tot_dl AS DOUBLE) / CAST(s.n_docs AS DOUBLE))"
    idf = (
        "((CAST(s.n_docs - f.df_t AS DOUBLE) + CAST(0.5 AS DOUBLE)) / "
        "(CAST(f.df_t AS DOUBLE) + CAST(0.5 AS DOUBLE)))"
    )
    sat = (
        f"((CAST(t.tf AS DOUBLE) * CAST({k1p1!r} AS DOUBLE)) / "
        f"(CAST(t.tf AS DOUBLE) + CAST({k1!r} AS DOUBLE) * "
        f"(CAST({omb!r} AS DOUBLE) + CAST({b!r} AS DOUBLE) * "
        f"(CAST(l.dl AS DOUBLE) / {avgdl}))))"
    )
    # fixed left-to-right per-term sum (SQL + is left-associative, the
    # same tree the operator builds)
    score = " + ".join(
        f"coalesce(max(CASE WHEN term = '{t}' THEN contrib END), "
        "CAST(0 AS DOUBLE))"
        for t in _SEARCH_MUST_TERMS
    )

    # ---- phrase: positional legs joined on (doc, start) --------------
    ph_from = (
        f"(SELECT doc_id, pos AS start FROM ipos "
        f"WHERE term = '{_PHRASE_TERMS[0]}') p0"
    )
    for i, t in enumerate(_PHRASE_TERMS[1:], start=1):
        ph_from += (
            f" JOIN (SELECT doc_id, pos - {i} AS start FROM ipos "
            f"WHERE term = '{t}') p{i} "
            f"ON p0.doc_id = p{i}.doc_id AND p0.start = p{i}.start"
        )

    # ---- cms: rebuild the grid per hash row from the distinct vocab --
    # (hash once per distinct term × row — the distinct-vocab trick —
    # then weight by occurrence count); row j's seed is Spark's chained
    # xxhash64: the IntegerType child j hashed 4-byte-LE with seed 42
    probes_vals = ", ".join(f"('{t}')" for t in _CMS_PROBE_TERMS)
    cms_ctes = []
    est_legs, blm_bit_legs, blm_probe_legs = [], [], []
    for j in range(CMS_DEPTH):
        # HUGEINT cast up front: a bare 19-digit literal parses as
        # BIGINT and overflows INT64 inside the first seed addition
        seed = f"CAST({xxh64_int4_py(j, 42)} AS HUGEINT)"
        vh = xxh64_str_staged_sql("FROM icnt", "term", seed)
        pb = xxh64_str_staged_sql("FROM iprobes", "term", seed)
        # one hash pass per j serves BOTH sketches (CMS buckets and
        # Bloom bit positions are just different power-of-two mods)
        cms_ctes.append(
            f"ivh{j} AS MATERIALIZED (SELECT term, cnt, __xxh_u AS hu "
            f"FROM ({vh}) zv{j})"
        )
        cms_ctes.append(
            f"ipb{j} AS MATERIALIZED (SELECT term, __xxh_u AS hu "
            f"FROM ({pb}) zp{j})"
        )
        cms_ctes.append(
            f"igr{j} AS (SELECT CAST(hu % {CMS_WIDTH} AS BIGINT) AS "
            f"bucket, sum(cnt) AS gcnt FROM ivh{j} GROUP BY 1)"
        )
        est_legs.append(
            f"SELECT p.term, coalesce(g.gcnt, 0) AS c "
            f"FROM (SELECT term, CAST(hu % {CMS_WIDTH} AS BIGINT) AS "
            f"bucket FROM ipb{j}) p LEFT JOIN igr{j} g USING (bucket)"
        )
        blm_bit_legs.append(
            f"SELECT CAST(hu % {BLOOM_M} AS BIGINT) AS pos FROM ivh{j}"
        )
        blm_probe_legs.append(
            f"SELECT term, CAST(hu % {BLOOM_M} AS BIGINT) AS pos "
            f"FROM ipb{j}"
        )
    cms_with = ",\n".join(cms_ctes)
    est_union = " UNION ALL ".join(est_legs)
    blm_bits = " UNION ALL ".join(blm_bit_legs)
    blm_probes = " UNION ALL ".join(blm_probe_legs)

    # ---- hll: registers from the distinct vocab (register max over a
    # multiset == over its set), rank via base-2 digit strings ---------
    m_hll, kp1, numer = hll_constants(HLL_P)
    k_hll = 64 - HLL_P
    two_k = 1 << k_hll
    hll_hash = xxh64_str_staged_sql(
        "FROM (SELECT term FROM icnt) hv", "term"
    )
    hll_rank = (
        f"CASE WHEN hu % {two_k} = 0 THEN {k_hll + 1} "
        f"ELSE {k_hll + 1} - length(ltrim(bin(CAST(hu % {two_k} "
        "AS BIGINT)), '0')) END"
    )
    # coalesce mirrors the Spark side: an empty corpus sums to NULL,
    # which must read as 0 set registers, not a NULL estimate
    hll_stot = (
        f"(CAST(coalesce(h.s_hit, 0) AS HUGEINT) + "
        f"CAST({m_hll} - h.n_hit AS HUGEINT)"
        f" * CAST({1 << kp1} AS HUGEINT))"
    )
    hll_raw = f"(CAST({numer!r} AS DOUBLE) / CAST({hll_stot} AS DOUBLE))"
    hll_corr = (
        f"CASE WHEN h.n_hit < {m_hll} AND {hll_raw} <= "
        f"CAST({2.5 * m_hll!r} AS DOUBLE) THEN "
        f"CAST({float(m_hll)!r} AS DOUBLE) * ln("
        f"CAST({float(m_hll)!r} AS DOUBLE) / "
        f"CAST({m_hll} - h.n_hit AS DOUBLE)) "
        f"ELSE {hll_raw} END"
    )

    return f"""
WITH ifl AS MATERIALIZED (
  SELECT doc_id, list_filter({_duck_tokens('text')}, w -> w <> '') AS toks
  FROM documents),
itoks AS MATERIALIZED (SELECT doc_id, unnest(toks) AS term FROM ifl),
ipairs AS MATERIALIZED (SELECT DISTINCT doc_id, term FROM itoks),
iidx AS (SELECT term, count(*) AS dfc, sum(doc_id) AS chk
         FROM ipairs GROUP BY term),
idl AS MATERIALIZED (SELECT doc_id, count(*) AS dl FROM itoks
                     GROUP BY doc_id),
istat AS (SELECT count(*) AS n_docs, sum(dl) AS tot_dl FROM idl),
itf AS (SELECT doc_id, term, count(*) AS tf FROM itoks
        WHERE term IN ({must}) GROUP BY doc_id, term),
idft AS (SELECT term, count(*) AS df_t FROM itf GROUP BY term),
ibm AS (SELECT t.doc_id, l.dl, t.term, {idf} * {sat} AS contrib
        FROM itf t JOIN idft f USING (term)
        JOIN idl l ON t.doc_id = l.doc_id CROSS JOIN istat s),
ibm2 AS (SELECT doc_id, dl, {score} AS score
         FROM ibm GROUP BY doc_id, dl),
ibm3 AS (SELECT doc_id, dl, score FROM ibm2
         ORDER BY score DESC, doc_id LIMIT {_BM25_TOP_K}),
ipos AS MATERIALIZED (
  SELECT doc_id, pos, toks[pos + 1] AS term FROM (
    SELECT doc_id, toks, unnest(range(len(toks))) AS pos FROM ifl) zp),
iph AS (SELECT p0.doc_id, count(*) AS n_match FROM {ph_from}
        GROUP BY p0.doc_id),
icnt AS MATERIALIZED (SELECT term, count(*) AS cnt FROM itoks
                      GROUP BY term),
iprobes AS (SELECT * FROM (VALUES {probes_vals}) v(term)),
{cms_with},
iest AS (SELECT term, min(c) AS est FROM ({est_union}) u GROUP BY term),
iblb AS MATERIALIZED (SELECT DISTINCT pos FROM ({blm_bits}) ub),
ibpr AS (SELECT p.term,
                CAST(sum(CASE WHEN b.pos IS NOT NULL THEN 1 ELSE 0 END)
                     AS BIGINT) AS hits
         FROM ({blm_probes}) p LEFT JOIN iblb b USING (pos)
         GROUP BY p.term),
hh AS MATERIALIZED (SELECT term, __xxh_u AS hu FROM ({hll_hash}) zh),
hreg AS MATERIALIZED (
  SELECT CAST(hu // {two_k} AS INT) AS bucket, max({hll_rank}) AS max_rank
  FROM hh GROUP BY 1),
hest AS (SELECT count(*) AS n_hit,
                sum(CAST(1 AS BIGINT) << ({kp1} - max_rank)) AS s_hit
         FROM hreg)
{base}
UNION ALL
SELECT 'posting' AS variant, term AS k, CAST(dfc AS BIGINT) AS cnt,
       CAST(chk AS DOUBLE) AS val
FROM iidx WHERE term IN ({terms})
UNION ALL
SELECT 'bool_search' AS variant, CAST(d.doc_id AS VARCHAR) AS k,
       CAST(d.n_chars AS BIGINT) AS cnt, CAST(NULL AS DOUBLE) AS val
FROM documents d JOIN (
  SELECT doc_id FROM ipairs WHERE term IN ({must})
  GROUP BY doc_id HAVING count(*) = {len(_SEARCH_MUST_TERMS)}) m
ON d.doc_id = m.doc_id
UNION ALL
SELECT 'bm25' AS variant, CAST(doc_id AS VARCHAR) AS k,
       CAST(dl AS BIGINT) AS cnt, score AS val FROM ibm3
UNION ALL
SELECT 'phrase' AS variant, CAST(doc_id AS VARCHAR) AS k,
       CAST(n_match AS BIGINT) AS cnt, CAST(NULL AS DOUBLE) AS val
FROM iph
UNION ALL
SELECT 'cms' AS variant, e.term AS k, CAST(e.est AS BIGINT) AS cnt,
       CAST(coalesce(t.cnt, 0) AS DOUBLE) AS val
FROM iest e LEFT JOIN icnt t USING (term)
UNION ALL
SELECT 'bloom' AS variant, term AS k, hits AS cnt,
       CAST(CASE WHEN hits = {CMS_DEPTH} THEN 1 ELSE 0 END AS DOUBLE)
         AS val
FROM ibpr
UNION ALL
SELECT 'hll_reg' AS variant, CAST(bucket AS VARCHAR) AS k,
       CAST(max_rank AS BIGINT) AS cnt, CAST(NULL AS DOUBLE) AS val
FROM hreg
UNION ALL
SELECT 'hll_est' AS variant, 'raw' AS k,
       (SELECT count(*) FROM iidx) AS cnt, {hll_raw} AS val
FROM hest h
UNION ALL
SELECT 'hll_est' AS variant, 'corrected' AS k,
       (SELECT count(*) FROM iidx) AS cnt,
       floor(({hll_corr}) * 1000) / 1000 AS val
FROM hest h
"""


_W2_RANK_SQL = (
    "SELECT event_id, row_number() OVER (PARTITION BY user_id "
    "ORDER BY ts, event_id) AS turn_rank FROM events"
)


def _w2_ordering_sft(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 stable ordering PLUS the op that ordering exists FOR at
    training time: SFT example rendering with loss-mask spans
    (operators/sft.py) over the pinned 2000-turn transcript corpus,
    normalized to (variant, k, v1, v2):

    - ``turn_rank``: the original W2 window — k = event_id,
      v1 = rank within (user, ts, id) order;
    - ``sft_text``: k = conv_id, v1 = xxhash64 of the FULL rendered
      training sequence (verbatim-text certification through the
      XXH64-in-SQL compiler), v2 = its length;
    - ``sft_span``: every loss-mask span — k = conv/idx, v1 = begin,
      v2 = end (0-based [begin, end) char offsets);
    - ``sft_stats``: k = conv_id, v1 = n_turns, v2 = n_mask_chars."""
    from ocr_auto_label_spark.datagen import transcripts_parquet
    from ocr_auto_label_spark.operators.sft import render_sft_examples

    load_views(spark, sf_dir)
    ranks = spark.sql(_W2_RANK_SQL).select(
        F.lit("turn_rank").alias("variant"),
        F.col("event_id").cast("string").alias("k"),
        F.col("turn_rank").cast("long").alias("v1"),
        F.lit(None).cast("long").alias("v2"),
    )
    from ocr_auto_label_spark.operators.util import ensure_parallelism

    # spread the single-file pinned-corpus scan (the documented
    # single-file-scan trap; no-op on multi-file production layouts)
    tr = ensure_parallelism(spark.read.parquet(transcripts_parquet(2_000)))
    sft = render_sft_examples(tr)
    text_rows = sft.select(
        F.lit("sft_text").alias("variant"),
        F.col("conv").alias("k"),
        F.xxhash64("text").alias("v1"),
        F.col("n_chars").alias("v2"),
    )
    stat_rows = sft.select(
        F.lit("sft_stats").alias("variant"),
        F.col("conv").alias("k"),
        F.col("n_turns").alias("v1"),
        F.col("n_mask_chars").alias("v2"),
    )
    span_rows = sft.select(
        "conv", F.posexplode("mask_spans").alias("idx", "s")
    ).select(
        F.lit("sft_span").alias("variant"),
        F.concat_ws("/", F.col("conv"), F.col("idx")).alias("k"),
        F.col("s.begin").alias("v1"),
        F.col("s.end").alias("v2"),
    )
    return (
        ranks.unionByName(text_rows).unionByName(stat_rows)
        .unionByName(span_rows)
    )


def _w2_ordering_sft_duck() -> str:
    from ocr_auto_label_spark.datagen import transcripts_parquet
    from ocr_auto_label_spark.functions.xxh64_sql import (
        to_signed,
        xxh64_str_staged_sql,
    )

    path = transcripts_parquet(2_000)
    src = f"read_parquet('{path}/*.parquet')"
    text_hash = xxh64_str_staged_sql("FROM stext", "text")
    return f"""
WITH srt AS MATERIALIZED (
  SELECT conv_id, turn_idx, ts,
         '<|' || role || '|>' || chr(10) || coalesce(text, '') || chr(10)
           AS rendered,
         length(role) + 5 AS hdr,
         length(coalesce(text, '')) AS txt_len,
         (role = 'assistant') AS is_mask
  FROM {src}),
sro AS MATERIALIZED (
  SELECT *, sum(length(rendered)) OVER (
              PARTITION BY conv_id ORDER BY turn_idx, ts, rendered
              ROWS UNBOUNDED PRECEDING) - length(rendered) AS off
  FROM srt),
stext AS MATERIALIZED (
  SELECT conv_id,
         string_agg(rendered, '' ORDER BY turn_idx, ts, rendered) AS text,
         count(*) AS n_turns,
         sum(length(rendered)) AS n_chars,
         coalesce(sum(CASE WHEN is_mask THEN txt_len END), 0)
           AS n_mask_chars
  FROM sro GROUP BY conv_id),
sspan AS (
  SELECT conv_id,
         row_number() OVER (PARTITION BY conv_id ORDER BY off) - 1 AS idx,
         off + hdr AS begin, off + hdr + txt_len AS "end"
  FROM sro WHERE is_mask),
shash AS (SELECT conv_id, {to_signed('__xxh_u')} AS h,
                 n_turns, n_chars, n_mask_chars
          FROM ({text_hash}) zx)
SELECT 'turn_rank' AS variant, CAST(event_id AS VARCHAR) AS k,
       CAST(turn_rank AS BIGINT) AS v1, CAST(NULL AS BIGINT) AS v2
FROM ({_W2_RANK_SQL}) zr
UNION ALL
SELECT 'sft_text', conv_id, h, CAST(n_chars AS BIGINT) FROM shash
UNION ALL
SELECT 'sft_stats', conv_id, CAST(n_turns AS BIGINT),
       CAST(n_mask_chars AS BIGINT) FROM shash
UNION ALL
SELECT 'sft_span', conv_id || '/' || CAST(idx AS VARCHAR),
       CAST(begin AS BIGINT), CAST("end" AS BIGINT) FROM sspan
"""


_ASOF_TOL_US = 3_600_000_000  # 1 hour


def _j1_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 bucketed time-range self-join PLUS the as-of join (the
    "most recent prior state" lookup the reference's latest-selection
    picks are, operators/asof.py), variant-normalized (variant, k, v1,
    v2):

    - ``range_pairs``: purchases within ±120 s per user — k = user_id,
      v1 = pair count;
    - ``asof``: every purchase's most recent PRIOR click by the same
      user — k = purchase event_id, v1 = matched click event_id,
      v2 = exact gap in µs (NULLs when the user never clicked before);
    - ``asof_tol``: same with a 1-hour tolerance (pandas
      ``merge_asof(tolerance=...)`` semantics — stale matches null out).

    The oracle is DuckDB's NATIVE ``ASOF LEFT JOIN`` — a genuinely
    independent implementation of the semantics, not a replay of ours.
    """
    from ocr_auto_label_spark.operators.asof import asof_join
    from ocr_auto_label_spark.operators.range_join import time_range_self_join

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    purch = events.filter(F.col("event_type") == "purchase")
    pairs = time_range_self_join(
        purch, key_cols=["user_id"], window_seconds=120
    )
    ranged = (
        pairs.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("pair_cnt"))
        .select(
            F.lit("range_pairs").alias("variant"),
            F.col("user_id").cast("string").alias("k"),
            F.col("pair_cnt").cast("long").alias("v1"),
            F.lit(None).cast("long").alias("v2"),
        )
    )
    clicks = events.filter(F.col("event_type") == "click")
    # ONE as-of pass; the tolerance variant is a pure post-filter on
    # the gap (exactly how the DuckDB oracle derives it from one jas
    # CTE) — running the union+window twice would double the entry's
    # shuffle work for identical output
    aj = asof_join(
        purch.select("event_id", "user_id", "ts"),
        clicks,
        on=["user_id"],
    )
    in_tol = F.col("asof_gap_us") <= F.lit(_ASOF_TOL_US)
    asof_rows = aj.select(
        F.lit("asof").alias("variant"),
        F.col("event_id").cast("string").alias("k"),
        F.col("asof_event_id").cast("long").alias("v1"),
        F.col("asof_gap_us").cast("long").alias("v2"),
    )
    tol_rows = aj.select(
        F.lit("asof_tol").alias("variant"),
        F.col("event_id").cast("string").alias("k"),
        F.when(in_tol, F.col("asof_event_id")).cast("long").alias("v1"),
        F.when(in_tol, F.col("asof_gap_us")).cast("long").alias("v2"),
    )
    return ranged.unionByName(asof_rows).unionByName(tol_rows)


def _dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked n-gram Jaccard pairs PLUS the duplicate-cluster extraction
    over them (min-label propagation with pointer jumping,
    operators/dedup.py connected_components) — pairwise evidence AND the
    keep/drop grouping a dedup pipeline actually acts on, both under the
    driver oracle (the cluster half via a DuckDB recursive CTE)."""
    from ocr_auto_label_spark.operators.dedup import (
        connected_components,
        jaccard_pairs,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = jaccard_pairs(docs, ["lang", "n_chars"], threshold=0.3)
    comp = connected_components(pairs)
    pair_rows = pairs.select(
        F.lit("pair").alias("variant"),
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        F.col("jaccard").cast("double").alias("val"),
    )
    comp_rows = comp.select(
        F.lit("component").alias("variant"),
        F.col("id").cast("long").alias("id_a"),
        F.col("component").cast("long").alias("id_b"),
        F.lit(None).cast("double").alias("val"),
    )
    return pair_rows.unionByName(comp_rows)


_SPLIT_WEIGHTS = (80, 10, 10)
_SPLIT_NAMES = ("train", "val", "test")
# mixture target: weight ∝ source ordinal + 1 (src0 → 1 … src19 → 20)
_MIX_WEIGHTS = {f"src{i}": i + 1 for i in range(20)}
_PACK_BUDGET = 1024
_PACK_SHARDS = 8
_CHUNK_BUDGET = 32
_CHUNK_OVERLAP = 8
_BPE_MERGES = 6


def _dedup_exact_and_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content-hash dedup PLUS the deterministic hash-based
    train/val/test split (operators/sampling.py) — the two corpus-curation
    assignments a training pipeline derives from the same scan, normalized
    to (variant, k, v1, v2):

    - ``exact_group``: k = md5(text), v1 = keep_id (min doc_id),
      v2 = dup_count — one hash shuffle with map-side combine;
    - ``split_assign``: k = doc_id, v1 = hash bucket (pmod(xxhash64(id),
      100)), v2 = split index — narrow projection, no shuffle;
    - ``split_summary``: k = split name, v1 = n_docs, v2 = split index;
    - ``decontam``: k = non-train doc_id, v1 = distinct 13-grams shared
      with ANY train doc (GPT-3 §C benchmark decontamination),
      v2 = the doc's distinct 13-gram count;
    - ``mixture`` / ``mixture_summary``: deterministic domain-mixture
      down-sample to weights w(src_i) = i+1 (operators/sampling.py
      mixture_sample — scarcest-group-bound integer proportions, rank by
      (xxhash64(id), id) within group): per kept doc k = doc_id,
      v1 = in-group rank, v2 = domain weight; per domain k = source,
      v1 = kept count, v2 = total count;
    - ``pack_assign`` / ``pack_offset`` / ``pack_summary``: sequence
      packing (operators/packing.py — per-shard (xxhash64, id) order,
      cumulative token count, pack = start_offset div 1024): per doc
      (shard, pack_id) and (start_offset, n_tokens); per pack the doc
      and token totals;
    - ``chunk_assign`` / ``chunk_summary``: token-window chunking
      (operators/packing.py chunk_documents — budget 32, overlap 8,
      minimal covering chunk count, pure integer boundaries; the narrow
      zero-shuffle complement of packing): per chunk (start_tok,
      n_chunk_tokens), per doc (n_chunks, n_tokens).

    The oracle replicates Spark's xxhash64(BIGINT) bit-exactly in DuckDB
    SQL (functions/xxh64_sql.xxh64_long8_stages — XXH64 of the 8-byte LE
    word, seed 42), so per-doc assignments AND per-doc mixture ranks are
    value-hash-compared; the decontamination counts are exact integers
    computed by an independent DuckDB n-gram pipeline over the same
    split."""
    from ocr_auto_label_spark.operators.sampling import (
        cross_split_contamination,
        deterministic_split,
        mixture_sample,
    )
    from ocr_auto_label_spark.operators.util import ensure_parallelism

    load_views(spark, sf_dir)
    exact = spark.sql(
        "SELECT 'exact_group' AS variant, md5(text) AS k, "
        "min(doc_id) AS v1, count(*) AS v2 FROM documents GROUP BY md5(text)"
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assigned = deterministic_split(
        docs, "doc_id", _SPLIT_WEIGHTS, _SPLIT_NAMES
    )
    idx = F.coalesce(
        *[F.when(F.col("split") == n, F.lit(i))
          for i, n in enumerate(_SPLIT_NAMES)]
    )
    assign = assigned.select(
        F.lit("split_assign").alias("variant"),
        F.col("doc_id").cast("string").alias("k"),
        F.col("bucket").cast("long").alias("v1"),
        idx.cast("long").alias("v2"),
    )
    summary = assigned.groupBy("split").agg(
        F.count(F.lit(1)).alias("n")
    ).select(
        F.lit("split_summary").alias("variant"),
        F.col("split").alias("k"),
        F.col("n").cast("long").alias("v1"),
        idx.cast("long").alias("v2"),
    )
    # 13-gram decontamination of the eval splits vs train (the gram
    # explode is interpreted higher-order work — spread the single-file
    # local scan; no-op on a multi-file production table)
    decon = cross_split_contamination(
        ensure_parallelism(assigned), "doc_id", "text", "split"
    ).select(
        F.lit("decontam").alias("variant"),
        F.col("id").cast("string").alias("k"),
        F.col("n_contam").alias("v1"),
        F.col("n_grams").alias("v2"),
    )
    # domain-mixture down-sample: weight ∝ source ordinal + 1 (a
    # deliberately non-uniform target so the integer proportions bind)
    wgt = (F.substring("source", 4, 10).cast("long") + 1)
    mixed = mixture_sample(docs, "source", _MIX_WEIGHTS)
    mix = mixed.select(
        F.lit("mixture").alias("variant"),
        F.col("doc_id").cast("string").alias("k"),
        F.col("mix_rank").cast("long").alias("v1"),
        wgt.alias("v2"),
    )
    mix_summary = mixed.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept")
    ).join(
        docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_all")), "source"
    ).select(
        F.lit("mixture_summary").alias("variant"),
        F.col("source").alias("k"),
        F.col("n_kept").cast("long").alias("v1"),
        F.col("n_all").cast("long").alias("v2"),
    )
    # sequence packing: per-shard deterministic order + token-budget cuts
    from ocr_auto_label_spark.operators.packing import pack_sequences

    packed = pack_sequences(
        docs, _PACK_BUDGET, "doc_id", "text", n_shards=_PACK_SHARDS
    )
    pack_assign = packed.select(
        F.lit("pack_assign").alias("variant"),
        F.col("doc_id").cast("string").alias("k"),
        F.col("shard").alias("v1"),
        F.col("pack_id").alias("v2"),
    )
    pack_offset = packed.select(
        F.lit("pack_offset").alias("variant"),
        F.col("doc_id").cast("string").alias("k"),
        F.col("start_offset").alias("v1"),
        F.col("n_tokens").alias("v2"),
    )
    pack_summary = packed.groupBy("shard", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("n_tok"),
    ).select(
        F.lit("pack_summary").alias("variant"),
        F.concat_ws("/", F.col("shard"), F.col("pack_id")).alias("k"),
        F.col("n_docs").cast("long").alias("v1"),
        F.col("n_tok").cast("long").alias("v2"),
    )
    # token-window chunking (the narrow complement of packing); zero
    # shuffles, so parallelism is the scan's — spread the single-file
    # local table (no-op on a multi-file production layout)
    from ocr_auto_label_spark.operators.packing import chunk_documents

    chunks = chunk_documents(
        ensure_parallelism(docs), _CHUNK_BUDGET, _CHUNK_OVERLAP
    )
    chunk_assign = chunks.select(
        F.lit("chunk_assign").alias("variant"),
        F.concat_ws("/", F.col("doc_id"), F.col("chunk_idx")).alias("k"),
        F.col("start_tok").alias("v1"),
        F.col("n_chunk_tokens").alias("v2"),
    )
    chunk_summary = chunks.filter(F.col("chunk_idx") == 0).select(
        F.lit("chunk_summary").alias("variant"),
        F.col("doc_id").cast("string").alias("k"),
        F.col("n_chunks").alias("v1"),
        F.col("n_tokens").alias("v2"),
    )
    # BPE tokenizer training (Sennrich et al. 2016) on the same corpus:
    # the ordered merge table (one bounded driver row per step), the
    # final symbol inventory, and the per-doc token counts after merges
    # — the DuckDB oracle replays the full training loop as a static
    # chained-CTE program (argmax pair per step, then the same
    # boundary-safe replace() rewrite)
    from ocr_auto_label_spark.operators.bpe import (
        bpe_segment_counts,
        bpe_train,
        bpe_vocab,
    )

    # the per-merge-job loop, deliberately: this entry's oracle replays
    # THAT algorithm CTE-for-CTE, and its localCheckpoint'd vocabulary
    # frame re-reads faster in the three bpe union legs than the fast
    # trainer's driver-local relation (measured: encode leg 0.3 → 0.97 s
    # with the swap).  The incremental trainer is exercised by the
    # curation job, the bench bpe block, and the pytest identity.
    bmerges, bwords = bpe_train(docs, _BPE_MERGES)
    bpe_merge = spark.createDataFrame(
        [
            (f"{m['step']}/{m['a']}+{m['b']}", m["total"], m["step"])
            for m in bmerges
        ],
        "k string, v1 long, v2 long",
    ).select(F.lit("bpe_merge").alias("variant"), "k", "v1", "v2")
    bpe_voc = bpe_vocab(bwords).select(
        F.lit("bpe_vocab").alias("variant"),
        F.col("symbol").alias("k"),
        F.col("total").cast("long").alias("v1"),
        F.length("symbol").cast("long").alias("v2"),
    )
    bpe_enc = bpe_segment_counts(docs, bwords).select(
        F.lit("bpe_encode").alias("variant"),
        F.col("id").cast("string").alias("k"),
        F.col("n_symbols").alias("v1"),
        F.col("n_words").cast("long").alias("v2"),
    )
    return (
        exact.unionByName(assign).unionByName(summary)
        .unionByName(decon).unionByName(mix).unionByName(mix_summary)
        .unionByName(pack_assign).unionByName(pack_offset)
        .unionByName(pack_summary).unionByName(chunk_assign)
        .unionByName(chunk_summary).unionByName(bpe_merge)
        .unionByName(bpe_voc).unionByName(bpe_enc)
    )


def _dedup_exact_and_split_duck() -> str:
    from ocr_auto_label_spark.functions.xxh64_sql import (
        apply_stages,
        to_signed,
        xxh64_long8_stages,
    )

    hashed = apply_stages(
        "SELECT doc_id FROM documents", xxh64_long8_stages("doc_id", "42")
    )
    lo, hi = _SPLIT_WEIGHTS[0], _SPLIT_WEIGHTS[0] + _SPLIT_WEIGHTS[1]
    name_case = (
        f"CASE idx WHEN 0 THEN '{_SPLIT_NAMES[0]}' "
        f"WHEN 1 THEN '{_SPLIT_NAMES[1]}' ELSE '{_SPLIT_NAMES[2]}' END"
    )
    # BPE training replayed as a static chained-CTE program: per step,
    # pair counts over the current vocab → deterministic argmax (count
    # DESC, a, b LIMIT 1) → boundary-safe replace() rewrite.  Every bw/bt
    # is MATERIALIZED — each is referenced twice, and DuckDB re-executes
    # inlined single-reference CTEs, which would make the chain
    # exponential (the E1-oracle lesson).
    bpe_ctes = [
        "bwv AS MATERIALIZED (SELECT word, count(*) AS cnt FROM ("
        f"SELECT unnest(list_filter({_duck_tokens('text')}, w -> w <> ''))"
        " AS word FROM documents) zt GROUP BY word)",
        "bw0 AS MATERIALIZED (SELECT word, cnt, ' ' || array_to_string("
        "list_transform(range(1, length(word) + 1), i -> word[i]), '  ')"
        " || ' ' AS seq FROM bwv)",
    ]
    bpe_merge_legs = []
    for m in range(_BPE_MERGES):
        bpe_ctes.append(
            f"bp{m} AS (SELECT syms[i] AS a, syms[i + 1] AS b, "
            f"sum(cnt) AS total FROM (SELECT cnt, syms, "
            f"unnest(range(1, len(syms))) AS i FROM (SELECT cnt, "
            f"string_split(trim(seq), '  ') AS syms FROM bw{m}) zs{m}) "
            f"zp{m} GROUP BY 1, 2)"
        )
        bpe_ctes.append(
            f"bt{m} AS MATERIALIZED (SELECT a, b, total FROM bp{m} "
            "ORDER BY total DESC, a, b LIMIT 1)"
        )
        bpe_ctes.append(
            f"bw{m + 1} AS MATERIALIZED (SELECT word, cnt, "
            "replace(seq, ' ' || t.a || '  ' || t.b || ' ', "
            f"' ' || t.a || t.b || ' ') AS seq FROM bw{m} "
            f"CROSS JOIN bt{m} t)"
        )
        bpe_merge_legs.append(
            f"SELECT 'bpe_merge' AS variant, CAST({m} AS VARCHAR) || '/' "
            "|| a || '+' || b AS k, CAST(total AS BIGINT) AS v1, "
            f"CAST({m} AS BIGINT) AS v2 FROM bt{m}"
        )
    bfin = f"bw{_BPE_MERGES}"
    bpe_ctes.append(
        "bvoc AS (SELECT sym AS symbol, sum(cnt) AS total FROM ("
        "SELECT cnt, unnest(string_split(trim(seq), '  ')) AS sym "
        f"FROM {bfin}) zv GROUP BY 1)"
    )
    bpe_ctes.append(
        "benc AS (SELECT t.doc_id, "
        "sum(len(string_split(trim(w.seq), '  '))) AS n_sym, "
        "count(*) AS n_words FROM (SELECT doc_id, "
        f"unnest(list_filter({_duck_tokens('text')}, w -> w <> '')) "
        f"AS word FROM documents) t JOIN {bfin} w USING (word) "
        "GROUP BY 1)"
    )
    bpe_with = ",\n".join(bpe_ctes)
    bpe_union = " UNION ALL ".join(bpe_merge_legs)
    return f"""
WITH hashed AS MATERIALIZED ({hashed}),
b AS (SELECT doc_id,
             CAST((({to_signed('__l8_u')} % 100) + 100) % 100 AS BIGINT) AS bucket
      FROM hashed),
hsig AS (SELECT doc_id, {to_signed('__l8_u')} AS h FROM hashed),
mw AS (SELECT source, CAST(substr(source, 4) AS BIGINT) + 1 AS w
       FROM (SELECT DISTINCT source FROM documents)),
mxc AS (SELECT d.source, count(*) AS n, any_value(mw.w) AS w
        FROM documents d JOIN mw ON d.source = mw.source GROUP BY d.source),
mstar AS (SELECT g.n AS n_star, g.w AS w_star FROM mxc g
          WHERE NOT EXISTS (
            SELECT 1 FROM mxc h
            WHERE CAST(h.n AS HUGEINT) * g.w < CAST(g.n AS HUGEINT) * h.w
               OR (CAST(h.n AS HUGEINT) * g.w = CAST(g.n AS HUGEINT) * h.w
                   AND h.source < g.source))),
mkeep AS (SELECT mxc.source, mxc.n, mxc.w,
                 (mstar.n_star * mxc.w) // mstar.w_star AS keep
          FROM mxc CROSS JOIN mstar),
mrank AS MATERIALIZED (
  SELECT d.doc_id, d.source,
         row_number() OVER (PARTITION BY d.source ORDER BY hsig.h, d.doc_id) AS rk
  FROM documents d JOIN hsig ON d.doc_id = hsig.doc_id),
ptok AS (SELECT d.doc_id, hsig.h,
                ((hsig.h % {_PACK_SHARDS}) + {_PACK_SHARDS}) % {_PACK_SHARDS} AS shard,
                CAST(len(regexp_split_to_array(trim(d.text), '\\s+')) AS BIGINT) AS tc
         FROM documents d JOIN hsig ON d.doc_id = hsig.doc_id),
pcum AS MATERIALIZED (
  -- CAST: DuckDB's windowed sum(BIGINT) returns HUGEINT; without the cast
  -- every leg of the UNION widens to HUGEINT and the driver value-hash
  -- diverges from Spark's BIGINT rendering (r4's one red row).
  SELECT doc_id, shard, tc,
         CAST(sum(tc) OVER (PARTITION BY shard ORDER BY h, doc_id
                            ROWS UNBOUNDED PRECEDING) - tc AS BIGINT) AS off
  FROM ptok),
s AS MATERIALIZED (SELECT doc_id, bucket,
             CASE WHEN bucket < {lo} THEN 0 WHEN bucket < {hi} THEN 1 ELSE 2 END AS idx
      FROM b),
tok AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS t
        FROM documents),
gr AS MATERIALIZED (
  SELECT doc_id, unnest(list_distinct(
           list_transform(range(1, len(t) - 13 + 2),
                          i -> array_to_string(list_slice(t, i, i + 12), ' ')))) AS gram
  FROM tok),
tr AS (SELECT DISTINCT gram FROM gr JOIN s USING (doc_id) WHERE s.idx = 0),
ev AS MATERIALIZED (
  SELECT gr.doc_id, gram FROM gr JOIN s USING (doc_id) WHERE s.idx > 0),
tot AS (SELECT doc_id, count(*) AS n_grams FROM ev GROUP BY 1),
hit AS (SELECT ev.doc_id, count(*) AS n_contam
        FROM ev JOIN tr USING (gram) GROUP BY 1),
chn AS MATERIALIZED (
  SELECT doc_id, n,
         CASE WHEN n > {_CHUNK_BUDGET}
              THEN 1 + ((n - {_CHUNK_BUDGET} + {_CHUNK_BUDGET - _CHUNK_OVERLAP} - 1)
                        // {_CHUNK_BUDGET - _CHUNK_OVERLAP})
              ELSE 1 END AS n_chunks
  FROM (SELECT doc_id,
               CASE WHEN text IS NULL OR regexp_replace(text, '^\\s+|\\s+$', '', 'g') = ''
                    THEN 0
                    ELSE len(regexp_split_to_array(
                           regexp_replace(text, '^\\s+|\\s+$', '', 'g'), '\\s+'))
               END AS n
        FROM documents) z),
chx AS (SELECT doc_id, n, n_chunks, unnest(range(0, n_chunks)) AS i FROM chn),
{bpe_with}
SELECT 'exact_group' AS variant, md5(text) AS k,
       min(doc_id) AS v1, count(*) AS v2
FROM documents GROUP BY md5(text)
UNION ALL
SELECT 'split_assign', CAST(doc_id AS VARCHAR),
       bucket, CAST(idx AS BIGINT) FROM s
UNION ALL
SELECT 'split_summary', {name_case},
       count(*), CAST(idx AS BIGINT) FROM s GROUP BY idx
UNION ALL
SELECT 'decontam', CAST(s.doc_id AS VARCHAR),
       coalesce(hit.n_contam, 0), coalesce(tot.n_grams, 0)
FROM s LEFT JOIN tot ON s.doc_id = tot.doc_id
       LEFT JOIN hit ON s.doc_id = hit.doc_id
WHERE s.idx > 0
UNION ALL
SELECT 'mixture', CAST(mrank.doc_id AS VARCHAR), mrank.rk, mkeep.w
FROM mrank JOIN mkeep ON mrank.source = mkeep.source
WHERE mrank.rk <= mkeep.keep
UNION ALL
SELECT 'mixture_summary', source, keep, n FROM mkeep
UNION ALL
SELECT 'pack_assign', CAST(doc_id AS VARCHAR), shard, off // {_PACK_BUDGET}
FROM pcum
UNION ALL
SELECT 'pack_offset', CAST(doc_id AS VARCHAR), off, tc FROM pcum
UNION ALL
SELECT 'pack_summary',
       CAST(shard AS VARCHAR) || '/' || CAST(off // {_PACK_BUDGET} AS VARCHAR),
       count(*), CAST(sum(tc) AS BIGINT)
FROM pcum GROUP BY shard, off // {_PACK_BUDGET}
UNION ALL
SELECT 'chunk_assign',
       CAST(doc_id AS VARCHAR) || '/' || CAST(i AS VARCHAR),
       CAST(i * {_CHUNK_BUDGET - _CHUNK_OVERLAP} AS BIGINT),
       CAST(least({_CHUNK_BUDGET}, n - i * {_CHUNK_BUDGET - _CHUNK_OVERLAP}) AS BIGINT)
FROM chx
UNION ALL
SELECT 'chunk_summary', CAST(doc_id AS VARCHAR),
       CAST(n_chunks AS BIGINT), CAST(n AS BIGINT)
FROM chn
UNION ALL
{bpe_union}
UNION ALL
SELECT 'bpe_vocab', symbol, CAST(total AS BIGINT),
       CAST(length(symbol) AS BIGINT)
FROM bvoc
UNION ALL
SELECT 'bpe_encode', CAST(doc_id AS VARCHAR),
       CAST(n_sym AS BIGINT), CAST(n_words AS BIGINT)
FROM benc
"""


def _dedup_minhash_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The xxhash64 sketch family in one entry (no DuckDB analog →
    rows-only): MinHash+LSH dedup with char-5-shingle AND word-3-shingle
    variants, plus the per-doc SimHash and rolling-hash fingerprint
    signatures (merged from r2's text_hash_signatures to free a window
    slot).  Normalized to (variant, id_a, id_b, val); signature rows
    carry id_b = NULL and the 64-bit signature as a string in val.

    0.7 threshold: the synthetic corpus shares one small vocabulary, so
    baseline pairwise Jaccard sits ≈0.35 — a lower threshold would make
    *every* pair a near-dup and the query degenerate to O(n²) exact
    verification.  Word 3-shingles are the document-scale variant
    (~6× fewer shingles per doc)."""
    from ocr_auto_label_spark.operators.dedup import (
        minhash_lsh_dedup,
        simhash64,
        word_shingles,
    )
    from ocr_auto_label_spark.operators.textstats import doc_fingerprint

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def norm_pairs(df: DataFrame, variant: str) -> DataFrame:
        return df.select(
            F.lit(variant).alias("variant"),
            F.col("id_a").cast("long").alias("id_a"),
            F.col("id_b").cast("long").alias("id_b"),
            F.col("jaccard").cast("string").alias("val"),
        )

    char = norm_pairs(minhash_lsh_dedup(docs, threshold=0.7), "char5")
    word = norm_pairs(
        minhash_lsh_dedup(docs, threshold=0.7, shingle_width=3, shingle_fn=word_shingles),
        "word3",
    )
    # spread the signature scan: sf0.1 documents is a single parquet file
    # (1 scan task) and simhash/fingerprint are interpreted O(64·tokens)
    # higher-order expressions — unparallelized they dominate the entry
    from ocr_auto_label_spark.operators.util import ensure_parallelism

    sigs = ensure_parallelism(docs).select(
        F.col("doc_id").alias("id_a"),
        simhash64("text").alias("simhash"),
        doc_fingerprint("text").alias("fingerprint"),
    )
    sim = sigs.select(
        F.lit("simhash").alias("variant"), F.col("id_a").cast("long").alias("id_a"),
        F.lit(None).cast("long").alias("id_b"), F.col("simhash").cast("string").alias("val"),
    )
    fp = sigs.select(
        F.lit("fingerprint").alias("variant"), F.col("id_a").cast("long").alias("id_a"),
        F.lit(None).cast("long").alias("id_b"), F.col("fingerprint").cast("string").alias("val"),
    )
    return char.unionByName(word).unionByName(sim).unionByName(fp)


def _dedup_minhash_duck() -> str:
    from ocr_auto_label_spark.functions.minhash_sql import (
        dedup_minhash_variants_duck_sql,
    )

    return dedup_minhash_variants_duck_sql()


def _query_vec(spark: SparkSession, sf_dir: str) -> list[float]:
    row = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter(F.col("vec_id") == 0).select("embedding").collect()
    )
    return [float(v) for v in row[0].embedding]


def _embed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ocr_auto_label_spark.operators.similarity import brute_force_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return brute_force_topk(emb, _query_vec(spark, sf_dir), k=10, round_digits=4)


def _embed_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup suite, variant-normalized (variant, id_a, id_b,
    cosine):

    - ``label_blocked``: the given-blocking-key baseline (pairs ≥ 0.3
      within a label block).
    - ``semdedup_assign`` / ``semdedup_pair`` / ``semdedup_evict``: the
      SemDeDup pipeline (Abbas et al. 2023) — deterministic-centroid
      cluster assignment (id_a=vec_id, id_b=cluster, cosine=similarity to
      the winning centroid), within-cluster pairs ≥ 0.3, and the
      keep-lowest-id eviction set (id_a=cluster, id_b=evicted id).  The
      DuckDB oracle recomputes the ENTIRE pipeline independently — the
      centroid rule via the XXH64-in-SQL compiler, the argmax via a
      ranking window, the pairs via ``list_cosine_similarity``.
    - ``lsh_signature``: every vector's derived-hyperplane LSH bucket
      (id_a=vec_id, id_b=signature) — certifies the ANN blocking key
      driver-side: the oracle regenerates the ±1 plane weights from the
      XXH64 spec in Python (``xxh64_int4_py``, the Spark IntegerType
      chain) and replays the exact left-to-right sign fold in SQL, so
      the hash family behind ``lsh_topk``/``lsh_blocked_neardup`` is
      value-checked even though top-k recall keeps those rows-only."""
    from ocr_auto_label_spark.operators.similarity import (
        cosine_neardup_pairs,
        hyperplane_signature,
        semdedup,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    lbl = cosine_neardup_pairs(emb, block_cols=["label"], threshold=0.3).select(
        F.lit("label_blocked").alias("variant"),
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        "cosine",
    )
    a, p, e = semdedup(emb, n_centroids=16, threshold=0.3)
    # the assignment subtree feeds three union legs (assign/pair/evict) —
    # checkpoint the two small outputs so it runs once per build, and
    # derive the evict leg from the CHECKPOINTED pairs (same definition
    # as semdedup's own; the ANN-entry precedent)
    a = a.localCheckpoint(eager=True)
    p = p.localCheckpoint(eager=True)
    e = p.select("sd_cluster", F.col("id_b").alias("id")).distinct()
    asg = a.select(
        F.lit("semdedup_assign").alias("variant"),
        F.col("vec_id").cast("long").alias("id_a"),
        F.col("sd_cluster").cast("long").alias("id_b"),
        F.col("sd_cos").alias("cosine"),
    )
    pr = p.select(
        F.lit("semdedup_pair").alias("variant"),
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        "cosine",
    )
    ev = e.select(
        F.lit("semdedup_evict").alias("variant"),
        F.col("sd_cluster").cast("long").alias("id_a"),
        F.col("id").cast("long").alias("id_b"),
        F.lit(None).cast("double").alias("cosine"),
    )
    sig = emb.select(
        F.lit("lsh_signature").alias("variant"),
        F.col("vec_id").cast("long").alias("id_a"),
        hyperplane_signature("embedding", bits=6).cast("long").alias("id_b"),
        F.lit(None).cast("double").alias("cosine"),
    )
    return (
        lbl.unionByName(asg).unionByName(pr).unionByName(ev)
        .unionByName(sig)
    )


def _embed_ivf_index_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The materialized-index ANN path: write the IVF index partitioned by
    cluster, probe nprobe cells via partition-pruned scans (the layout
    that makes IVF sub-linear at 10^9 vectors — PartitionFilters asserted
    in tests/test_physical_plans.py).  Rows-only: recall < 1 by design."""
    import os
    import tempfile

    from ocr_auto_label_spark.operators.similarity import (
        ivf_probe_index,
        ivf_write_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # per-process fixed path + overwrite mode — rebuilt per entry build,
    # never accumulating tempdirs across runs (review r5)
    path = os.path.join(
        tempfile.gettempdir(), f"spark_graft_ivf_idx_{os.getpid()}", "index"
    )
    centroids = ivf_write_index(emb, path, n_centroids=16)
    return ivf_probe_index(
        spark, path, centroids, _query_vec(spark, sf_dir), k=10, nprobe=4
    )


def _embed_ann_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All five approximate paths in one entry — ORACLE-BACKED since r5
    (VERDICT r4 #5 and beyond): hyperplane-LSH single-probe top-k, IVF
    nprobe top-k, the MATERIALIZED-index probe (write partitioned by
    cluster, probe via partition-pruned scans), product-quantization ADC
    top-k (vectors compressed to m uint8 codes; search never touches raw
    vectors), near-dup pairs blocked by the computed LSH signature, plus
    the recall@10 evidence rows: for each probe family, one row counting
    hits against the exact brute-force top-10 (id_a = k, id_b = hits,
    cosine = recall).

    "Recall < 1 by design" blocked a brute-force oracle, never an oracle
    per se: the DuckDB side now replays each ANN index itself —
    bit-exact fold replays for every cosine/assignment score, the
    hyperplane signatures from the XXH64 spec, and the driver-side numpy
    artifacts (IVF probe cells, PQ codebooks + the query LUT) recomputed
    by the ORACLE GENERATOR with the identical numpy/python code and
    folded in as literals (the same device as Spark's own plan, which
    also embeds them as literals).  Normalized to (variant, id_a, id_b,
    cosine); for the top-k variants id_a is the query's id (0)."""
    from ocr_auto_label_spark.operators.similarity import (
        brute_force_topk,
        cosine_neardup_pairs,
        hyperplane_signature,
        ivf_topk,
        lsh_bucketed_topk,
        pq_topk,
        pq_train,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = _query_vec(spark, sf_dir)

    def norm_topk(df: DataFrame, variant: str) -> DataFrame:
        return df.select(
            F.lit(variant).alias("variant"),
            F.lit(0).cast("long").alias("id_a"),
            F.col("vec_id").cast("long").alias("id_b"),
            "cosine",
        )

    # each top-k frame is <= 10 rows but feeds TWO union legs (its own
    # variant + the recall semi-join), and brute feeds three — checkpoint
    # the tiny results so every ANN plan executes exactly once per build
    brute = brute_force_topk(emb, q, k=10).localCheckpoint(eager=True)
    lsh10 = lsh_bucketed_topk(emb, q, k=10, bits=4).localCheckpoint(eager=True)
    ivf10 = ivf_topk(
        emb, q, k=10, n_centroids=16, nprobe=4
    ).localCheckpoint(eager=True)
    pq10 = pq_topk(
        emb, pq_train(emb, m=8, k=16), q, k=10
    ).localCheckpoint(eager=True)
    lsh = norm_topk(lsh10, "lsh_topk")
    ivf = norm_topk(ivf10, "ivf_topk")
    idx = norm_topk(_embed_ivf_index_probe(spark, sf_dir), "ivf_index_probe")
    # product quantization — cosine reported via cos = 1 - d²/2 on the
    # unit sphere (UNROUNDED: approx_d2 is already 6-dp and a second
    # HALF_UP round would land exactly on a decimal half whenever d2's
    # last digit is odd — the one case where cross-engine rounding
    # genuinely diverges; the raw double is bit-equal instead)
    pq = norm_topk(
        pq10.select(
            "vec_id", (F.lit(1.0) - F.col("approx_d2") / 2).alias("cosine")
        ),
        "pq_topk",
    )
    blocked = cosine_neardup_pairs(
        emb.withColumn("lsh_sig", hyperplane_signature("embedding", bits=6)),
        block_cols=["lsh_sig"],
        threshold=0.9,
    ).select(
        F.lit("lsh_blocked_neardup").alias("variant"),
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        "cosine",
    )

    def recall(ann: DataFrame, variant: str) -> DataFrame:
        # deterministic integer hit count vs the exact top-10 (both sides
        # order by rounded cosine with id tie-break — a total order)
        return (
            ann.select("vec_id")
            .join(brute.select("vec_id"), "vec_id", "left_semi")
            .agg(F.count(F.lit(1)).alias("h"))
            .select(
                F.lit(variant).alias("variant"),
                F.lit(10).cast("long").alias("id_a"),
                F.col("h").cast("long").alias("id_b"),
                (F.col("h") / F.lit(10.0)).alias("cosine"),
            )
        )

    return (
        lsh.unionByName(ivf).unionByName(idx).unionByName(pq)
        .unionByName(blocked)
        .unionByName(recall(lsh10, "recall_lsh"))
        .unionByName(recall(ivf10, "recall_ivf"))
        .unionByName(recall(pq10, "recall_pq"))
    )


# ---- the ANN oracle generator: replays every index in DuckDB ----------

_ANN_DIM = 64
_ANN_NCENT = 16
_ANN_NPROBE = 4
_ANN_PQ_M = 8
_ANN_PQ_K = 16
_ANN_K = 10


def _ann_dbl(x: float) -> str:
    return f"CAST({float(x)!r} AS DOUBLE)"


def _ann_round6(x: str) -> str:
    """EXACT replication of Spark ``F.round(x, 6)`` (HALF_UP over
    ``BigDecimal.valueOf`` = Double.toString's shortest round-trip
    decimal): DuckDB's VARCHAR cast is also shortest-repr, and parsing
    it into a wide DECIMAL is exact, so decimal HALF_UP at scale 6
    reproduces Spark bit-for-bit — unlike DuckDB's native
    ``round(double, 6)``, which misrounds ~1.3% of nearest-to-half
    doubles (probed: 199/15003; this device 0/15003 incl. constructed
    adversaries and sub-1e-6 magnitudes — scale 25 holds any shortest
    repr of the values in range exactly)."""
    return (
        f"CAST(round(CAST(CAST({x} AS VARCHAR) AS DECIMAL(38,25)), 6) "
        "AS DOUBLE)"
    )


def _ann_fold_sum(items_sql: str) -> str:
    """Ordered left fold — replays Spark ``aggregate(…, 0D, (s,v)->s+v)``."""
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), {items_sql}), "
        "(a, b) -> a + b)"
    )


def _ann_lsh_sig_sql(bits: int, vec_col: str) -> str:
    """Hyperplane-LSH signature replay over a DOUBLE[] column: the ±1
    plane weights come from the XXH64 spec in Python (the Spark
    IntegerType chain — seed 42, child hash as next seed), the sign fold
    replays the left-to-right double accumulation exactly."""
    from ocr_auto_label_spark.functions.xxh64_sql import xxh64_int4_py

    terms = []
    for p in range(bits):
        w = [
            "1.0" if (xxh64_int4_py(p, xxh64_int4_py(i, 42)) >> 1) & 1 else "-1.0"
            for i in range(_ANN_DIM)
        ]
        prods = (
            f"list_transform(range(1, {_ANN_DIM + 1}), "
            f"j -> {vec_col}[j] * ([{', '.join(w)}])[j])"
        )
        terms.append(
            f"(CASE WHEN {_ann_fold_sum(prods)} > 0 THEN {1 << p} ELSE 0 END)"
        )
    return " + ".join(terms)


def _embed_ann_variants_duck() -> str:
    """Full DuckDB replay of the ANN suite.  The generator (not the SQL)
    recomputes the three driver-side artifacts with the very code the
    Spark operators use — centroid picks via the XXH64-in-SQL compiler,
    IVF probe cells via the same numpy argsort, PQ codebooks/LUT via the
    same python/numpy float ops — and folds them into the query as
    literals, exactly as Spark's own plan embeds them.  Everything else
    is a bit-exact fold replay, so the top-k sets, cosines, AND the
    recall hit counts are value-hash-comparable.  Reads the embeddings
    parquet at ENTRY_TEST_SF_DIR (default: the driver's sf0.01), the
    extract_flagship precedent."""
    import math
    import os

    import duckdb
    import numpy as np

    from ocr_auto_label_spark.functions.xxh64_sql import (
        apply_stages,
        to_signed,
        xxh64_long8_stages,
    )

    sf_dir = os.environ.get("ENTRY_TEST_SF_DIR", "/root/testdata/sf0.01")
    path = f"{sf_dir}/embeddings.parquet"
    con = duckdb.connect()
    hashed = apply_stages(
        f"SELECT vec_id FROM read_parquet('{path}')",
        xxh64_long8_stages("vec_id", "42"),
    )
    cent_rows = con.execute(
        f"""
        WITH hv AS (SELECT vec_id, {to_signed('__l8_u')} AS h FROM ({hashed}))
        SELECT e.vec_id, e.embedding FROM hv
        JOIN read_parquet('{path}') e USING (vec_id)
        ORDER BY hv.h, hv.vec_id LIMIT {_ANN_NCENT}"""
    ).fetchall()
    centroids = [(i, [float(x) for x in v]) for i, (_, v) in enumerate(cent_rows)]
    q = [
        float(x)
        for x in con.execute(
            f"SELECT embedding FROM read_parquet('{path}') WHERE vec_id = 0"
        ).fetchone()[0]
    ]
    con.close()

    # IVF probe cells — the same numpy ivf_topk runs driver-side
    qa = np.asarray(q)
    cmat = np.asarray([v for _, v in centroids])
    sims = (cmat @ qa) / (
        np.linalg.norm(cmat, axis=1) * np.linalg.norm(qa) + 1e-12
    )
    probes = [centroids[i][0] for i in np.argsort(-sims)[:_ANN_NPROBE]]

    # PQ codebooks + query LUT — the same python/numpy as pq_train/pq_topk
    sub = _ANN_DIM // _ANN_PQ_M
    vecs = []
    for _, v in centroids[:_ANN_PQ_K]:
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        vecs.append([x / n for x in v])
    codebooks = [
        [v[s * sub:(s + 1) * sub] for v in vecs] for s in range(_ANN_PQ_M)
    ]
    qn = qa / (np.linalg.norm(qa) + 1e-300)
    lut: list[float] = []
    for s, book in enumerate(codebooks):
        qs = qn[s * sub:(s + 1) * sub]
        for cent in book:
            lut.append(float(np.sum((qs - np.asarray(cent)) ** 2)))
    lut_lit = "[" + ", ".join(_ann_dbl(x) for x in lut) + "]"

    q_arr = "[" + ", ".join(_ann_dbl(x) for x in q) + "]"
    dot_q = _ann_fold_sum(
        f"list_transform(range(1, {_ANN_DIM + 1}), j -> v[j] * ({q_arr})[j])"
    )
    qnorm = f"sqrt({_ann_fold_sum(f'list_transform({q_arr}, x -> x * x)')})"
    cos_q = _ann_round6(f"{dot_q} / (vn * {qnorm})")
    sq_norm = _ann_fold_sum(
        f"list_transform(range(1, {_ANN_DIM + 1}), "
        "j -> CAST(embedding AS DOUBLE[])[j] * CAST(embedding AS DOUBLE[])[j])"
    )

    cent_vals = ", ".join(
        "({i}, [{vals}], {n})".format(
            i=i,
            vals=", ".join(_ann_dbl(x) for x in v),
            n=_ann_dbl(math.sqrt(sum(x * x for x in v))),
        )
        for i, v in centroids
    )
    dot_c = _ann_fold_sum(
        f"list_transform(range(1, {_ANN_DIM + 1}), j -> e.v[j] * c.cv[j])"
    )

    d_cols = []
    for s in range(_ANN_PQ_M):
        cents = ", ".join(
            "[" + ", ".join(_ann_dbl(x) for x in cvec) + "]"
            for cvec in codebooks[s]
        )
        subvec = f"list_transform(range(1, {sub + 1}), j -> nv[{s * sub} + j])"
        dist_fold = _ann_fold_sum(
            f"list_transform(range(1, {sub + 1}), "
            f"j -> (({subvec})[j] - c[j]) * (({subvec})[j] - c[j]))"
        )
        d_cols.append(f"list_transform([{cents}], c -> {dist_fold}) AS d{s}")
    code_cols = ", ".join(
        f"CAST(list_position(d{s}, list_aggregate(d{s}, 'min')) - 1 AS INT)"
        f" AS c{s}"
        for s in range(_ANN_PQ_M)
    )
    adc = "CAST(0.0 AS DOUBLE)" + "".join(
        f" + ({lut_lit})[{s} * {_ANN_PQ_K} + c{s} + 1]"
        for s in range(_ANN_PQ_M)
    )

    probes_in = ", ".join(str(p) for p in probes)
    sig4 = _ann_lsh_sig_sql(4, "v")
    sig6 = _ann_lsh_sig_sql(6, "v")
    pair_dot = _ann_fold_sum(
        f"list_transform(range(1, {_ANN_DIM + 1}), j -> a.v[j] * b.v[j])"
    )
    K = _ANN_K

    return f"""
WITH e AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, sqrt({sq_norm}) AS vn
  FROM embeddings),
sc AS MATERIALIZED (SELECT vec_id, {cos_q} AS cos FROM e),
bt AS MATERIALIZED (SELECT vec_id, cos FROM sc ORDER BY cos DESC, vec_id LIMIT {K}),
sg AS MATERIALIZED (SELECT vec_id, {sig4} AS sig4, {sig6} AS sig6 FROM e),
lt AS MATERIALIZED (
  SELECT sc.vec_id, sc.cos FROM sc JOIN sg USING (vec_id)
  WHERE sg.sig4 = (SELECT sig4 FROM sg WHERE vec_id = 0)
  ORDER BY sc.cos DESC, sc.vec_id LIMIT {K}),
cent(c_id, cv, cn) AS (SELECT * FROM (VALUES {cent_vals})),
asg AS MATERIALIZED (
  SELECT vec_id, c_id FROM (
    SELECT e.vec_id, c.c_id,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY
             {dot_c} / (e.vn * c.cn + 1e-300) DESC, c.c_id) AS rn
    FROM e CROSS JOIN cent c) z WHERE rn = 1),
it AS MATERIALIZED (
  SELECT sc.vec_id, sc.cos FROM sc JOIN asg USING (vec_id)
  WHERE asg.c_id IN ({probes_in})
  ORDER BY sc.cos DESC, sc.vec_id LIMIT {K}),
pqv AS MATERIALIZED (
  SELECT vec_id, list_transform(range(1, {_ANN_DIM + 1}),
                                j -> v[j] / (vn + 1e-300)) AS nv
  FROM e),
pqd AS MATERIALIZED (SELECT vec_id, {', '.join(d_cols)} FROM pqv),
pqc AS MATERIALIZED (SELECT vec_id, {code_cols} FROM pqd),
pt AS MATERIALIZED (
  SELECT vec_id, {_ann_round6(adc)} AS approx_d2 FROM pqc
  ORDER BY approx_d2 ASC, vec_id LIMIT {K}),
blk AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         {_ann_round6(f'{pair_dot} / (a.vn * b.vn)')} AS cosine
  FROM (SELECT e.*, sg.sig6 FROM e JOIN sg USING (vec_id)) a
  JOIN (SELECT e.*, sg.sig6 FROM e JOIN sg USING (vec_id)) b
    ON a.sig6 = b.sig6 AND a.vec_id < b.vec_id)
SELECT 'lsh_topk' AS variant, CAST(0 AS BIGINT) AS id_a,
       CAST(vec_id AS BIGINT) AS id_b, cos AS cosine FROM lt
UNION ALL
SELECT 'ivf_topk', CAST(0 AS BIGINT), CAST(vec_id AS BIGINT), cos FROM it
UNION ALL
SELECT 'ivf_index_probe', CAST(0 AS BIGINT), CAST(vec_id AS BIGINT), cos FROM it
UNION ALL
SELECT 'pq_topk', CAST(0 AS BIGINT), CAST(vec_id AS BIGINT),
       CAST(1.0 AS DOUBLE) - approx_d2 / 2 FROM pt
UNION ALL
SELECT 'lsh_blocked_neardup', CAST(id_a AS BIGINT), CAST(id_b AS BIGINT),
       cosine FROM blk WHERE cosine >= 0.9
UNION ALL
SELECT 'recall_lsh', CAST({K} AS BIGINT),
       CAST(count(*) AS BIGINT), count(*) / {K}.0
FROM lt JOIN bt USING (vec_id)
UNION ALL
SELECT 'recall_ivf', CAST({K} AS BIGINT),
       CAST(count(*) AS BIGINT), count(*) / {K}.0
FROM it JOIN bt USING (vec_id)
UNION ALL
SELECT 'recall_pq', CAST({K} AS BIGINT),
       CAST(count(*) AS BIGINT), count(*) / {K}.0
FROM pt JOIN bt USING (vec_id)
"""


def _lang_id_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_views(spark, sf_dir)
    return spark.sql(_lang_id_query_sql("spark"))


def _auto_group_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive auto-grouping on an events-derived frame: 'purchase'
    rows are labeled sources (each with a DISTINCT group, so assignments
    must propagate through chains), 'click' rows get grouped.

    The r3 fixture was degenerate — desc/colors were the event_type
    strings, so every purchase→click pair scored only the 0.2 time decay
    (< the 0.35 gate) and NOTHING ever grouped; the fold never exercised
    transitivity driver-side.  Now user_id % 3 picks the match mode:
    0 = desc+colors both match (score 1.4+decay → confidence clamps to
    1.0), 1 = desc-only (0.8+decay·0.2), 2 = colors-only (0.6+decay·0.2,
    a sub-1.0 float confidence) — every mode accepts, so grouping chains
    through consecutive ≤2-min gaps and the picked source is the
    nearest-in-time (argmax decay, strict-> first-seen tie-break)."""
    from ocr_auto_label_spark.operators.grouping import auto_group

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    frame = events.filter(F.col("event_type").isin("purchase", "click")).select(
        F.col("event_id").cast("string").alias("id"),
        F.col("user_id"),
        # epoch SECONDS as the ms axis (a 1000x time compression):
        # the raw events table is minutes-sparse per user, which left
        # the +/-2-min window empty almost everywhere (7 groupings at
        # sf0.01, zero chains); compressed, the window covers real gaps
        # up to 120000 s (median per-user gap ~63k s) so acceptance,
        # rejection AND transitive chains all occur
        F.col("ts").cast("timestamp").cast("long").alias("ts_ms"),
        F.when(F.col("event_type") == "purchase",
               F.concat(F.lit("g"), F.col("user_id"), F.lit("_"),
                        F.col("event_id"))).alias("group"),
        F.when(F.col("event_type") == "purchase", F.lit("extracted"))
        .otherwise(F.lit("pending_grouping")).alias("status"),
        F.when(F.col("user_id") % 3 != 2, F.lit("shared item record"))
        .alias("desc"),
        F.when(F.col("user_id") % 3 != 1, F.array(F.lit("red")))
        .otherwise(F.array().cast("array<string>")).alias("colors"),
        F.lit(None).cast("double").alias("grouping_confidence"),
    )
    # cluster per user (the conv_id analog) — parallel, no global window
    return auto_group(frame, key_cols=["user_id"])


def _auto_group_duck() -> str:
    """DuckDB oracle for the sequential-transitive fold (VERDICT r3 #4),
    derived from the fixture's structure rather than replicating the
    pandas loop:

    - Every candidate pair in a user shares one attribute profile, so the
      score is strictly decreasing in |Δt| within the ±2-min window —
      acceptance reduces to EXISTENCE of an eligible source, the argmax
      to argmin |Δt| (strict-> tie → first in (ts, id) iteration order),
      and both are exact integer arithmetic.
    - The single ts-ascending pass means a click may source only
      (a) purchases anywhere in its window, or (b) EARLIER-ordered clicks
      that themselves grouped — so the grouped set is the least fixed
      point of a forward-in-time reachability operator: recursive CTE #1
      (``reach``).  Group values then flow down the one-parent-per-click
      forest rooted at purchases: recursive CTE #2 (``prop``).
    - Confidence replicates the Python float op tree exactly
      (tier + color, then + decay·0.2, then min(·, 1.0)) so the doubles
      are bit-identical, not just close (grouping.ts:157-206 semantics).
    """
    decay = "1.0 - (CAST(b.dt AS DOUBLE) / 120000)"
    base = ("CASE b.user_id % 3 WHEN 0 THEN 0.8 + 0.6 "
            "WHEN 1 THEN 0.8 + 0.0 ELSE 0.0 + 0.6 END")
    return f"""
WITH RECURSIVE frame AS (
  SELECT CAST(event_id AS VARCHAR) AS id, user_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS ts_ms,
         event_type = 'purchase' AS is_p,
         CASE WHEN event_type = 'purchase'
              THEN concat('g', user_id, '_', event_id) END AS grp
  FROM events WHERE event_type IN ('purchase', 'click')),
purch AS (SELECT * FROM frame WHERE is_p),
clicks AS (SELECT * FROM frame WHERE NOT is_p),
reach AS (
  SELECT c.user_id, c.id, c.ts_ms
  FROM clicks c JOIN purch p ON p.user_id = c.user_id
   AND abs(p.ts_ms - c.ts_ms) <= 120000
  UNION
  SELECT c.user_id, c.id, c.ts_ms
  FROM clicks c JOIN reach g ON g.user_id = c.user_id
   AND abs(g.ts_ms - c.ts_ms) <= 120000
   AND (g.ts_ms < c.ts_ms OR (g.ts_ms = c.ts_ms AND g.id < c.id))),
sources AS (
  SELECT user_id, id, ts_ms, TRUE AS is_p FROM purch
  UNION ALL
  SELECT user_id, id, ts_ms, FALSE AS is_p FROM reach),
cand AS (
  SELECT c.id AS cid, c.user_id, s.id AS sid, s.ts_ms AS sts,
         abs(s.ts_ms - c.ts_ms) AS dt
  FROM reach c JOIN sources s ON s.user_id = c.user_id
   AND abs(s.ts_ms - c.ts_ms) <= 120000
   AND (s.is_p OR s.ts_ms < c.ts_ms
        OR (s.ts_ms = c.ts_ms AND s.id < c.id))
   AND s.id <> c.id),
best AS (
  SELECT cid, user_id, sid, dt FROM (
    SELECT cid, user_id, sid, dt,
           row_number() OVER (PARTITION BY cid ORDER BY dt, sts, sid) AS rn
    FROM cand) q WHERE rn = 1),
prop AS (
  SELECT id, grp FROM purch
  UNION ALL
  SELECT b.cid, p.grp FROM best b JOIN prop p ON b.sid = p.id),
assigned AS (
  SELECT b.cid AS id, p.grp,
         least({base}
               + (CASE WHEN {decay} > 0.0 THEN {decay} ELSE 0.0 END) * 0.2,
               1.0) AS confidence
  FROM best b JOIN prop p ON p.id = b.cid)
SELECT f.id, f.ts_ms, coalesce(a.grp, f.grp) AS "group",
       CASE WHEN f.is_p THEN 'extracted'
            WHEN a.id IS NOT NULL THEN 'auto_grouped'
            ELSE 'ungrouped' END AS status,
       CASE WHEN f.is_p THEN CAST(NULL AS DOUBLE)
            WHEN a.id IS NOT NULL THEN a.confidence
            ELSE 0.0 END AS grouping_confidence
FROM frame f LEFT JOIN assigned a ON f.id = a.id
"""


def _csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8 (ordered CSV export + summary sidecar) → S9 (multi-CSV scan):
    the export/notebook boundary exercised end-to-end."""
    import tempfile

    from ocr_auto_label_spark.io.sources import export_csv, read_csv_multi

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "source", F.array("lang", "source").alias("tags")
    )
    base = tempfile.mkdtemp(prefix="csv_rt_")
    export_csv(docs, base, order_cols=["doc_id"], single_file=True)
    back = read_csv_multi(spark, [f"{base}/csv"])
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.length("tags")).alias("tag_json_chars"),
    )


_EXPORT_SHAPE_SPARK = (
    # images.ts:799-814: ISO timestamp + empty-string defaults per column
    "SELECT 'export_shape' AS variant, CAST(event_id AS STRING) AS k, "
    "date_format(ts, 'yyyy-MM-dd HH:mm:ss') AS v1, "
    "coalesce(nullif(event_type, 'click'), '') AS v2 FROM events"
)


def _s8_s9_export_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8 export shape + the FULL S8→S9 CSV roundtrip in one oracle-backed
    entry (variant column).  The roundtrip half writes an ordered
    single-file CSV (nested cols serialized via to_json at the boundary),
    reads it back through the multi-CSV source, and aggregates — the
    oracle replicates the post-roundtrip aggregate, incl. the exact
    to_json array formatting '["a","b"]' (deterministic: 7 framing chars
    for a 2-element string array)."""
    load_views(spark, sf_dir)
    shape = spark.sql(_EXPORT_SHAPE_SPARK)
    rt = _csv_roundtrip(spark, sf_dir).select(
        F.lit("csv_roundtrip").alias("variant"),
        F.col("lang").alias("k"),
        F.col("cnt").cast("string").alias("v1"),
        F.col("tag_json_chars").cast("string").alias("v2"),
    )
    return shape.unionByName(rt)


_DUCK_S8_S9 = """
SELECT 'export_shape' AS variant, CAST(event_id AS VARCHAR) AS k,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS v1,
       coalesce(nullif(event_type, 'click'), '') AS v2 FROM events
UNION ALL
SELECT 'csv_roundtrip' AS variant, lang AS k,
       CAST(count(*) AS VARCHAR) AS v1,
       CAST(sum(length(lang) + length(source) + 7) AS VARCHAR) AS v2
FROM documents GROUP BY lang
"""


def _streaming_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9: availableNow incremental ingest → watermarked tumbling-window
    label-hit counts, drained to parquet and returned as a DataFrame."""
    import tempfile

    from ocr_auto_label_spark.datagen import transcripts_parquet
    from ocr_auto_label_spark.streaming.pipeline import run_windowed_counts

    inp = transcripts_parquet(2_000)
    base = tempfile.mkdtemp(prefix="stream_q_")
    q = run_windowed_counts(spark, inp, f"{base}/out", f"{base}/ckpt")
    q.awaitTermination()
    return spark.read.parquet(f"{base}/out")


def _streaming_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9: applyInPandasWithState — running per-conv extraction totals
    accumulated across microbatches; returns the final totals per conv."""
    import tempfile
    import uuid

    from pyspark.sql import Window

    from ocr_auto_label_spark.datagen import transcripts_parquet
    from ocr_auto_label_spark.streaming.stateful import run_conv_running_totals

    inp = transcripts_parquet(2_000)
    name = f"conv_totals_{uuid.uuid4().hex[:8]}"
    q = run_conv_running_totals(
        spark, inp, tempfile.mkdtemp(prefix="state_q_"), query_name=name
    )
    q.awaitTermination()
    updates = spark.table(name)
    w = Window.partitionBy("conv_id").orderBy(F.desc("turns"))
    return (
        updates.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("conv_id", "turns", "turns_with_label")
    )


def _streaming_deduped_counts(spark: SparkSession) -> DataFrame:
    """Bounded-state ingest dedup (dropDuplicatesWithinWatermark): drain
    an input containing a fully re-delivered file, count surviving turns
    per conv — every duplicate must be dropped, every unique kept.  The
    source is the CACHED seed-11 table (a deterministic static path), so
    the DuckDB oracle can read the same parquet and assert the drained
    result equals the exact per-conv distinct counts."""
    import os
    import shutil
    import tempfile

    from ocr_auto_label_spark.datagen import transcripts_parquet
    from ocr_auto_label_spark.streaming.pipeline import run_deduped_ingest

    base = tempfile.mkdtemp(prefix="stream_dd_")
    d = os.path.join(base, "in")
    os.makedirs(d)
    src = transcripts_parquet(2_000, seed=11)
    parts = sorted(f for f in os.listdir(src) if f.endswith(".parquet"))
    for p in parts:
        shutil.copy(os.path.join(src, p), os.path.join(d, p))
    # re-deliver the first file whole — the at-least-once duplicate case
    shutil.copy(os.path.join(src, parts[0]), os.path.join(d, "redelivered.parquet"))
    q = run_deduped_ingest(spark, d, f"{base}/out", f"{base}/ckpt")
    q.awaitTermination()
    return spark.read.parquet(f"{base}/out").groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("turns")
    )


def _streaming_cms_sketch(spark: SparkSession) -> DataFrame:
    """§2.9 + sketches: availableNow drain of the streaming count-min
    sketch (streaming/pipeline.py:run_term_sketch) over the pinned
    transcript corpus's text stream; returns the final grid."""
    import tempfile
    import uuid

    from ocr_auto_label_spark.datagen import transcripts_parquet
    from ocr_auto_label_spark.streaming.pipeline import run_term_sketch

    inp = transcripts_parquet(2_000)
    name = f"cms_stream_{uuid.uuid4().hex[:8]}"
    q = run_term_sketch(
        spark, inp, tempfile.mkdtemp(prefix="sketch_q_"), query_name=name
    )
    q.awaitTermination()
    return spark.table(name)


def _streaming_pipeline_duck() -> str:
    """DuckDB oracle for the drained streaming pipeline (VERDICT r3 #6):
    the STREAMING mechanics aren't SQL-expressible, but every drained
    RESULT is deterministic batch arithmetic —

    - windowed: append mode emits exactly the windows the final watermark
      finalized, i.e. window_end <= max(ts) - watermark (4 min) over the
      whole drained input (verified empirically: the drained set equals
      this predicate's set on the pinned corpus); per-window label hits
      come from the repair twin-lite (token scan + confusion repair
      validity — ``has_label`` ⟺ some token repairs within 2 edits, the
      noise gate can't fire on grammar-valid labels whose confidence
      floor is 0.614 > 0.35),
    - stateful: the running-totals state machine's final per-conv updates
      equal the whole-input group-by,
    - dedup_ingest: with a fully re-delivered file, surviving turns equal
      the base table's per-conv counts.
    """
    from ocr_auto_label_spark.datagen import transcripts_parquet
    from ocr_auto_label_spark.functions.confusion_sql import repair_query_sql
    from ocr_auto_label_spark.functions.flagship_sql import token_matches_sql
    from ocr_auto_label_spark.functions.xxh64_sql import (
        xxh64_int4_py,
        xxh64_str_staged_sql,
    )
    from ocr_auto_label_spark.operators.sketch import CMS_DEPTH, CMS_WIDTH

    p42 = transcripts_parquet(2_000)
    p11 = transcripts_parquet(2_000, seed=11)
    scan = token_matches_sql("duck", ["conv_id", "turn_idx"], "scan_src")
    repair = repair_query_sql(
        "duck", "FROM matches", carry_cols=["conv_id", "turn_idx"],
        code_col="token",
    )
    # streaming-CMS rebuild: distinct text-token vocab hashed once per
    # hash row (chained-seed staged XXH64), weighted by occurrence
    cms_ctes, cms_legs = [], []
    for j in range(CMS_DEPTH):
        seed = f"CAST({xxh64_int4_py(j, 42)} AS HUGEINT)"
        vh = xxh64_str_staged_sql("FROM cvoc", "term", seed)
        cms_ctes.append(
            f"cgr{j} AS (SELECT CAST(__xxh_u % {CMS_WIDTH} AS BIGINT) AS "
            f"bucket, sum(cnt) AS gcnt FROM ({vh}) zc{j} GROUP BY 1)"
        )
        cms_legs.append(
            f"SELECT 'sketch_stream' AS variant, CAST(NULL AS VARCHAR) AS "
            f"window_start_iso, CAST({j} AS VARCHAR) || '/' || "
            f"CAST(bucket AS VARCHAR) AS conv_id, CAST(gcnt AS BIGINT) AS "
            f"turns, CAST(NULL AS BIGINT) AS turns_with_label FROM cgr{j}"
        )
    cms_with = ",\n".join(cms_ctes)
    cms_union = " UNION ALL ".join(cms_legs)
    return f"""
WITH src AS (SELECT conv_id, turn_idx, ts, text, tool
             FROM read_parquet('{p42}/*.parquet')),
scan_src AS (
  SELECT conv_id, turn_idx, text AS s FROM src
  UNION ALL
  SELECT conv_id, turn_idx, tool AS s FROM src WHERE tool IS NOT NULL),
matches AS ({scan}),
repairq AS ({repair}),
hits AS (SELECT DISTINCT conv_id, turn_idx FROM repairq
         WHERE repaired IS NOT NULL),
turns AS (
  SELECT s.conv_id, s.turn_idx, s.ts,
         CAST(h.conv_id IS NOT NULL AS BIGINT) AS has_label
  FROM src s LEFT JOIN hits h
    ON s.conv_id = h.conv_id AND s.turn_idx = h.turn_idx),
w AS (SELECT conv_id, CAST(floor(epoch(ts)/120)*120 AS BIGINT) AS ws,
             has_label FROM turns),
mx AS (SELECT max(epoch(ts)) AS mx FROM src),
cvoc AS MATERIALIZED (
  SELECT term, count(*) AS cnt FROM (
    SELECT unnest(list_filter(
      regexp_split_to_array(lower(trim(text)), '\\s+'), w -> w <> ''))
      AS term FROM src) zc GROUP BY term),
{cms_with}
SELECT 'windowed' AS variant,
       strftime(make_timestamp(ws*1000000), '%Y-%m-%d %H:%M:%S') AS window_start_iso,
       conv_id, count(*) AS turns,
       CAST(sum(has_label) AS BIGINT) AS turns_with_label
FROM w, mx WHERE ws + 120 <= mx - 240 GROUP BY ws, conv_id
UNION ALL
SELECT 'stateful' AS variant, CAST(NULL AS VARCHAR) AS window_start_iso,
       conv_id, count(*) AS turns,
       CAST(sum(has_label) AS BIGINT) AS turns_with_label
FROM turns GROUP BY conv_id
UNION ALL
SELECT 'dedup_ingest' AS variant, CAST(NULL AS VARCHAR) AS window_start_iso,
       conv_id, count(*) AS turns, CAST(NULL AS BIGINT) AS turns_with_label
FROM read_parquet('{p11}/*.parquet') GROUP BY conv_id
UNION ALL
{cms_union}
"""


def _streaming_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 in one entry: the availableNow watermarked-window drain, the
    applyInPandasWithState running totals, AND the watermark-bounded
    ingest dedup, union-normalized with a variant column.  The Spark side
    runs the REAL streams; the drained results are oracle-checked against
    ``_streaming_pipeline_duck``'s batch reformulation."""
    win = _streaming_windowed_counts(spark, sf_dir).select(
        F.lit("windowed").alias("variant"),
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start_iso"),
        "conv_id", "turns", "turns_with_label",
    )
    st = _streaming_stateful_totals(spark, sf_dir).select(
        F.lit("stateful").alias("variant"),
        F.lit(None).cast("string").alias("window_start_iso"),
        "conv_id", "turns", "turns_with_label",
    )
    dd = _streaming_deduped_counts(spark).select(
        F.lit("dedup_ingest").alias("variant"),
        F.lit(None).cast("string").alias("window_start_iso"),
        "conv_id", "turns",
        F.lit(None).cast("long").alias("turns_with_label"),
    )
    # streaming CMS: the batch sketch operator run UNCHANGED on the
    # stream (complete mode is bounded because the grid is); the
    # drained grid is compared cell-for-cell against the DuckDB rebuild
    sk = _streaming_cms_sketch(spark).select(
        F.lit("sketch_stream").alias("variant"),
        F.lit(None).cast("string").alias("window_start_iso"),
        F.concat_ws("/", F.col("row_j"), F.col("bucket")).alias("conv_id"),
        F.col("cnt").cast("long").alias("turns"),
        F.lit(None).cast("long").alias("turns_with_label"),
    )
    return win.unionByName(st).unionByName(dd).unionByName(sk)


def _lifecycle_e2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 composed lifecycle (images.ts:387-455 + reindexGroup
    images.ts:39-59) on a documents-derived frame: every 7th doc moves —
    to a valid sample-code group (id%3==0), an invalid-name group
    (id%3==1), or out of any group (id%3==2); then ONLY the affected
    groups are re-indexed and statuses recomputed.

    The 1-in-7 move set is TEST-SCALE densification (so every status
    branch gets rows at sf0.01); the operator's contract is
    interactive-edit-sized moves (≪ table — the reference PUT handles one
    edit at a time), which is what justifies its broadcast joins."""
    from ocr_auto_label_spark.operators.lifecycle import apply_group_moves

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    frame = docs.select(
        F.col("doc_id").alias("id"),
        F.col("source").alias("group"),
        F.concat(F.lit("d"), F.lpad(F.col("doc_id").cast("string"), 8, "0"),
                 F.lit(".jpg")).alias("original_name"),
        F.col("doc_id").alias("created_at"),
        F.lit("auto_grouped").alias("status"),
        F.lit(0.5).alias("grouping_confidence"),
        F.lit("").alias("new_name"),
    )
    moves = frame.filter(F.col("id") % 7 == 0).select(
        "id",
        F.when(F.col("id") % 3 == 0, F.lit("MWI.0.1.4.10B.15.7"))
        .when(F.col("id") % 3 == 1, F.lit("bad group!"))
        .otherwise(F.lit("")).alias("new_group"),
        # carrying old_group (known to the caller, as in the reference's
        # PUT handler) lets the operator skip the derive-old-groups scan
        F.col("group").alias("old_group"),
    )
    return apply_group_moves(frame, moves).select(
        "id", "group", "status",
        F.col("grouping_confidence").cast("double").alias("grouping_confidence"),
        "new_name",
    )


def _lifecycle_e2_duck() -> str:
    """DuckDB oracle: full-recompute formulation of the same end state —
    moves applied, statuses per images.ts:407-419, ordinal re-index
    restricted to the affected-group set (everything else keeps its
    initial empty new_name)."""
    sanitize = (
        "CASE WHEN {s} = '' THEN 'untitled' ELSE {s} END".format(
            s="regexp_replace(regexp_replace(regexp_replace(regexp_replace("
              "trim(grp), '\\s+', '_', 'g'), '[<>:\"/\\\\|?*]', '', 'g'), "
              "'_+', '_', 'g'), '^_+|_+$', '', 'g')"
        )
    )
    return f"""
WITH base AS (
  SELECT doc_id AS id, source AS grp0,
         concat('d', lpad(CAST(doc_id AS VARCHAR), 8, '0'), '.jpg') AS original_name,
         doc_id AS created_at
  FROM documents),
moved AS (
  SELECT id, original_name, created_at,
         CASE WHEN id % 7 = 0 THEN
           CASE WHEN id % 3 = 0 THEN 'MWI.0.1.4.10B.15.7'
                WHEN id % 3 = 1 THEN 'bad group!' ELSE NULL END
         ELSE grp0 END AS grp,
         (id % 7 = 0) AS was_moved
  FROM base),
affected AS (
  SELECT DISTINCT grp0 AS g FROM base WHERE id % 7 = 0
  UNION
  SELECT DISTINCT CASE WHEN id % 3 = 0 THEN 'MWI.0.1.4.10B.15.7'
                       WHEN id % 3 = 1 THEN 'bad group!' END AS g
  FROM base WHERE id % 7 = 0),
named AS (
  SELECT id, grp, was_moved, original_name,
         row_number() OVER (PARTITION BY grp ORDER BY created_at, id) AS rn
  FROM moved)
SELECT id, grp AS "group",
  CASE WHEN was_moved AND grp IS NOT NULL THEN
         CASE WHEN {is_valid_sql('grp')} THEN 'user_grouped' ELSE 'invalid_group' END
       WHEN was_moved THEN 'ungrouped' ELSE 'auto_grouped' END AS status,
  CAST(CASE WHEN was_moved AND grp IS NOT NULL THEN 1.0
            WHEN was_moved THEN 0.0 ELSE 0.5 END AS DOUBLE) AS grouping_confidence,
  CASE WHEN grp IS NULL THEN ''
       WHEN grp IN (SELECT g FROM affected WHERE g IS NOT NULL)
       THEN concat({sanitize},
                   CASE WHEN rn > 1 THEN concat('_', CAST(rn AS VARCHAR)) ELSE '' END,
                   '.jpg')
       ELSE '' END AS new_name
FROM named
"""


def _infer_groups_keyed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale path for J2/W5 — the registered DEFAULT inference entry: the
    ±9-row window bounded per key (source), no global single-partition
    sort; each key's window sorts independently.  The reference-exact
    global form (``infer_groups(key_cols=[])``, one task sorts the world)
    is reference-semantics-only for small snapshots and stays covered by
    tests/test_inference.py."""
    from ocr_auto_label_spark.operators.inference import infer_groups

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    palette = F.array(F.lit("#FF0000"), F.lit("#0000FF"), F.lit("#00FF00"), F.lit("#111111"))
    frame = docs.select(
        F.col("doc_id").cast("string").alias("id"),
        F.col("source"),
        F.concat(F.lit("d"), F.lpad(F.col("doc_id").cast("string"), 8, "0"),
                 F.lit(".jpg")).alias("original_name"),
        (F.col("doc_id") * 1000).alias("ts_ms"),
        # labeled ⟺ doc_id % 3 == 0: the testdata assigns source by
        # doc_id % 20, so a parity rule (% 2) puts every doc of a source
        # on the same side and no window ever pairs a labeled neighbor
        # with an unlabeled target; % 3 cycles within each source
        F.when(F.col("doc_id") % 3 == 0, F.concat(F.lit("g"), F.col("source"))).alias("group"),
        F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, 4)).alias("desc"),
        # palette index decoupled from the labeling rule for the same
        # reason: tied indexes would make color matches impossible
        F.array(
            F.element_at(palette, (F.expr("doc_id div 2") % 4 + 1).cast("int"))
        ).alias("colors"),
    )
    return infer_groups(frame, key_cols=["source"]).select(
        "id", "source", "group", "inferred_group", "grouping_confidence"
    )


def _infer_groups_keyed_duck() -> str:
    """Fully independent relational reformulation of the keyed ±9-window
    inference (the Spark side runs the REAL pandas-UDF operator): rank per
    source, non-equi self-join on |Δrank| ≤ 9, the exact
    extractMeaningfulWords ≥2-shared-words rule (duplicates counted,
    groupInference.ts:171-179, 261-272), and most-recent-wins via arg_max
    (ts_ms = doc_id·1000 is globally unique → no tie ambiguity).

    Color rule: the entry's palette is 4 fixed hexes mapping to families
    red/blue/green (meaningful) and black (neutral); with single-element
    color lists, has_matching_colors (ts:222-256 — meaningful-first,
    neutral-fallback, never cross-tier) reduces EXACTLY to same-palette-
    index: same meaningful family ⟺ same hex; both-neutral ⟺ both black;
    cross-tier always false.  The full hex→HSL→family math is separately
    oracle-checked by x10_color_family."""
    from ocr_auto_label_spark.labelcore.inference import COMMON_WORDS

    common = ", ".join(f"'{w}'" for w in sorted(COMMON_WORDS))
    return f"""
WITH frame AS (
  SELECT CAST(doc_id AS VARCHAR) AS id, source,
         lpad(CAST(doc_id AS VARCHAR), 8, '0') AS oname,
         doc_id * 1000 AS ts_ms,
         CASE WHEN doc_id % 3 = 0 THEN concat('g', source) END AS grp,
         array_to_string((string_split(text, ' '))[1:4], ' ') AS d,
         (doc_id // 2) % 4 AS cidx
  FROM documents),
words AS (
  SELECT *, list_filter(
      regexp_split_to_array(regexp_replace(lower(d), '[^a-z0-9_\\s]', '', 'g'), '\\s+'),
      w -> length(w) > 2 AND NOT list_contains([{common}], w)) AS mw
  FROM frame),
numbered AS (
  SELECT *, row_number() OVER (PARTITION BY source ORDER BY oname, id) AS rn
  FROM words),
matched AS (
  SELECT t.id, arg_max(n.grp, n.ts_ms) AS inferred
  FROM numbered t JOIN numbered n
    ON t.source = n.source AND abs(t.rn - n.rn) <= 9 AND t.id <> n.id
  WHERE t.grp IS NULL AND n.grp IS NOT NULL AND trim(n.grp) <> ''
    AND t.cidx = n.cidx
    AND len(list_filter(t.mw, w -> list_contains(n.mw, w))) >= 2
  GROUP BY t.id)
SELECT f.id, f.source, f.grp AS "group", m.inferred AS inferred_group,
       CAST(CASE WHEN m.inferred IS NOT NULL THEN 0.7 END AS DOUBLE)
         AS grouping_confidence
FROM frame f LEFT JOIN matched m ON f.id = m.id
"""


# ------------------------------------------------------------ the registry

_DUCK_J1 = f"""
WITH jpu AS MATERIALIZED (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
jcl AS MATERIALIZED (
  SELECT user_id, ts, max(event_id) AS r_id
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
jas AS MATERIALIZED (
  SELECT p.event_id AS pid, c.r_id AS cid,
         epoch_us(p.ts) - epoch_us(c.ts) AS gap
  FROM jpu p ASOF LEFT JOIN jcl c
    ON p.user_id = c.user_id AND p.ts >= c.ts)
SELECT 'range_pairs' AS variant, CAST(a.user_id AS VARCHAR) AS k,
       count(*) AS v1, CAST(NULL AS BIGINT) AS v2
FROM jpu a JOIN jpu b
  ON a.user_id = b.user_id AND a.event_id <> b.event_id
 AND abs(CAST(floor(epoch(a.ts)) AS BIGINT) - CAST(floor(epoch(b.ts)) AS BIGINT)) <= 120
GROUP BY a.user_id
UNION ALL
SELECT 'asof' AS variant, CAST(pid AS VARCHAR) AS k,
       cid AS v1, gap AS v2 FROM jas
UNION ALL
SELECT 'asof_tol' AS variant, CAST(pid AS VARCHAR) AS k,
       CASE WHEN gap <= {_ASOF_TOL_US} THEN cid END AS v1,
       CASE WHEN gap <= {_ASOF_TOL_US} THEN gap END AS v2
FROM jas
"""

_DUCK_JACCARD = """
WITH RECURSIVE sh AS (
  SELECT doc_id, lang, n_chars,
         list_distinct(list_transform(range(1, greatest(length(text) - 2, 1) + 1),
                                      i -> substring(text, i, 3))) AS sh
  FROM documents),
p AS (
  SELECT id_a, id_b, jaccard FROM (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(len(list_intersect(a.sh, b.sh)) * 1.0 /
                 greatest(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)), 1), 6) AS jaccard
    FROM sh a JOIN sh b
      ON a.lang = b.lang AND a.n_chars = b.n_chars AND a.doc_id < b.doc_id) q
  WHERE jaccard >= 0.3),
edges AS (
  SELECT id_a AS a, id_b AS b FROM p UNION SELECT id_b, id_a FROM p),
reach AS (
  SELECT a AS id, b AS r FROM edges
  UNION
  SELECT w.id, e.b FROM reach w JOIN edges e ON w.r = e.a),
comp AS (
  SELECT id, least(id, min(r)) AS root FROM reach GROUP BY id)
SELECT 'pair' AS variant, CAST(id_a AS BIGINT) AS id_a,
       CAST(id_b AS BIGINT) AS id_b, CAST(jaccard AS DOUBLE) AS val FROM p
UNION ALL
SELECT 'component' AS variant, CAST(id AS BIGINT) AS id_a,
       CAST(root AS BIGINT) AS id_b, CAST(NULL AS DOUBLE) AS val FROM comp
"""

# CAST(... AS DOUBLE[]) forces DuckDB to accumulate in double like Spark
_DUCK_TOPK = """
SELECT vec_id, round(list_cosine_similarity(CAST(embedding AS DOUBLE[]),
         (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)), 4) AS cosine
FROM embeddings ORDER BY cosine DESC, vec_id LIMIT 10
"""

def _embed_neardup_duck() -> str:
    """Independent DuckDB replay of the near-dup suite, incl. the full
    SemDeDup pipeline: centroids = 16 smallest signed xxhash64(vec_id)
    (the XXH64-in-SQL compiler), assignment = ranking window over the
    rounded cosine (Spark side: array_position-of-max — same winner, same
    lowest-c_id tie-break), pairs/eviction as plain SQL."""
    from ocr_auto_label_spark.functions.xxh64_sql import (
        apply_stages,
        to_signed,
        xxh64_int4_py,
        xxh64_long8_stages,
    )

    hashed = apply_stages(
        "SELECT vec_id FROM embeddings", xxh64_long8_stages("vec_id", "42")
    )
    # the ±1 hyperplane weights are data-independent — generate them here
    # from the XXH64 spec (the same (dim, plane) IntegerType chain Spark's
    # hyperplane_signature derives them from) and fold them into the query
    # as literals; the sign fold replays Spark's left-to-right double
    # accumulation exactly (list_prepend-seeded list_reduce), so the
    # bucket ids are bit-equal, not merely approximately equal
    bits, dim = 6, 64
    sig_terms = []
    for p in range(bits):
        w = [
            "1.0" if (xxh64_int4_py(p, xxh64_int4_py(i, 42)) >> 1) & 1 else "-1.0"
            for i in range(dim)
        ]
        prods = (
            f"list_transform(range(1, {dim + 1}), "
            f"j -> CAST(embedding[j] AS DOUBLE) * ([{', '.join(w)}])[j])"
        )
        dot = (
            f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), {prods}), "
            "(a, b) -> a + b)"
        )
        sig_terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << p} ELSE 0 END)")
    sig_expr = " + ".join(sig_terms)
    return f"""
WITH hv AS MATERIALIZED (
  SELECT vec_id, {to_signed('__l8_u')} AS h FROM ({hashed})),
cent AS MATERIALIZED (
  SELECT row_number() OVER (ORDER BY hv.h, hv.vec_id) - 1 AS c_id,
         CAST(e.embedding AS DOUBLE[]) AS c_vec
  FROM hv JOIN embeddings e ON e.vec_id = hv.vec_id
  ORDER BY hv.h, hv.vec_id LIMIT 16),
asg AS MATERIALIZED (
  SELECT vec_id, embedding, sd_cluster, sd_cos FROM (
    SELECT e.vec_id, e.embedding, c.c_id AS sd_cluster,
           round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.c_vec), 6) AS sd_cos,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.c_vec), 6) DESC,
                      c.c_id) AS rn
    FROM embeddings e CROSS JOIN cent c) q
  WHERE rn = 1),
spf AS MATERIALIZED (
  SELECT * FROM (
    SELECT a.sd_cluster, a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 6) AS cosine
    FROM asg a JOIN asg b ON a.sd_cluster = b.sd_cluster AND a.vec_id < b.vec_id) sp
  WHERE cosine >= 0.3)
SELECT 'label_blocked' AS variant, id_a, id_b, cosine FROM (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                      CAST(b.embedding AS DOUBLE[])), 6) AS cosine
  FROM embeddings a JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id) p
WHERE cosine >= 0.3
UNION ALL
SELECT 'semdedup_assign' AS variant, vec_id AS id_a,
       CAST(sd_cluster AS BIGINT) AS id_b, sd_cos AS cosine FROM asg
UNION ALL
SELECT 'semdedup_pair' AS variant, id_a, id_b, cosine FROM spf
UNION ALL
SELECT 'semdedup_evict' AS variant, CAST(sd_cluster AS BIGINT) AS id_a,
       id_b, CAST(NULL AS DOUBLE) AS cosine
FROM (SELECT DISTINCT sd_cluster, id_b FROM spf) ev
UNION ALL
SELECT 'lsh_signature' AS variant, vec_id AS id_a,
       CAST({sig_expr} AS BIGINT) AS id_b, CAST(NULL AS DOUBLE) AS cosine
FROM embeddings
"""

# name → (spark callable or shared SQL, duckdb oracle SQL or None).
# CONTRACT: the driver evaluates the first 50 registry entries in
# insertion order — the registry is kept ≤50 so EVERY entry gets a
# CORRECTNESS row, with the extraction core first.  Where round-1 had
# near-duplicate entries they are merged: a merged entry carries a
# `variant` column or extra output columns, and COVERAGE.md maps each
# SURVEY §2 operator to its entry+column.
REGISTRY: dict[str, tuple[object, str | None]] = {
    # --- extraction core (Arrow UDFs: not SQL-expressible) ---
    "extract_flagship": (_extract_flagship, _extract_flagship_duck),
    "extract_best_labels": (_extract_best_labels, _extract_best_labels_duck),
    "extract_lineage_stats": (_extract_lineage_stats, _extract_lineage_stats_duck),
    # the COMPLETE composed pipeline (Arrow extraction → status decision →
    # per-conv transitive fold → naming → dup resolution) vs one DuckDB
    # reformulation (functions/e1_sql.py) — oracle-backed since r4; input
    # pinned to the 2k corpus like the twin (each stage still runs at sf
    # scale in its own entry: extract_flagship, auto_group_transitive,
    # w1_a1_j3_ordinal_naming, a2_duplicate_detection)
    "full_pipeline_e1": (_full_pipeline_e1_pinned, _full_pipeline_e1_duck),
    # --- the composed extraction semantics under the driver oracle: the
    # SQL twin of the flagship (token scan → confusion repair → fuzzy
    # canonical match → confidence rank + normalizer), pytest-asserted
    # byte-equal to the Arrow-UDF flagship above ---
    "extract_flagship_sql_twin": (_flagship_twin_spark, _flagship_twin_duck),
    # --- E2 composed lifecycle (group move → re-index → status) ---
    "lifecycle_e2_reindex": (_lifecycle_e2, _lifecycle_e2_duck()),
    # --- stateful grouping (sequential-transitive fold): the REAL
    # applyInPandas fold vs a recursive-CTE reachability + one-parent
    # propagation reformulation (fixture-structure-exact) ---
    "auto_group_transitive": (_auto_group_events, _auto_group_duck()),
    # --- ±9-row inference: keyed scale path is the registered default,
    # now oracle-backed (real pandas-UDF operator vs relational DuckDB
    # reformulation — fully independent implementations) ---
    "infer_groups_keyed": (_infer_groups_keyed, _infer_groups_keyed_duck()),
    # --- structured streaming (availableNow drains); the drained results
    # ARE deterministic batch arithmetic → oracle-backed since r4 ---
    "streaming_pipeline": (_streaming_pipeline, _streaming_pipeline_duck),
    # --- windows (W1-W8) ---
    "w2_stable_turn_ordering": (_w2_ordering_sft, _w2_ordering_sft_duck),
    "w8_session_window": (
        # ±2-min proximity clustering (grouping.ts:123-125) as Spark's
        # native session_window; oracle = classic gaps-and-islands.  Both
        # break a session when the gap to the previous event is ≥ 120 s
        # (session windows [t, t+gap) merge iff they overlap).
        "SELECT user_id, date_format(session_window.start, 'yyyy-MM-dd HH:mm:ss') "
        "AS sess_start, count(*) AS turns FROM events "
        "GROUP BY user_id, session_window(ts, '120 seconds')",
        "WITH o AS (SELECT user_id, ts, CASE WHEN lag(ts) OVER w IS NULL "
        "OR epoch(ts) - epoch(lag(ts) OVER w) >= 120 THEN 1 ELSE 0 END AS brk "
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)), "
        "i AS (SELECT user_id, ts, sum(brk) OVER (PARTITION BY user_id ORDER BY ts "
        "ROWS UNBOUNDED PRECEDING) AS sess FROM o) "
        "SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS sess_start, "
        "count(*) AS turns FROM i GROUP BY user_id, sess",
    ),
    # W1 webapp + A1 notebook naming off ONE ranked window, plus the J3
    # membership-size window (count over partition, no join)
    "w1_a1_j3_ordinal_naming": (
        "WITH ranked AS (SELECT o_orderkey, o_custkey, "
        "row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn, "
        "count(*) OVER (PARTITION BY o_custkey) AS group_size FROM orders) "
        "SELECT o_orderkey, concat('c', CAST(o_custkey AS STRING), "
        "CASE WHEN rn > 1 THEN concat('_', CAST(rn AS STRING)) ELSE '' END, '.csv') AS webapp_name, "
        "concat('c', CAST(o_custkey AS STRING), '_', CAST(rn AS STRING), '.jpg') AS notebook_name, "
        "group_size FROM ranked",
        "same",
    ),
    # W3 argmax (first-seen-wins) + W4 most-recent pick + A3 group bool_or
    # + O3/O4 sorted-iteration top-1, one pass over orders
    "w3_w4_a3_group_pick": (
        "WITH ranked AS (SELECT o_custkey, o_orderkey, o_totalprice, "
        "row_number() OVER (PARTITION BY o_custkey "
        "ORDER BY o_totalprice DESC, o_orderdate, o_orderkey) AS price_rn, "
        "row_number() OVER (PARTITION BY o_custkey "
        "ORDER BY o_orderdate DESC, o_orderkey DESC) AS recent_rn, "
        "max(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) "
        "OVER (PARTITION BY o_custkey) AS has_final FROM orders), "
        "best AS (SELECT o_custkey, o_orderkey AS best_orderkey, "
        "o_totalprice AS best_price, has_final FROM ranked WHERE price_rn = 1), "
        "recent AS (SELECT o_custkey, o_orderkey AS latest_orderkey "
        "FROM ranked WHERE recent_rn = 1) "
        "SELECT b.o_custkey AS o_custkey, best_orderkey, best_price, has_final, "
        "latest_orderkey FROM best b JOIN recent r ON b.o_custkey = r.o_custkey",
        "same",
    ),
    "w5_sliding_frame_avg": (
        "SELECT event_id, round(avg(value) OVER (PARTITION BY user_id "
        "ORDER BY ts, event_id ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING), 4) AS smoothed "
        "FROM events",
        "same",
    ),
    # --- scalar-function suites (X1-X17) ---
    "x2_grammar_validate": (_grammar_validate_spark, _grammar_validate_duck()),
    "x4_confusion_repair": (_x4_confusion_repair_spark, _x4_confusion_repair_duck()),
    "token_span_scan": (_token_scan_spark, _token_scan_sql("duck")),
    "text_pii_scrub": (_pii_scrub_sql("spark"), _pii_scrub_sql("duck")),
    "x10_color_family": (_color_family_sql(), "same"),
    # W6/X12: emit the exact BIGINT decay units greatest(0, 120-Δ) — the
    # score is the fixed linear map 0.2/120·units, and round(double, 6)
    # diverges between Spark (BigDecimal HALF_UP) and DuckDB (double
    # multiply-round), so the compared column stays integer
    "x12_time_decay": (
        "SELECT event_id, greatest(CAST(0 AS BIGINT), 120 - (tsl - min_ts)) "
        "AS decay_units FROM (SELECT event_id, unix_timestamp(ts) AS tsl, "
        "min(unix_timestamp(ts)) OVER (PARTITION BY user_id) AS min_ts FROM events) t",
        "SELECT event_id, greatest(CAST(0 AS BIGINT), 120 - (tsl - min_ts)) "
        "AS decay_units FROM (SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS tsl, "
        "min(CAST(floor(epoch(ts)) AS BIGINT)) OVER (PARTITION BY user_id) AS min_ts "
        "FROM events) t",
    ),
    # X7 dup-counting word overlap (grouping.ts:309-324): integer
    # numerator/denominator instead of a rounded ratio (hash-exact)
    "x7_word_overlap_similarity": (
        "SELECT a.doc_id AS doc_id, CAST(size(array_intersect("
        "split(lower(a.text), ' '), split(lower(b.text), ' '))) AS BIGINT) AS overlap_cnt, "
        "CAST(greatest(greatest(size(split(lower(a.text), ' ')), "
        "size(split(lower(b.text), ' '))), 1) AS BIGINT) AS denom "
        "FROM documents a JOIN documents b ON a.doc_id + 1 = b.doc_id",
        "SELECT a.doc_id AS doc_id, CAST(len(list_distinct(list_intersect("
        "string_split(lower(a.text), ' '), string_split(lower(b.text), ' ')))) AS BIGINT) "
        "AS overlap_cnt, CAST(greatest(greatest(len(string_split(lower(a.text), ' ')), "
        "len(string_split(lower(b.text), ' '))), 1) AS BIGINT) AS denom "
        "FROM documents a JOIN documents b ON a.doc_id + 1 = b.doc_id",
    ),
    # --- filters / projections (F1-F8); F1/F6 status-set agg + F5
    # contains-search merged to one variant union (slot freed for the
    # flagship SQL twin, VERDICT r3 #2); r4 adds the index-backed search
    # the contains-scan grows into at corpus scale ---
    "f1_f5_filter_suite": (_f1_f5_suite, _f1_f5_suite_duck()),
    "f3_projection_pushdown": (
        "SELECT o_orderkey, o_orderpriority FROM orders WHERE o_totalprice > 150.0",
        "same",
    ),
    # --- joins (J1-J7) ---
    # J5 broadcast-agg + anti-join in one union (variant column)
    "j5_join_suite": (
        "SELECT /*+ BROADCAST(p) */ 'broadcast_agg' AS variant, "
        "l_returnflag AS grp_key, count(*) AS cnt, "
        "round(sum(l_extendedprice), 2) AS revenue "
        "FROM lineitem JOIN part p ON l_partkey = p_partkey "
        "WHERE p_size > 25 GROUP BY l_returnflag "
        "UNION ALL "
        "SELECT 'anti' AS variant, c_mktsegment AS grp_key, count(*) AS cnt, "
        "CAST(NULL AS DOUBLE) AS revenue FROM customer "
        "WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) "
        "GROUP BY c_mktsegment",
        "same",
    ),
    "j1_time_range_self_join": (_j1_time_range, _DUCK_J1),
    "j2_ordinal_proximity_join": (
        # ±9-row neighborhood (groupInference.ts:354-366); partitioned by
        # source so the ranking window never collapses to one task at scale
        "WITH ranked AS (SELECT doc_id, source, "
        "row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn FROM documents) "
        "SELECT a.doc_id AS doc_id, count(*) AS neighbor_cnt "
        "FROM ranked a JOIN ranked b ON a.source = b.source "
        "AND abs(a.rn - b.rn) <= 9 AND a.doc_id <> b.doc_id GROUP BY a.doc_id",
        "same",
    ),
    "j6_fuzzy_canonical_join": (_fuzzy_join_spark, _fuzzy_join_duck()),
    # --- sources (S3/S4 filter + A5 extension stats, one union) ---
    "s3_a5_extension_stats": (
        "SELECT 'filtered' AS variant, ext, cnt FROM ("
        "SELECT ext, count(*) AS cnt FROM ("
        "SELECT regexp_extract(path, '\\\\.([^.]*)$', 1) AS ext FROM ("
        "SELECT concat('dir/f', CAST(doc_id AS STRING), "
        "CASE WHEN doc_id % 5 = 0 THEN '.jpg' WHEN doc_id % 5 = 1 THEN '.txt' "
        "WHEN doc_id % 5 = 2 THEN '.png' WHEN doc_id % 5 = 3 THEN '.heic' "
        "ELSE '.__MACOSX' END) AS path FROM documents) p "
        "WHERE path rlike '\\\\.(jpg|jpeg|png|heic|heif)$' "
        "AND NOT path rlike '(^|/)\\\\._|__MACOSX') e GROUP BY ext) q1 "
        "UNION ALL "
        "SELECT 'all_lower' AS variant, ext, cnt FROM ("
        "SELECT lower(regexp_extract(concat('f', CAST(doc_id AS STRING), "
        "CASE WHEN doc_id % 3 = 0 THEN '.JPG' WHEN doc_id % 3 = 1 THEN '.png' "
        "ELSE '.heic' END), '\\\\.([^.]*)$', 1)) AS ext, count(*) AS cnt "
        "FROM documents GROUP BY 1) q2",
        "SELECT 'filtered' AS variant, ext, cnt FROM ("
        "SELECT ext, count(*) AS cnt FROM ("
        "SELECT regexp_extract(path, '\\.([^.]*)$', 1) AS ext FROM ("
        "SELECT concat('dir/f', CAST(doc_id AS STRING), "
        "CASE WHEN doc_id % 5 = 0 THEN '.jpg' WHEN doc_id % 5 = 1 THEN '.txt' "
        "WHEN doc_id % 5 = 2 THEN '.png' WHEN doc_id % 5 = 3 THEN '.heic' "
        "ELSE '.__MACOSX' END) AS path FROM documents) p "
        "WHERE regexp_matches(path, '\\.(jpg|jpeg|png|heic|heif)$') "
        "AND NOT regexp_matches(path, '(^|/)\\._|__MACOSX')) e GROUP BY ext) q1 "
        "UNION ALL "
        "SELECT 'all_lower' AS variant, ext, cnt FROM ("
        "SELECT lower(regexp_extract(concat('f', CAST(doc_id AS STRING), "
        "CASE WHEN doc_id % 3 = 0 THEN '.JPG' WHEN doc_id % 3 = 1 THEN '.png' "
        "ELSE '.heic' END), '\\.([^.]*)$', 1)) AS ext, count(*) AS cnt "
        "FROM documents GROUP BY 1) q2",
    ),
    # S8 export shape + full S8→S9 CSV roundtrip, both oracle-backed
    # (merged from r2's s8_export_shape + rows-only s8_s9_csv_roundtrip)
    "s8_s9_export_roundtrip": (_s8_s9_export_roundtrip, _DUCK_S8_S9),
    # --- aggregations (A2/A4/A6/A8 + F7/F8 null coercion) ---
    "a8_hit_rate_tally": (
        # grouping.ts:114 success tally → our per-partition hit-rate metric
        "SELECT user_id, count(*) AS row_count, "
        "round(avg(CAST(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS DOUBLE)), 6) "
        "AS hit_rate FROM events GROUP BY user_id",
        "same",
    ),
    "a2_duplicate_detection": (
        "SELECT n_chars, count(*) AS dup_count FROM documents "
        "GROUP BY n_chars HAVING count(*) > 1",
        "same",
    ),
    # A6/U5 ordered distinct union + F7/F8 nullif coercion on the same agg
    "a6_ordered_distinct_union": (
        "SELECT lang, nullif(lang, 'zh') AS lang_opt, "
        "array_join(array_sort(collect_set(source)), ';') AS sources, "
        "count(*) AS cnt FROM documents GROUP BY lang",
        "SELECT lang, nullif(lang, 'zh') AS lang_opt, "
        "array_to_string(list_sort(list(DISTINCT source)), ';') AS sources, "
        "count(*) AS cnt FROM documents GROUP BY lang",
    ),
    # --- set ops (U1-U3 + X8 meaningful words) ---
    "u1_union_by_name": (
        "SELECT lang, count(*) AS cnt FROM ("
        "SELECT doc_id, lang FROM documents WHERE lang = 'en' "
        "UNION ALL SELECT doc_id, lang FROM documents WHERE lang = 'es') u GROUP BY lang",
        "same",
    ),
    "u2_u3_word_set_ops": (
        "SELECT doc_id, size(array_intersect(split(lower(text), ' '), "
        "array('spark', 'data', 'query'))) AS overlap, "
        "size(array_except(split(lower(text), ' '), "
        "array('the', 'a', 'an', 'and', 'or', 'in', 'on', 'at', 'to', 'of'))) "
        "AS meaningful_cnt FROM documents",
        "SELECT doc_id, len(list_intersect(string_split(lower(text), ' '), "
        "['spark', 'data', 'query'])) AS overlap, "
        "len(list_distinct(list_filter(string_split(lower(text), ' '), "
        "w -> NOT list_contains(['the', 'a', 'an', 'and', 'or', 'in', 'on', 'at', 'to', 'of'], w)))) "
        "AS meaningful_cnt FROM documents",
    ),
    # X1 code normalization + X5 filename sanitization, one customer scan
    "x1_x5_normalize_sanitize": (
        "SELECT c_custkey, code, upper(trim(code)) AS norm_code, "
        "size(split(upper(trim(code)), '\\\\.')) AS seg_cnt, "
        "element_at(split(upper(trim(code)), '\\\\.'), 1) AS first_seg, "
        "regexp_replace(regexp_replace(regexp_replace(regexp_replace(raw_name, "
        "'[ ]+', '_'), '[<>:?*]', ''), '[_]+', '_'), '^[_]+|[_]+$', '') AS clean_name "
        "FROM (SELECT c_custkey, concat(' ', c_mktsegment, '.', CAST(c_custkey AS STRING), ' ') AS code, "
        "trim(concat(' ', c_name, ' <', c_mktsegment, '> ')) AS raw_name FROM customer) t",
        "SELECT c_custkey, code, upper(trim(code)) AS norm_code, "
        "len(string_split(upper(trim(code)), '.')) AS seg_cnt, "
        "string_split(upper(trim(code)), '.')[1] AS first_seg, "
        "regexp_replace(regexp_replace(regexp_replace(regexp_replace(raw_name, "
        "'[ ]+', '_', 'g'), '[<>:?*]', '', 'g'), '[_]+', '_', 'g'), '^[_]+|[_]+$', '', 'g') AS clean_name "
        "FROM (SELECT c_custkey, concat(' ', c_mktsegment, '.', CAST(c_custkey AS STRING), ' ') AS code, "
        "trim(concat(' ', c_name, ' <', c_mktsegment, '> ')) AS raw_name FROM customer) t",
    ),
    # X9 color normalization + X17 group-prefix extraction (variant union)
    "x9_x17_group_agg": (
        "SELECT 'norm_color' AS variant, grp_key, cnt FROM ("
        "SELECT trim(regexp_replace(lower(concat("
        "CASE WHEN doc_id % 3 = 0 THEN 'light ' WHEN doc_id % 3 = 1 THEN 'dark ' ELSE '' END, "
        "lang, ' blue')), '(light|dark|bright|deep|pale|vivid)\\\\s+', '')) AS grp_key, "
        "count(*) AS cnt FROM documents GROUP BY 1) q1 "
        "UNION ALL "
        "SELECT 'group_prefix' AS variant, grp_key, cnt FROM ("
        "SELECT regexp_extract(concat(lang, '_', CAST(doc_id AS STRING)), '^([^_]+)_', 1) "
        "AS grp_key, count(*) AS cnt FROM documents GROUP BY 1) q2",
        "SELECT 'norm_color' AS variant, grp_key, cnt FROM ("
        "SELECT trim(regexp_replace(lower(concat("
        "CASE WHEN doc_id % 3 = 0 THEN 'light ' WHEN doc_id % 3 = 1 THEN 'dark ' ELSE '' END, "
        "lang, ' blue')), '(light|dark|bright|deep|pale|vivid)\\s+', '', 'g')) AS grp_key, "
        "count(*) AS cnt FROM documents GROUP BY 1) q1 "
        "UNION ALL "
        "SELECT 'group_prefix' AS variant, grp_key, cnt FROM ("
        "SELECT regexp_extract(concat(lang, '_', CAST(doc_id AS STRING)), '^([^_]+)_', 1) "
        "AS grp_key, count(*) AS cnt FROM documents GROUP BY 1) q2",
    ),
    # X14 fence-strip+parse, the X13 plain-JSON path, AND the X16
    # timestamp formats — merged to one variant union (same events scan)
    # to free a window slot for main_content_extract
    "x14_fence_strip_json": (
        # gemini.ts:223-257: strip ```json fences, then parse
        "SELECT 'json_k' AS variant, event_type AS k, CAST(NULL AS STRING) AS v_str, "
        "round(avg(CAST(get_json_object(regexp_replace("
        "concat('```json', chr(10), props, chr(10), '```'), "
        "'^```json\\\\s*|\\\\s*```$', ''), '$.k') AS INT)), 4) AS v_fenced, "
        "round(avg(CAST(get_json_object(props, '$.k') AS INT)), 4) AS v_plain, "
        "CAST(NULL AS BIGINT) AS cnt FROM events GROUP BY event_type "
        "UNION ALL "
        "SELECT 'date_fmt' AS variant, date_format(ts, 'yyyy-MM-dd') AS k, "
        "date_format(min(ts), 'MM-dd-yy HH:mm:ss') AS v_str, "
        "CAST(NULL AS DOUBLE) AS v_fenced, CAST(NULL AS DOUBLE) AS v_plain, "
        "count(*) AS cnt FROM events GROUP BY 2",
        "SELECT 'json_k' AS variant, event_type AS k, CAST(NULL AS VARCHAR) AS v_str, "
        "round(avg(CAST(json_extract_string(regexp_replace("
        "concat('```json', chr(10), props, chr(10), '```'), "
        "'^```json\\s*|\\s*```$', '', 'g'), '$.k') AS INT)), 4) AS v_fenced, "
        "round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 4) AS v_plain, "
        "CAST(NULL AS BIGINT) AS cnt FROM events GROUP BY event_type "
        "UNION ALL "
        "SELECT 'date_fmt' AS variant, strftime(ts, '%Y-%m-%d') AS k, "
        "strftime(min(ts), '%m-%d-%y %H:%M:%S') AS v_str, "
        "CAST(NULL AS DOUBLE) AS v_fenced, CAST(NULL AS DOUBLE) AS v_plain, "
        "count(*) AS cnt FROM events GROUP BY 2",
    ),
    # X15 CSV field shaping + X6 dual extension rules, one documents scan
    "x15_x6_field_shaping": (
        # images.ts:799-814 colors → 'name:color; …' + empty defaults;
        # upload.ts:680 last-dot vs rename_photos.ipynb first-dot
        "SELECT doc_id, concat_ws('; ', transform(array("
        "named_struct('name', 'primary', 'color', lang), "
        "named_struct('name', 'source', 'color', source)), "
        "x -> concat(x.name, ':', x.color))) AS colors_csv, "
        "coalesce(nullif(lang, 'und'), '') AS lang_or_empty, "
        "regexp_extract(fname, '\\\\.([^.]*)$', 1) AS ext_last, "
        "regexp_extract(fname, '^[^.]*\\\\.(.*)$', 1) AS ext_first "
        "FROM (SELECT doc_id, lang, source, concat('img.', lang, "
        "CASE WHEN doc_id % 2 = 0 THEN '.tar.gz' ELSE '.jpg' END) AS fname "
        "FROM documents) t",
        "SELECT doc_id, array_to_string(list_transform("
        "[struct_pack(name := 'primary', color := lang), "
        "struct_pack(name := 'source', color := source)], "
        "x -> concat(x.name, ':', x.color)), '; ') AS colors_csv, "
        "coalesce(nullif(lang, 'und'), '') AS lang_or_empty, "
        "regexp_extract(fname, '\\.([^.]*)$', 1) AS ext_last, "
        "regexp_extract(fname, '^[^.]*\\.(.*)$', 1) AS ext_first "
        "FROM (SELECT doc_id, lang, source, concat('img.', lang, "
        "CASE WHEN doc_id % 2 = 0 THEN '.tar.gz' ELSE '.jpg' END) AS fname "
        "FROM documents) t",
    ),
    # X16 ISO day bucket + the MM-DD-YY display variant
    # (.cursor/implementation-plan.mdc:108-110)
    # Density-based main-content extraction (the north rule's "DOM
    # heuristics" leg): per-line Boilerpipe/jusText-style classifier over
    # the pinned transcript corpus — markup density + text length +
    # separator density, all integer arithmetic, kept text hash-compared
    # verbatim against the DuckDB dialect of the same generator
    # (functions/maincontent_sql.py)
    "main_content_extract": (_main_content_spark, _main_content_duck),
    # --- sorts / top-k / pagination (O1 top-k + offset, O2 multi-field
    # sort — merged to one variant union to free a window slot) ---
    "o1_o2_sort_paginate": (
        "SELECT 'topk_page' AS variant, o_orderkey, "
        "CAST(NULL AS STRING) AS prio, o_totalprice FROM ("
        "SELECT o_orderkey, o_totalprice FROM orders "
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 20 OFFSET 40) q1 "
        "UNION ALL "
        "SELECT 'multi_sort' AS variant, o_orderkey, o_orderpriority AS prio, "
        "o_totalprice FROM ("
        "SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders "
        "ORDER BY o_orderpriority ASC, o_totalprice DESC, o_orderkey LIMIT 30) q2",
        "SELECT 'topk_page' AS variant, o_orderkey, "
        "CAST(NULL AS VARCHAR) AS prio, o_totalprice FROM ("
        "SELECT o_orderkey, o_totalprice FROM orders "
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 20 OFFSET 40) q1 "
        "UNION ALL "
        "SELECT 'multi_sort' AS variant, o_orderkey, o_orderpriority AS prio, "
        "o_totalprice FROM ("
        "SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders "
        "ORDER BY o_orderpriority ASC, o_totalprice DESC, o_orderkey LIMIT 30) q2",
    ),
    # --- training-data ops: dedup + deterministic split ---
    # exact content-hash dedup UNION the hash-based train/val/test split
    # (operators/sampling.py); the split oracle replicates Spark's
    # xxhash64(BIGINT) in DuckDB SQL (xxh64_long8_stages)
    "dedup_exact_hash": (_dedup_exact_and_split, _dedup_exact_and_split_duck()),
    "dedup_ngram_jaccard": (_dedup_jaccard, _DUCK_JACCARD),
    # xxhash64 sketch family (MinHash/LSH pairs + SimHash + fingerprint
    # signatures): oracle-backed since r4 — XXH64 itself is compiled to
    # DuckDB SQL (functions/xxh64_sql.py + minhash_sql.py), removing the
    # "no DuckDB analog" gap
    "dedup_minhash_variants": (_dedup_minhash_variants, _dedup_minhash_duck),
    # --- training-data ops: similarity search ---
    "embed_cosine_topk": (_embed_topk, _DUCK_TOPK),
    "embed_neardup_pairs": (_embed_neardup, _embed_neardup_duck()),
    # oracle-backed since r5: the DuckDB side replays every ANN index
    # (bit-exact folds; generator-recomputed probe/codebook literals) and
    # the recall@10 rows give the driver-visible recall evidence
    "embed_ann_variants": (_embed_ann_variants, _embed_ann_variants_duck),
    # --- training-data ops: text analysis ---
    # long-normalized panel metrics + the unigram-NLL corpus-LM quality
    # proxy (real operator, AQE-chosen vocab join) in one entry
    "text_quality_stats": (_text_quality_stats_spark, _text_quality_stats_duck()),
    "text_language_id": (_lang_id_spark, _lang_id_query_sql("duck")),
    # --- multimodal (binary payload + typed metadata; codec pluggable) ---
    # golden-replay oracle since r5 (see _multimodal_profile_duck's
    # docstring for exactly what the row does and does not certify)
    "multimodal_profile": (_multimodal_profile, _multimodal_profile_duck),
    # deterministic half (resize planning over typed meta): oracle-backed
    # deterministic planning half (resize rule + PDF/layout-parse leg:
    # reading order + running header/footer removal): oracle-backed
    "multimodal_resize_plan": (_multimodal_resize_plan, _resize_layout_duck()),
}


def build_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, (impl, _) in REGISTRY.items():
        out[name] = _sql_query(impl) if isinstance(impl, str) else impl
    return out


_ORACLE_CACHE: dict[str, dict[str, str]] = {}


def build_oracle_sql() -> dict[str, str]:
    # cached per ENTRY_TEST_SF_DIR: the generator-backed oracles (ANN
    # replay, flagship twin, media golden replay) do real work — parquet
    # reads, numpy recompute, WAV decode — and parametrized test suites
    # call oracle_sql() per test; the cache key is the one input the
    # generators read (review r5)
    import os

    key = os.environ.get("ENTRY_TEST_SF_DIR", "/root/testdata/sf0.01")
    cached = _ORACLE_CACHE.get(key)
    if cached is not None:
        return dict(cached)
    out: dict[str, str] = {}
    for name, (impl, oracle) in REGISTRY.items():
        if oracle is None:
            continue
        if callable(oracle):
            # lazily-built oracles (they materialize the cached synthetic
            # corpus paths they embed) — resolved here, NOT at import, so
            # importing the module stays free of filesystem side effects
            oracle = oracle()
        out[name] = impl if oracle == "same" else oracle
    _ORACLE_CACHE[key] = out
    return dict(out)
