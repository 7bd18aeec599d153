"""Inverted index + boolean search over a document corpus.

The reference's contains-search (F5, ``images.ts:143-149``) scans every
row's strings per query; that is fine for 5 000 photos and wrong for
10¹² documents.  The corpus-scale shape is an INVERTED INDEX — term →
(df, sorted posting list) — built once, and term-exact queries answered
by posting-list intersection without touching the text again.  This
module is that pair of operators, both pure relational:

- :func:`build_inverted_index`: one (doc, term)-distinct aggregate (the
  explode carries each doc's DISTINCT terms once) and one term-keyed
  aggregate; posting lists are ``sort_array``-pinned so the index is
  byte-deterministic under any partitioning.  On a real deployment the
  index is written ``partitionBy`` of a term prefix/hash bucket so a
  query prunes to its terms' partitions (the IVF-index pattern,
  ``similarity.py:ivf_write_index``); the in-plan form here composes
  with that write unchanged.
- :func:`boolean_search`: AND-semantics over the index — explode the
  query terms' postings, count per doc, keep docs hit by ALL terms.
  Work is O(Σ posting lengths of the query terms), never a corpus scan;
  hot stopword-grade terms are the caller's to exclude (their postings
  are the whole corpus — exactly why search engines drop them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ocr_auto_label_spark.operators.textstats import word_tokens

BM25_K1 = 1.2
BM25_B = 0.75


def build_inverted_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df: int | None = None,
) -> DataFrame:
    """(term, df_cnt, postings) — postings sorted ascending, so the
    index is deterministic and mergeable.

    ``max_df`` is the BUILD-TIME stopword exclusion: a stopword-grade
    term's posting list is the whole corpus's ids in one aggregation
    buffer, so at 10¹²-doc scale the cutoff must happen before the
    posting collect, not at query time.  With ``max_df`` set, a cheap
    df count-aggregate runs first and only terms with ``df <= max_df``
    reach the posting aggregate (the pairs→surviving-terms equi-join is
    AQE-planned).  ``None`` skips the extra pass — fine for bounded
    corpora and tests."""
    toks = F.filter(word_tokens(F.col(text_col)), lambda w: w != F.lit(""))
    pairs = (
        df.select(F.col(id_col).alias("id"), F.explode(toks).alias("term"))
        .distinct()
    )
    if max_df is not None:
        if max_df <= 0:
            raise ValueError("build_inverted_index: max_df must be positive")
        keep = (
            pairs.groupBy("term")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") <= max_df)
            .select("term")
        )
        pairs = pairs.join(keep, "term")
    return pairs.groupBy("term").agg(
        F.count(F.lit(1)).alias("df_cnt"),
        F.sort_array(F.collect_list("id")).alias("postings"),
    )


def merge_inverted_index(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two inverted indexes built over DISJOINT document sets:
    per term, df counts add and posting lists concatenate + re-sort —
    so the index can be built incrementally (per partition, per day,
    per ingest batch) and folded together, exactly like the sketches:
    index(A ∪ B) == merge(index(A), index(B)) when A ∩ B = ∅ (the
    caller's contract; overlapping ids would double-count df)."""
    return (
        a.unionByName(b)
        .groupBy("term")
        .agg(
            F.sum("df_cnt").alias("df_cnt"),
            F.sort_array(F.flatten(F.collect_list("postings"))).alias(
                "postings"
            ),
        )
    )


def boolean_search(index: DataFrame, must_terms: list[str]) -> DataFrame:
    """Doc ids containing ALL of ``must_terms`` (AND semantics), by
    posting intersection: explode only the query terms' postings, count
    hits per doc, keep counts == len(must_terms).  Returns (id).

    Terms are lowercased to match the index's ``word_tokens``
    normalization (an un-normalized 'Spark' would otherwise silently
    match nothing); terms that collapse after lowercasing are rejected
    like any other duplicate."""
    must_terms = [t.lower() for t in must_terms]
    if not must_terms:
        raise ValueError("boolean_search: must_terms must be non-empty")
    if len(set(must_terms)) != len(must_terms):
        raise ValueError("boolean_search: must_terms must be distinct")
    hits = (
        index.filter(F.col("term").isin(list(must_terms)))
        .select(F.explode("postings").alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return hits.filter(F.col("n_hit") == len(must_terms)).select("id")


def bm25_search(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = BM25_K1,
    b: float = BM25_B,
    top_k: int | None = None,
) -> DataFrame:
    """Ranked (OR-semantics) retrieval: BM25-family scoring of every doc
    containing ≥1 query term.  Returns (id, dl, score), optionally the
    global top-``top_k`` by (score DESC, id ASC).

    Scoring uses the RATIO form of idf — ``(N - df + 0.5)/(df + 0.5)``
    without the log — times the standard BM25 tf-saturation term.  The
    log is omitted deliberately (same design as tfidf_top_terms): each
    arithmetic step here is a single IEEE-correctly-rounded op on
    identical operands, so the double scores are BIT-IDENTICAL across
    engines and the top-k cut is oracle-safe; ``ln`` is a libm call
    whose ulps differ cross-engine and would flip near-ties.  Per-term
    ordering is unchanged (the map is monotone); only the relative
    weighting of multi-term sums differs from log-idf BM25, which is a
    documented scoring-variant choice, not an approximation.

    Scale shape: one tokenize+explode map pass; doc lengths are a
    map-side-combined count; the per-(doc, query-term) tf aggregation
    touches only rows whose term is in the query (filter BEFORE the
    shuffle); df/avgdl are tiny broadcast frames.  The per-doc score sum
    is a fixed-order chain of per-term columns (conditional-agg pivot),
    never a float SUM whose accumulation order could vary by partition.
    """
    terms = [t.lower() for t in query_terms]
    if not terms:
        raise ValueError("bm25_search: query_terms must be non-empty")
    if len(set(terms)) != len(terms):
        raise ValueError("bm25_search: query_terms must be distinct")
    toks = F.filter(word_tokens(F.col(text_col)), lambda w: w != F.lit(""))
    tok_rows = df.select(
        F.col(id_col).alias("id"), F.explode(toks).alias("term")
    )
    dl = tok_rows.groupBy("id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("tot_dl")
    )
    tf = (
        tok_rows.filter(F.col("term").isin(terms))
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dft = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df_t"))
    # constants are folded in PYTHON and embedded as exact double
    # literals so the oracle generator can embed the very same values
    k1p1, omb = k1 + 1.0, 1.0 - b
    avgdl = F.col("tot_dl").cast("double") / F.col("n_docs").cast("double")
    idf = (
        (F.col("n_docs") - F.col("df_t")).cast("double") + F.lit(0.5)
    ) / (F.col("df_t").cast("double") + F.lit(0.5))
    tf_d = F.col("tf").cast("double")
    sat = (tf_d * F.lit(k1p1)) / (
        tf_d
        + F.lit(k1)
        * (F.lit(omb) + F.lit(b) * (F.col("dl").cast("double") / avgdl))
    )
    scored = (
        tf.join(F.broadcast(dft), "term")
        .join(dl, "id")
        .crossJoin(F.broadcast(stats))  # 1-row stats frame
        .select("id", "dl", "term", (idf * sat).alias("contrib"))
    )
    per_term = scored.groupBy("id", "dl").agg(
        *[
            F.max(F.when(F.col("term") == t, F.col("contrib"))).alias(
                f"__c{i}"
            )
            for i, t in enumerate(terms)
        ]
    )
    score = F.coalesce(F.col("__c0"), F.lit(0.0))
    for i in range(1, len(terms)):  # fixed left-to-right addition order
        score = score + F.coalesce(F.col(f"__c{i}"), F.lit(0.0))
    out = per_term.select("id", "dl", score.alias("score"))
    if top_k is not None:
        if top_k <= 0:
            raise ValueError("bm25_search: top_k must be positive")
        out = out.orderBy(F.col("score").desc(), F.col("id")).limit(top_k)
    return out


def phrase_search(
    df: DataFrame,
    phrase: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact-phrase search via a POSITIONAL index: (id, n_match) for
    every doc where the tokens of ``phrase`` occur consecutively,
    ``n_match`` = number of start positions.

    Shape: posexplode gives (id, pos, term) once; each phrase word's
    postings are filtered from that one pass and shifted to its start
    offset (pos - i), then the words are intersected with equi-joins on
    (id, start) — work is O(Σ postings of the phrase's words), never a
    text rescan, and each join key (id, start) is near-unique so the
    joins stay skew-free even for common words.  Positions are indices
    into the EMPTY-FILTERED token sequence (matching word_tokens
    normalization), 0-based."""
    terms = [t.lower() for t in phrase]
    if len(terms) < 2:
        raise ValueError("phrase_search: phrase needs >= 2 words")
    toks = F.filter(word_tokens(F.col(text_col)), lambda w: w != F.lit(""))
    pos_rows = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(toks).alias("pos", "term"),
    )
    starts = None
    for i, t in enumerate(terms):
        leg = pos_rows.filter(F.col("term") == t).select(
            "id", (F.col("pos") - F.lit(i)).alias("start")
        )
        starts = leg if starts is None else starts.join(leg, ["id", "start"])
    return starts.groupBy("id").agg(F.count(F.lit(1)).alias("n_match"))
