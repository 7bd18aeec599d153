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
