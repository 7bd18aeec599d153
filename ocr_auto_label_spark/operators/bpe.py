"""Distributed BPE tokenizer training (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units" §3.2).

The classic algorithm: start from characters, repeatedly merge the most
frequent adjacent symbol pair.  Training data for the pair statistics is
the DISTINCT-WORD vocabulary weighted by word frequency — the same
distinct-value compression every heavy operator here uses (a 100 TB
corpus has ~10⁷–10⁸ distinct words, not 10¹²; all pair counting happens
on that vocabulary table, never on the token stream).

Representation trick that keeps BOTH engines (Spark and the DuckDB
oracle) on identical, trivially-deterministic code: a word's symbol
sequence is a STRING — symbols joined by two spaces, padded with one
space on each end (symbols never contain whitespace, by tokenization).
One merge step is then a single literal ``replace(seq, ' a  b ', ' ab ')``:
`replace` scans left-to-right non-overlapping in Spark (Java
``String.replace``), DuckDB, and Python alike, which is EXACTLY the
greedy BPE merge semantics including the ``a a a → (aa) a`` case, and
the one-vs-two-space framing makes cross-symbol-boundary false matches
impossible ('xa b' does not contain ' a  b ').

Each training step is one map-side-combined pair-count aggregate over
the vocabulary plus a SINGLE-ROW driver pull (the argmax pair — the
bounded-pull pattern of connected_components/IVF); ties break by
(count DESC, a ASC, b ASC), a total order, so training is bit-
reproducible at any parallelism and replayable as a static chained-CTE
SQL oracle.  The training loop re-checkpoints the vocabulary every 25
merges so the replace-chain lineage stays bounded at any ``n_merges``
(same pattern as the CC pointer-jumping loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ocr_auto_label_spark.operators.textstats import word_tokens


def _q(s: str) -> str:
    """Escape a symbol for embedding in a single-quoted Spark SQL
    literal.  Backslashes FIRST: Spark string literals process escape
    sequences, so an unescaped '\\' would corrupt the merge pattern
    (silently un-merging the real pair and potentially merging an
    unrelated one) on corpora with code/paths/LaTeX tokens."""
    return s.replace("\\", "\\\\").replace("'", "''")


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt) over the corpus — the weighted training vocabulary."""
    toks = F.filter(word_tokens(F.col(text_col)), lambda w: w != F.lit(""))
    return (
        df.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


_INIT_SEQ = (
    "concat(' ', array_join(transform(sequence(1, length(word)), "
    "i -> substr(word, i, 1)), '  '), ' ')"
)
# split back to symbols: trim the outer pad, split on the 2-space joiner
_SYMS = "split(trim(seq), '  ')"


def _pair_counts(words: DataFrame) -> DataFrame:
    """(a, b, total): adjacent-symbol pair frequencies, weighted by word
    count.  The sequence(1, n-1) is guarded — Spark's sequence DESCENDS
    when start > stop instead of being empty."""
    pairs = F.expr(
        f"CASE WHEN size({_SYMS}) >= 2 THEN "
        f"transform(sequence(1, size({_SYMS}) - 1), "
        f"i -> struct(element_at({_SYMS}, i) AS a, "
        f"element_at({_SYMS}, i + 1) AS b)) "
        "ELSE array() END"
    )
    return (
        words.select("cnt", F.explode(pairs).alias("p"))
        .groupBy("p.a", "p.b")
        .agg(F.sum("cnt").alias("total"))
    )


def bpe_train(
    df: DataFrame, n_merges: int, text_col: str = "text"
) -> tuple[list[dict], DataFrame]:
    """Train ``n_merges`` BPE merges on ``df[text_col]``.

    Returns ``(merges, words)``: ``merges`` is the ordered merge table
    (step, a, b, merged, total — one bounded driver row per step), and
    ``words`` is the vocabulary frame (word, cnt, seq) with ``seq``
    holding each word's FINAL symbol sequence (two-space joined, padded)
    — the segmenter state that :func:`bpe_segment_counts` and any
    encoder join against.  Raises if the corpus runs out of mergeable
    pairs before ``n_merges`` (pick n_merges well under capacity; the
    SQL oracle replays a fixed-length chain)."""
    if n_merges < 1:
        raise ValueError("bpe_train: n_merges must be >= 1")
    words = word_frequencies(df, text_col).withColumn(
        "seq", F.expr(_INIT_SEQ)
    )
    # materialize the vocabulary once — it is the distinct-word table
    # (bounded by Zipf, not corpus size), and every merge step would
    # otherwise re-scan the corpus through the groupBy lineage
    words = words.localCheckpoint(eager=True)
    merges: list[dict] = []
    for step in range(n_merges):
        top = (
            _pair_counts(words)
            .orderBy(F.desc("total"), F.asc("a"), F.asc("b"))
            .first()
        )
        if top is None:
            raise ValueError(
                f"bpe_train: no adjacent pairs left at step {step} — "
                "n_merges exceeds the corpus's merge capacity"
            )
        a, b, merged = top.a, top.b, top.a + top.b
        merges.append(
            {
                "step": step,
                "a": a,
                "b": b,
                "merged": merged,
                "total": int(top.total),
            }
        )
        words = words.withColumn(
            "seq",
            F.expr(
                f"replace(seq, ' {_q(a)}  {_q(b)} ', ' {_q(merged)} ')"
            ),
        )
        if (step + 1) % 25 == 0:
            # bound the replace-chain lineage: each step's pair count
            # re-evaluates the chain, so an unbounded chain is O(steps²)
            # and eventually trips codegen/analyzer depth limits
            words = words.localCheckpoint(eager=True)
    return merges, words


def bpe_vocab(words: DataFrame) -> DataFrame:
    """(symbol, total) — occurrence-weighted counts of the final symbol
    inventory (chars + merged units)."""
    return (
        words.select(
            "cnt", F.explode(F.expr(_SYMS)).alias("symbol")
        )
        .groupBy("symbol")
        .agg(F.sum("cnt").alias("total"))
    )


def bpe_segment_counts(
    df: DataFrame,
    words: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_symbols, n_words) — per-document token counts AFTER the
    trained merges (the compression the tokenizer buys).  One explode +
    one word-keyed equi-join against the vocabulary's per-word symbol
    count (AQE broadcast-or-shuffle; every corpus word is in the
    vocabulary by construction)."""
    toks = F.filter(word_tokens(F.col(text_col)), lambda w: w != F.lit(""))
    per_word = words.select(
        "word", F.size(F.expr(_SYMS)).alias("n_sym")
    )
    return (
        df.select(F.col(id_col).alias("id"), F.explode(toks).alias("word"))
        .join(per_word, "word")
        .groupBy("id")
        .agg(
            F.sum("n_sym").cast("long").alias("n_symbols"),
            F.count(F.lit(1)).alias("n_words"),
        )
    )
