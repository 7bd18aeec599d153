"""SFT training-example rendering: conversation → one training sequence
with loss-mask character spans.

The last mile of a transcript pipeline: after extraction/curation, a
fine-tuning job needs each conversation rendered to a single string
under the STABLE TURN ORDERING (W2 — conv_id / turn_idx / ts, the same
ordering contract as the flagship, `chat.ts` ordering semantics) with
the byte ranges a trainer computes loss on (the assistant payloads;
everything else — role headers, user/tool turns — is context only).

Template: each turn renders as ``<|role|>\\n{text}\\n``; turns concat in
order with no extra separator, so every offset is a pure prefix-sum of
rendered lengths — exact integer arithmetic end-to-end, no tokenizer
dependency (char spans; a tokenizer maps them to token masks
downstream).  Masked span = exactly the turn's text payload (header and
trailing newline excluded).

Shape: one window (prefix-sum offsets) + one groupBy on the same key —
the planner reuses the window's hash partitioning, so it is ONE shuffle
on conv_id; per-conv state is the conversation itself.  The sort key
appends the rendered string after (turn_idx, ts) so ordering remains
total even on pathological duplicate-(turn_idx, ts) rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def render_sft_examples(
    df: DataFrame,
    conv_col: str = "conv_id",
    text_col: str = "text",
    role_col: str = "role",
    order_cols: tuple[str, ...] = ("turn_idx", "ts"),
    mask_roles: tuple[str, ...] = ("assistant",),
) -> DataFrame:
    """(conv, text, n_turns, n_chars, n_mask_chars, mask_spans) — one
    row per conversation; ``mask_spans`` is an ordered
    array<struct<begin,end>> of 0-based [begin, end) character ranges
    over ``text`` covering each masked-role turn's payload."""
    if not mask_roles:
        raise ValueError("render_sft_examples: mask_roles must be non-empty")
    role = F.col(role_col)
    txt = F.coalesce(F.col(text_col), F.lit(""))
    rendered = F.concat(
        F.lit("<|"), role, F.lit("|>\n"), txt, F.lit("\n")
    )
    order_exprs = [F.col(c) for c in order_cols] + [F.col("__rendered")]
    w = (
        Window.partitionBy("conv")
        .orderBy(*order_exprs)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    turns = df.select(
        F.col(conv_col).alias("conv"),
        *[F.col(c) for c in order_cols],
        rendered.alias("__rendered"),
        # header = "<|" + role + "|>\n" → len(role) + 5
        (F.length(role) + F.lit(5)).alias("__hdr"),
        F.length(txt).alias("__txt_len"),
        role.isin(list(mask_roles)).alias("__is_mask"),
    ).withColumn(
        "__off",
        F.coalesce(F.sum(F.length("__rendered")).over(w), F.lit(0)),
    )
    begin = (F.col("__off") + F.col("__hdr")).cast("long")
    span = F.when(
        F.col("__is_mask"),
        F.struct(
            *[F.col(c) for c in order_cols],
            begin.alias("begin"),
            (begin + F.col("__txt_len")).alias("end"),
        ),
    )
    return (
        turns.withColumn("__span", span)
        .groupBy("conv")
        .agg(
            F.array_join(
                F.expr("transform(sort_array(collect_list(struct("
                       + ", ".join(order_cols)
                       + ", __rendered))), x -> x.__rendered)"),
                "",
            ).alias("text"),
            F.count(F.lit(1)).cast("long").alias("n_turns"),
            F.sum(F.length("__rendered")).cast("long").alias("n_chars"),
            F.coalesce(
                F.sum(F.when(F.col("__is_mask"), F.col("__txt_len"))),
                F.lit(0),
            ).cast("long").alias("n_mask_chars"),
            F.expr(
                "transform(sort_array(collect_list(__span)), "
                "x -> struct(x.begin AS begin, x.end AS end))"
            ).alias("mask_spans"),
        )
    )
