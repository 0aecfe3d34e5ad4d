"""Supervised-fine-tuning (SFT) data assembly.

The instruction-tuning counterpart of the pretraining transforms in
``operators/corpus.py``: turn-level conversation tables are rendered
through a chat template (the ChatML-style ``<|im_start|>role\\n
content<|im_end|>`` convention Hugging Face chat templates and every
open SFT stack serialize) and annotated with LOSS-MASK character
spans — completion-only training (InstructGPT-style SFT; TRL's
``DataCollatorForCompletionOnlyLM`` is the reference consumer)
computes loss ONLY on assistant-response content, so the data
pipeline must ship, for every turn, where its rendered segment lands
in the conversation string and which character range is trainable.

Design notes (Spark-first):
- A conversation is a BOUNDED group (turn counts are capped by the
  context window a trainer packs into), so per-conversation windows
  are the safe doctrine shape — same argument as the per-document
  islands in ``decontam.decontaminate_spans``, and the opposite of
  per-language windows (see ``relational.grouped_rank_bins``).
- Offsets are pure prefix sums of rendered-segment lengths: one
  window with two frames (ROW_NUMBER for the dense turn index, SUM
  over the preceding frame for the character offset) — no self-join,
  no collect, no Python.
- All positions are 1-based character offsets (the substring()
  convention in both Spark and ANSI SQL), so
  ``substring(conv_text, loss_start, loss_end - loss_start + 1) ==
  content`` holds bit-exactly and is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def render_chat_spans(
    turns: DataFrame,
    conv_col: str,
    order_cols: list[str],
    role_col: str = "role",
    content_col: str = "content",
    loss_roles: tuple[str, ...] = ("assistant",),
    turn_prefix: str = "<|im_start|>",
    role_sep: str = "\n",
    turn_suffix: str = "<|im_end|>",
    joiner: str = "\n",
) -> DataFrame:
    """Render each turn through the chat template and compute its
    character span inside the joined conversation string.

    Output: one row per turn with
    ``(conv_col, turn_idx, role, content, segment, seg_start,
    seg_end, is_loss, loss_start, loss_end)`` where ``segment =
    turn_prefix + role + role_sep + content + turn_suffix``, the
    conversation string is ``joiner``-joined segments in ``turn_idx``
    order, spans are 1-based inclusive, and ``loss_start/loss_end``
    bracket exactly the ``content`` substring of loss-role turns
    (null otherwise) — the completion-only mask the SFT collator
    applies.

    Scale shape: ONE per-conversation window (bounded groups) carries
    both the dense turn index and the prefix-sum offset; everything
    else is scan-stage string arithmetic. No join, no Python, no
    collect.
    """
    if not order_cols:
        raise ValueError("order_cols must name at least one column")
    if not loss_roles:
        raise ValueError("loss_roles must name at least one role")
    seg = F.concat(
        F.lit(turn_prefix),
        F.col(role_col),
        F.lit(role_sep),
        F.col(content_col),
        F.lit(turn_suffix),
    )
    w = Window.partitionBy(conv_col).orderBy(
        *[F.col(c) for c in order_cols]
    )
    wsum = w.rowsBetween(Window.unboundedPreceding, -1)
    jlen = len(joiner)
    out = (
        turns.withColumn("segment", seg)
        .withColumn("turn_idx", F.row_number().over(w))
        .withColumn(
            "__prior",
            F.coalesce(
                F.sum(
                    (F.length("segment") + F.lit(jlen)).cast("long")
                ).over(wsum),
                F.lit(0).cast("long"),
            ),
        )
    )
    is_loss = F.col(role_col).isin(*loss_roles)
    # character count of the template head before the content
    head_len = (
        F.length(F.lit(turn_prefix))
        + F.length(F.col(role_col))
        + F.length(F.lit(role_sep))
    ).cast("long")
    loss_start = F.col("__prior") + head_len + 1
    loss_end = loss_start + F.length(F.col(content_col)).cast("long") - 1
    return (
        out.withColumn("seg_start", F.col("__prior") + 1)
        .withColumn(
            "seg_end",
            F.col("__prior") + F.length("segment").cast("long"),
        )
        .withColumn("is_loss", is_loss)
        .withColumn(
            "loss_start", F.when(is_loss, loss_start)
        )
        .withColumn("loss_end", F.when(is_loss, loss_end))
        .drop("__prior")
    )


def assemble_chat_text(
    spans: DataFrame,
    conv_col: str,
    joiner: str = "\n",
    out_col: str = "conv_text",
) -> DataFrame:
    """Join the rendered segments of :func:`render_chat_spans` back
    into one training string per conversation: ``(conv_col, n_turns,
    conv_text)``, segments in ``turn_idx`` order.

    One grouped aggregate; the in-group sort happens JVM-side on the
    collected (turn_idx, segment) structs — conversations are bounded
    groups, so the collect_list state is bounded too (the same
    contract the trainer's own packing step relies on).
    """
    return (
        spans.groupBy(conv_col)
        .agg(
            F.count("*").alias("n_turns"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("turn_idx").alias("i"),
                                F.col("segment").alias("s"),
                            )
                        )
                    ),
                    lambda x: x["s"],
                ),
                joiner,
            ).alias(out_col),
        )
    )
