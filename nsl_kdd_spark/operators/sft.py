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


def preference_pairs(
    responses: DataFrame,
    prompt_col: str,
    response_col: str,
    score_col: str,
    id_col: str,
    strategy: str = "best_worst",
    min_margin: int = 1,
) -> DataFrame:
    """Assemble (chosen, rejected) preference pairs from a scored
    response table — the DPO / reward-model data-prep step (Rafailov
    et al. 2023 "Direct Preference Optimization"; the InstructGPT
    comparison-collection shape): per prompt, responses with higher
    preference scores become ``chosen`` against lower-scored
    ``rejected`` ones.

    ``strategy="best_worst"`` (default) emits ONE pair per prompt —
    the top-scored vs the bottom-scored response (the max-margin pair
    most pipelines train on); ``strategy="all_pairs"`` emits every
    ordered pair whose score gap is >= ``min_margin`` (the full
    comparison matrix the reward-model literature uses). Prompts
    whose best-worst gap is under ``min_margin`` (e.g. a single
    response, or all-tied scores) emit nothing — a tie teaches the
    model nothing and the published setups drop them.

    Ties on score break by LOWEST ``id_col`` on both sides, so the
    pair set is a pure function of the table (engine-replayable).
    Scores should be integers (the engine's fixed-point doctrine) —
    float scores make "equal" engine-dependent. NULL-scored
    responses are EXCLUDED up front (an unscored response can be
    neither chosen nor rejected): without the filter, min_by's
    struct ordering would sort a NULL score field FIRST and silently
    crown the unscored row ``rejected`` — diverging from the SQL
    twin's NULLS LAST (advice r11). The filter is documented
    contract; the DuckDB oracle carries the same predicate.
    ``min_margin`` must be >= 1: at 0 ``all_pairs`` would emit
    self-pairs and both orders of every tie — rows that teach a
    DPO trainer nothing (verdict r11).

    Output: ``(prompt_col, chosen_id, chosen, chosen_score,
    rejected_id, rejected, rejected_score, margin)``.

    Scale shape: ``best_worst`` is ONE map-side-combined aggregate —
    two ``max_by/min_by`` over a (score, id) ordering struct, no
    window, no join, group state O(1) however many responses a
    prompt has. ``all_pairs`` is a self-equi-join on the prompt key
    (bounded groups: responses-per-prompt is collection-bounded, so
    the pair fan-out is quadratic only in that small constant).
    """
    if strategy not in ("best_worst", "all_pairs"):
        raise ValueError(
            f"strategy must be best_worst|all_pairs, got {strategy!r}"
        )
    if min_margin < 1:
        raise ValueError(
            f"min_margin must be >= 1 (0 admits self-pairs and tie"
            f" pairs with nothing to prefer), got {min_margin}"
        )
    # the best_worst tie-break negates the id inside an ordering
    # struct; on a non-numeric id Spark would cast to double -> NULL
    # and pick an arbitrary row per execution (review r11) — refuse
    # loudly instead
    id_type = responses.schema[id_col].dataType.typeName()
    if id_type not in (
        "byte", "short", "integer", "long", "float", "double", "decimal"
    ):
        raise ValueError(
            f"id_col must be numeric for the deterministic tie-break,"
            f" got {id_type}"
        )
    # documented contract (see docstring): unscored responses are out
    # of the preference relation entirely
    responses = responses.filter(F.col(score_col).isNotNull())
    if strategy == "all_pairs":
        a = responses.select(
            F.col(prompt_col),
            F.col(id_col).alias("chosen_id"),
            F.col(response_col).alias("chosen"),
            F.col(score_col).alias("chosen_score"),
        )
        b = responses.select(
            F.col(prompt_col),
            F.col(id_col).alias("rejected_id"),
            F.col(response_col).alias("rejected"),
            F.col(score_col).alias("rejected_score"),
        )
        return (
            a.join(b, prompt_col)
            .filter(
                F.col("chosen_score") - F.col("rejected_score")
                >= F.lit(min_margin)
            )
            .withColumn(
                "margin", F.col("chosen_score") - F.col("rejected_score")
            )
        )
    # best_worst: max_by/min_by over a (score, tie-break) struct.
    # Tie-break is LOWEST id on both sides: the chosen ordering
    # negates the id (bigger struct = higher score, then smaller id),
    # the rejected ordering keeps it (smaller struct = lower score,
    # then smaller id).
    chosen_ord = F.struct(
        F.col(score_col).alias("s"), (-F.col(id_col)).alias("i")
    )
    rejected_ord = F.struct(
        F.col(score_col).alias("s"), F.col(id_col).alias("i")
    )
    row = F.struct(
        F.col(id_col).alias("id"),
        F.col(response_col).alias("resp"),
        F.col(score_col).alias("score"),
    )
    agg = responses.groupBy(prompt_col).agg(
        F.max_by(row, chosen_ord).alias("__c"),
        F.min_by(row, rejected_ord).alias("__r"),
    )
    return (
        agg.select(
            prompt_col,
            F.col("__c.id").alias("chosen_id"),
            F.col("__c.resp").alias("chosen"),
            F.col("__c.score").alias("chosen_score"),
            F.col("__r.id").alias("rejected_id"),
            F.col("__r.resp").alias("rejected"),
            F.col("__r.score").alias("rejected_score"),
        )
        .withColumn(
            "margin", F.col("chosen_score") - F.col("rejected_score")
        )
        .filter(F.col("margin") >= F.lit(min_margin))
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
