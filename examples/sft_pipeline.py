"""End-to-end post-training (SFT / RLHF) data assembly with the
round-11/12 tier composed in one file:

    scored candidate responses
    -> best-of-n rejection sampling (Bai et al. 2022 / ReST, r12)
    -> DPO preference pairs from the same pool (Rafailov et al.,
       r11)
    -> chat-template rendering with completion-only loss spans
       (TRL collator contract, r11)
    -> Krell SPFHP whole-conversation packing (r11)
    -> pack-relative loss-span rebasing + pack text assembly (r12)
    -> BPE-token loss spans for the collator (r13)
    -> branched-tree flattening + exactly-once shared-prefix loss
       (OpenAssistant convention, r12/r13)
    -> epoch budgeting for the next pretrain-mix iteration
       (Muennighoff et al. 2023, r12)

    python examples/sft_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F  # noqa: E402

from nsl_kdd_spark.operators.corpus import (  # noqa: E402
    epoch_budget_report,
)
from nsl_kdd_spark.operators.packing import pack_best_fit  # noqa: E402
from nsl_kdd_spark.operators.sft import (  # noqa: E402
    assemble_pack_text,
    best_of_n,
    char_spans_to_bpe_token_spans,
    dedup_shared_prefix_loss,
    flatten_message_tree,
    pack_conversations,
    preference_pairs,
    render_chat_spans,
)
from nsl_kdd_spark.session import get_session  # noqa: E402
from nsl_kdd_spark.sources.parquet import load_tables  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_session(app_name="sft-pipeline", master="local[8]",
                        shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    t = load_tables(spark, sf_dir)

    # events stand in for a scored response pool: user_id = prompt,
    # value = reward-model score (integer fixed-point)
    scored = t.events.select(
        F.col("user_id").alias("prompt_id"),
        "event_id",
        "ts",
        F.concat_ws(
            " ", "event_type", F.coalesce("props", F.lit(""))
        ).alias("resp"),
        F.floor(F.col("value") * 100).cast("long").alias("score"),
    )

    # 1. rejection sampling: top-3 responses >= floor feed the next
    #    SFT iteration
    kept = best_of_n(
        scored, "prompt_id", "resp", "score", "event_id",
        n=3, score_floor=40,
    )
    print(f"best-of-n kept {kept.count()} responses")

    # 2. the same pool yields DPO pairs for the reward/DPO stage
    pairs = preference_pairs(
        scored, "prompt_id", "resp", "score", "event_id"
    )
    print(f"preference pairs: {pairs.count()} prompts with a margin")

    # 3. render conversations (events grouped by user) through the
    #    chat template with completion-only loss spans
    turns = t.events.select(
        F.col("user_id").alias("conv_id"),
        "event_id",
        "ts",
        F.when(F.col("event_type").isin("click", "view"), "user")
        .when(F.col("event_type") == "error", "system")
        .otherwise("assistant")
        .alias("role"),
        F.concat_ws(
            " ", "event_type", F.coalesce("props", F.lit(""))
        ).alias("content"),
    )
    spans = render_chat_spans(
        turns, "conv_id", ["ts", "event_id"]
    ).persist()  # two consumers below: sizes + the packed join-back

    # 4. Krell SPFHP packing on conversation char lengths, then
    #    rebase every loss span to pack-relative offsets
    sizes = spans.groupBy("conv_id").agg(
        F.max("seg_end").cast("long").alias("conv_chars")
    )
    packs = pack_best_fit(sizes, "conv_chars", "conv_id", budget=8000)
    packed = pack_conversations(spans, packs, "conv_id").persist()
    texts = assemble_pack_text(packed, "conv_id")
    n_packs = texts.count()
    ok = packed.join(
        texts.select("pack_id", "pack_text"), "pack_id"
    ).agg(
        F.count_if(
            F.col("is_loss")
            & (
                F.expr(
                    "substring(pack_text, CAST(pack_loss_start AS INT),"
                    " CAST(pack_loss_end - pack_loss_start + 1 AS INT))"
                )
                != F.col("content")
            )
        ).alias("bad")
    ).collect()[0]["bad"]
    print(f"packed into {n_packs} packs; loss-span violations: {ok}")

    # 5. collators mask BPE TOKEN positions: convert the rebased
    #    char spans to indices over each pack's BPE piece sequence
    merges = spark.createDataFrame(
        [(0, "e", "r"), (1, "t", "h"), (2, "th", "e")],
        "rank int, left string, right string",
    )
    tok_spans = char_spans_to_bpe_token_spans(
        packed.filter(F.col("is_loss")).join(
            texts.select("pack_id", "pack_text"), "pack_id"
        ),
        merges, "pack_id", "pack_text",
        "pack_loss_start", "pack_loss_end",
    )
    n_tok_spans = tok_spans.filter(
        F.col("bpe_tok_start").isNotNull()
    ).count()
    print(f"BPE-maskable loss spans: {n_tok_spans}")
    spans.unpersist()
    packed.unpersist()

    # 6. branched chat exports (regenerations/edits): flatten to one
    #    conversation per leaf, then make each shared ancestor turn
    #    loss-bearing in exactly ONE path
    from pyspark.sql import Window as w

    ranked = t.events.select("user_id", "event_id", "ts").withColumn(
        "rk",
        F.row_number().over(
            w.partitionBy("user_id").orderBy("ts", "event_id")
        ),
    )
    parents = ranked.select(
        F.col("user_id").alias("__u"),
        F.col("event_id").alias("parent_id"),
        F.col("rk").alias("__prk"),
    )
    tree = ranked.join(
        parents,
        (F.col("user_id") == F.col("__u"))
        & (F.col("__prk") == F.floor(F.col("rk") / 2)),
        "left",
    ).select("user_id", "event_id", "parent_id")
    flat = flatten_message_tree(tree, "event_id", "parent_id",
                                max_depth=16)
    owned = dedup_shared_prefix_loss(flat, "event_id")
    once = (
        owned.groupBy("event_id")
        .agg(F.sum(F.col("loss_owner").cast("int")).alias("n"))
        .filter(F.col("n") != 1)
        .count()
    )
    print(f"messages not exactly-once loss-owned: {once}")

    # 7. next-iteration pretrain mix: how much is each language's
    #    allocation really worth after repetition decay?
    docs = t.documents.withColumn(
        "n_tok", F.size(F.split("text", " ")).cast("long")
    )
    report = epoch_budget_report(
        docs, "lang", budget=200_000, alpha=0.25,
        weight_col="n_tok", max_epochs_ppm=4_000_000,
    )
    report.show(truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
