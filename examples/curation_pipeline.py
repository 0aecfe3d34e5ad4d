"""End-to-end corpus curation with the round-8 tier composed in one
file:

    winnowing fingerprints (Schleimer et al. local fingerprints)
    -> MOSS-style overlap pairs (shared-fingerprint equi-join)
    -> connected components -> longest-copy canonical selection
    -> exact-substring span strip (Lee et al. 2022 ExactSubstr, r9)
    -> linear quality-classifier gate (fastText-style inference, r10)
    -> DSIR importance resampling toward a target domain (r11)
    -> Bloom-gated benchmark decontamination (two-phase, exact)
    -> Bloom semi-join reduction (generic runtime-filter primitive)
    -> hard-negative mining for contrastive embedding training
    -> temperature-balanced language mix + FIM serialization (r10)
    -> T5/UL2 span-corruption twin + n-gram diversity monitor (r11)
    -> SPFHP histogram packing into fixed token budgets (r11)

    python examples/curation_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F  # noqa: E402

from nsl_kdd_spark.operators.bloom import bloom_semi_join  # noqa: E402
from nsl_kdd_spark.operators.decontam import (  # noqa: E402
    build_gram_bloom,
    decontaminate_bloom,
)
from nsl_kdd_spark.operators.corpus import (  # noqa: E402
    fim_transform,
    select_canonical,
    span_corruption_transform,
    temperature_mixture,
)
from nsl_kdd_spark.operators.packing import pack_best_fit  # noqa: E402
from nsl_kdd_spark.ml.text_features import (  # noqa: E402
    ngram_diversity_report,
)
from nsl_kdd_spark.operators.graph import connected_components  # noqa: E402
from nsl_kdd_spark.operators.similarity import (  # noqa: E402
    mine_hard_negatives,
)
from nsl_kdd_spark.operators.substr_dedup import (  # noqa: E402
    strip_duplicate_spans,
)
from nsl_kdd_spark.operators.winnow import (  # noqa: E402
    winnow_fingerprints,
    winnow_overlap_pairs,
)
from nsl_kdd_spark.ml.dsir import (  # noqa: E402
    dsir_select,
    dsir_weights,
)
from nsl_kdd_spark.ml.linear_text import (  # noqa: E402
    classify_text,
    demo_weights,
)
from nsl_kdd_spark.session import get_session  # noqa: E402
from nsl_kdd_spark.sources.parquet import load_tables  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_session(app_name="curation-pipeline", master="local[8]",
                        shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    t = load_tables(spark, sf_dir)

    print("== winnowed fingerprints (density ~2/(w+1) of k-grams) ==")
    fps = winnow_fingerprints(t.documents, "doc_id", "text", k=4, w=4)
    print(f"selected fingerprints: {fps.count()}")

    print("== near-dup clusters from shared fingerprints ==")
    pairs = winnow_overlap_pairs(
        t.documents, "doc_id", "text", k=4, w=4, min_shared=2, max_fp_df=50
    )
    comps = connected_components(pairs)
    survivors = select_canonical(
        t.documents, comps, score=F.size(F.split("text", " "))
    )
    n_docs, n_surv = t.documents.count(), survivors.count()
    print(f"docs: {n_docs} -> canonical survivors: {n_surv} "
          f"({n_docs - n_surv} near-dup copies dropped)")

    print("== exact-substring strip (duplicated >= 5-token runs) ==")
    # canonical selection above already removed whole-document
    # copies, so the runs left for ExactSubstr are the short
    # boilerplate repeats document-level dedup cannot see — hence a
    # tighter L here than the q152/q153 default of 8
    # persist: three actions below (agg, join, count) would otherwise
    # each re-run the full gram-hash + window lineage (round-9 review)
    stripped = strip_duplicate_spans(
        survivors, "doc_id", "text", min_tokens=5, keep="first"
    ).persist()
    removed = stripped.agg(F.sum("removed_tokens")).first()[0] or 0
    # rebuild with ONLY (doc_id, text): letting removed_tokens ride
    # along would leak a curation-internal column into every
    # downstream stage's corpus (round-10 advisory)
    survivors = (
        survivors.drop("text")
        .join(
            stripped.filter(F.length("text_clean") > 0)
            .select("doc_id", F.col("text_clean").alias("text")),
            "doc_id",
        )
        .persist()
    )
    print(f"duplicated-span tokens removed: {removed}; "
          f"docs remaining non-empty: {survivors.count()}")
    # survivors is materialized above, so the stripped cache has no
    # remaining consumer (downstream lineages read the survivors
    # cache, not the gram-hash pipeline)
    stripped.unpersist()

    print("== quality gate: linear classifier inference (r10) ==")
    # a real pipeline loads an exported fastText model table here;
    # the demo fixture has the same shapes/dtypes
    weights, biases = demo_weights(
        spark, ("keep", "toss"), n_buckets=4096, seed=7
    )
    pred = classify_text(
        survivors, "doc_id", "text", weights, biases, n_buckets=4096
    )
    kept = pred.filter(F.col("label") == "keep").select("doc_id")
    n_before = survivors.count()
    # persist the POST-classifier frame — it is what every downstream
    # stage (decontam, bloom demo, mixture) actually consumes; the
    # pre-classifier cache is superseded once this materializes
    # (round-10 advisory: the unpersisted reassignment re-ran the
    # classifier join in all four downstream actions)
    pre_classifier = survivors
    survivors = survivors.join(kept, "doc_id").persist()
    print(f"classifier keep-rate: {survivors.count()}/{n_before}")
    pre_classifier.unpersist()

    print("== DSIR: importance-resample toward a target domain (r11) ==")
    # the published position (Xie et al. 2023): between the quality
    # gate and mixing — pull domain-relevant docs out of the pool;
    # the en slice stands in for a curated domain sample
    domain = t.documents.filter(F.col("lang") == "en")
    dw, db = dsir_weights(
        domain, survivors, "text", word_ngrams=2, n_buckets=4096
    )
    n_pool = survivors.count()
    selected = dsir_select(
        survivors, "doc_id", "text", dw, db,
        tau_u=-10_000_000, n_buckets=4096, keep_score=False,
    ).persist()
    print(f"DSIR kept {selected.count()}/{n_pool} "
          f"(log-space hash acceptance, deterministic)")
    survivors.unpersist()
    survivors = selected

    print("== Bloom-gated decontamination (exact, two-phase) ==")
    corpus = survivors.filter(F.col("doc_id") % 41 != 0)
    bench = t.documents.filter(F.col("doc_id") % 41 == 0)
    bloom = build_gram_bloom(bench, "text", n=3, fpp=0.01)
    print(f"benchmark grams: {bloom.n_items}, bitmap: {bloom.n_bytes} B "
          f"(vs ~{bloom.n_items * 8} B broadcast index)")
    clean = decontaminate_bloom(
        corpus, bench, "doc_id", "text", "text", n=3, min_hits=2,
        bloom=bloom,
    )
    print(f"corpus: {corpus.count()} -> decontaminated: {clean.count()}")

    print("== Bloom semi-join: lineitems of high-value orders ==")
    hot = t.orders.filter(F.col("o_totalprice") > 450_000)
    reduced = bloom_semi_join(
        t.lineitem, hot, on="l_orderkey", small_on="o_orderkey"
    )
    print(f"fact rows kept map-side: {reduced.count()} "
          f"of {t.lineitem.count()}")

    print("== hard negatives for contrastive training ==")
    queries = t.embeddings.filter(F.col("vec_id") < 3)
    positives = t.embeddings.select(
        (F.col("vec_id") % 10).alias("query_id"), "vec_id"
    ).filter(F.col("query_id") < 3)
    mine_hard_negatives(t.embeddings, queries, positives, k=5).show(15)

    print("== assemble the training mix (r10 tail) ==")
    # alpha-balance the languages of the decontaminated survivors
    # (upsampling = training epochs), then apply rate-gated FIM for
    # the code/infilling objective
    # persist: four actions below would otherwise re-run the whole
    # decontam + classifier + mixture lineage each time (the same
    # rule as the retrieval_eval example, round-9 verdict)
    mixed = temperature_mixture(
        clean, "lang", "doc_id", alpha=0.5
    ).persist()
    per_lang = {
        r.lang: r["count"]
        for r in mixed.groupBy("lang").count().collect()
    }
    print(f"alpha-balanced mix by lang: {per_lang}")
    # FIM keys on (doc_id, epoch) so each upsampled copy draws its
    # own split points (epoch copies exist to be distinguishable),
    # and on its own salt so the FIM gate is independent of the
    # mixture's remainder-set buckets (round-10 review: sharing the
    # default '' salt correlated the two samplers — remainder
    # -upsampled docs would have been FIM'd at ~100%, not rate)
    fim = fim_transform(
        mixed.withColumn(
            "fim_key", F.concat_ws(":", "doc_id", "epoch")
        ),
        "fim_key", "text", rate=0.5, salt="fim",
    ).drop("fim_key")
    n_fim = fim.filter("fim_applied").count()
    print(f"FIM applied to {n_fim}/{mixed.count()} rows")
    fim.filter("fim_applied").select("doc_id", "epoch", "text_fim").show(
        3, truncate=62
    )

    # the masked-denoising twin of FIM: the same mixed corpus
    # serialized for a T5/UL2-style objective (rate/span_len are the
    # R-denoiser point); same per-epoch key + independent salt rules
    corrupted = span_corruption_transform(
        mixed.withColumn(
            "sc_key", F.concat_ws(":", "doc_id", "epoch")
        ),
        "sc_key", "text", rate=0.15, span_len=3, salt="sc",
    ).drop("sc_key")
    n_masked = corrupted.filter("n_spans > 0").count()
    print(f"span corruption masked spans in {n_masked} rows")

    # corpus health monitor before packing: distinct-n + hapax ppm
    # (mode-collapse / template-flood watch, Li et al. 2016)
    ngram_diversity_report(mixed, "text", ns=(1, 2)).show()

    # SPFHP packing (Krell et al. 2021): whole-doc bins under a
    # fixed token budget — the histogram solve runs on counts, the
    # assignment is pure arithmetic, so the stage is deterministic
    # under any partitioning
    packed = pack_best_fit(
        mixed.withColumn(
            "n_tokens", F.size(F.split("text", " "))
        ).withColumn(
            # epoch copies are distinct documents to the packer; any
            # unique long works as the rank tie-break key (epochs are
            # small, so the composite stays collision-free)
            "pack_key", F.col("doc_id") * 10000 + F.col("epoch")
        ),
        "n_tokens", "pack_key", budget=512,
    )
    n_packs = packed.select("pack_id").distinct().count()
    print(f"SPFHP packed {packed.count()} rows into {n_packs} bins")

    # release the long-lived caches before teardown (round-10
    # advisory) — harmless at end-of-script, but the example models
    # a pipeline stage a longer-lived session would embed
    mixed.unpersist()
    survivors.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
