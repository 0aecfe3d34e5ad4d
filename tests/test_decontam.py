

class TestDecontaminateSpans:
    """Window-level decontamination (round-10;
    decontam.decontaminate_spans — GPT-3 Appendix C's strip-the
    -region remedy). Oracle parity held by q160 + the decontam_spans
    fuzz family; these pin the window expansion, clamping, island
    merge and pass-through semantics on a handcrafted corpus."""

    def _fixture(self, spark):
        corpus = spark.createDataFrame(
            [
                # quote "secret eval answer" sits at tokens 4-6
                (1, "intro aa bb secret eval answer cc dd ee ff"),
                (2, "totally clean document with no benchmark text"),
                # quote at the very start: left clamp to position 1
                (3, "secret eval answer tail1 tail2 tail3"),
                # quote at the very end: right clamp to doc length
                (4, "head1 head2 head3 secret eval answer"),
            ],
            "doc_id long, text string",
        )
        bench = spark.createDataFrame(
            [(100, "the secret eval answer is forty two")],
            "bid long, btext string",
        )
        return corpus, bench

    def test_strips_window_around_hits(self, spark):
        from nsl_kdd_spark.operators.decontam import decontaminate_spans

        corpus, bench = self._fixture(spark)
        got = {
            r.doc_id: (r.text_clean, r.removed_tokens)
            for r in decontaminate_spans(
                corpus, bench, "doc_id", "text", "btext",
                n=3, window=1,
            ).collect()
        }
        # doc 1: hit gram at pos 4 covers [4, 6] -> span [3, 7]
        assert got[1] == ("intro aa dd ee ff", 5)
        # clean doc passes through byte-identical
        assert got[2] == (
            "totally clean document with no benchmark text", 0
        )
        # left clamp: span [1, 4]
        assert got[3] == ("tail2 tail3", 4)
        # right clamp: span [3, 6]
        assert got[4] == ("head1 head2", 4)

    def test_window_zero_strips_only_the_gram(self, spark):
        from nsl_kdd_spark.operators.decontam import decontaminate_spans

        corpus, bench = self._fixture(spark)
        got = {
            r.doc_id: r.removed_tokens
            for r in decontaminate_spans(
                corpus, bench, "doc_id", "text", "btext",
                n=3, window=0,
            ).collect()
        }
        assert got[1] == 3 and got[2] == 0

    def test_nearby_hits_merge_into_one_span(self, spark):
        from nsl_kdd_spark.operators.decontam import decontaminate_spans

        corpus = spark.createDataFrame(
            [(1, "x1 secret eval answer x2 secret eval answer x3")],
            "doc_id long, text string",
        )
        bench = spark.createDataFrame(
            [(9, "secret eval answer")], "bid long, btext string"
        )
        out = decontaminate_spans(
            corpus, bench, "doc_id", "text", "btext", n=3, window=1
        ).first()
        # hits at pos 2 and 6 (gap 4 <= n + 2w = 5) -> ONE merged
        # span [1, 9] covering everything
        assert out.text_clean == "" and out.removed_tokens == 9

    def test_invalid_args_raise(self, spark):
        import pytest as _pytest

        from nsl_kdd_spark.operators.decontam import decontaminate_spans

        corpus, bench = self._fixture(spark)
        with _pytest.raises(ValueError, match="n must"):
            decontaminate_spans(
                corpus, bench, "doc_id", "text", "btext", n=0
            )
        with _pytest.raises(ValueError, match="window"):
            decontaminate_spans(
                corpus, bench, "doc_id", "text", "btext", window=-1
            )

    def test_plan_broadcasts_benchmark_no_corpus_shuffle_below_join(
        self, spark
    ):
        from nsl_kdd_spark.operators.decontam import decontaminate_spans
        from tests.test_plan_quality import plan_of

        corpus, bench = self._fixture(spark)
        plan = plan_of(
            decontaminate_spans(
                corpus, bench, "doc_id", "text", "btext", n=3, window=1
            )
        )
        tree = plan.split("\n\n")[0]
        assert "BroadcastHashJoin" in tree  # bench gram probe
        assert "LeftSemi" in tree
        assert "EvalPython" not in plan


class TestContaminationReport:
    """Per-doc contamination accounting (round-11;
    decontam.contamination_report — the GPT-3 Appendix C dirty/clean
    table surfaced per document). Oracle parity held by q165; these
    pin the totals/hits/ppm arithmetic and consistency with the
    contaminated_ids verdict."""

    def _fixture(self, spark):
        corpus = spark.createDataFrame(
            [
                (1, "aa bb cc dd ee"),          # 3 distinct 3-grams, 1 hit
                (2, "clean text with no hits"),
                (3, "aa bb cc aa bb cc dd"),    # repeated grams dedupe
                (4, "xx"),                      # gram-less (< n tokens)
            ],
            "doc_id long, text string",
        )
        bench = spark.createDataFrame(
            [(100, "zz aa bb cc zz")],
            "bid long, btext string",
        )
        return corpus, bench

    def test_counts_and_ppm(self, spark):
        from nsl_kdd_spark.operators.decontam import contamination_report

        corpus, bench = self._fixture(spark)
        got = {
            r.doc_id: (r.n_grams, r.hit_grams, r.hit_ppm, r.contaminated)
            for r in contamination_report(
                corpus, bench, "doc_id", "text", "bid", "btext",
                n=3, min_hits=1,
            ).collect()
        }
        # doc 1: grams {aa bb cc, bb cc dd, cc dd ee}; hit = aa bb cc
        assert got[1] == (3, 1, 333333, True)
        assert got[2] == (3, 0, 0, False)
        # doc 3: distinct grams {aa bb cc, bb cc aa, cc aa bb,
        # aa bb cc(dup), bb cc dd} -> 4 distinct, 1 hit
        assert got[3] == (4, 1, 250000, True)
        # gram-less doc surfaces with zeros, never vanishes
        assert got[4] == (0, 0, 0, False)

    def test_consistent_with_contaminated_ids(self, spark):
        from nsl_kdd_spark.operators.decontam import (
            contaminated_ids,
            contamination_report,
        )

        corpus, bench = self._fixture(spark)
        flagged = {
            r.doc_id
            for r in contaminated_ids(
                corpus, bench, "doc_id", "text", "bid", "btext",
                n=3, min_hits=1,
            ).collect()
        }
        via_report = {
            r.doc_id
            for r in contamination_report(
                corpus, bench, "doc_id", "text", "bid", "btext",
                n=3, min_hits=1,
            ).filter("contaminated").collect()
        }
        assert via_report == flagged

    def test_min_hits_threshold(self, spark):
        from nsl_kdd_spark.operators.decontam import contamination_report

        corpus, bench = self._fixture(spark)
        got = {
            r.doc_id: r.contaminated
            for r in contamination_report(
                corpus, bench, "doc_id", "text", "bid", "btext",
                n=3, min_hits=2,
            ).collect()
        }
        assert got == {1: False, 2: False, 3: False, 4: False}

    def test_plan_broadcasts_benchmark(self, spark):
        from tests.test_plan_quality import plan_of
        from nsl_kdd_spark.operators.decontam import contamination_report

        corpus, bench = self._fixture(spark)
        df = contamination_report(
            corpus, bench, "doc_id", "text", "bid", "btext", n=3
        )
        plan = plan_of(df)
        assert "EvalPython" not in plan
        assert "BroadcastHashJoin" in plan.split("\n\n")[0]
