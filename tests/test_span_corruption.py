"""T5/UL2 span corruption (round-11;
operators/corpus.span_corruption_transform — Raffel et al. 2020
§3.1.4 denoising objective, the UL2 R/X denoiser family). Oracle
parity is held by q167 + the span_corruption fuzz family; these
tests pin the unit-selection arithmetic against a pure-Python md5
reference, the serialization invariants (token conservation,
sentinel indexing, round-trip reconstruction), and the zero-shuffle
plan shape."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from nsl_kdd_spark.operators.corpus import span_corruption_transform


def _bucket(key: str, salt: str = "") -> int:
    return int(hashlib.md5(f"{salt}{key}".encode()).hexdigest()[:4], 16)


def _py_corrupt(
    doc_id: int,
    text: str,
    rate: float,
    span_len: int,
    salt: str,
    pfx: str = "<extra_id_",
    sfx: str = ">",
):
    cut = int(rate * 65536)
    tk = text.split(" ")
    sel = [
        i + 1
        for i in range(len(tk))
        if _bucket(f"{doc_id}-{i // span_len}", salt) < cut
    ]
    spans: list[list[int]] = []
    for p in sel:
        if spans and spans[-1][1] == p - 1:
            spans[-1][1] = p
        else:
            spans.append([p, p])
    inp: list[str] = []
    tgt: list[str] = []
    prev_e = 0
    for k, (s, e) in enumerate(spans):
        inp += tk[prev_e : s - 1] + [f"{pfx}{k}{sfx}"]
        tgt += [f"{pfx}{k}{sfx}"] + tk[s - 1 : e]
        prev_e = e
    inp += tk[prev_e:]
    tgt += [f"{pfx}{len(spans)}{sfx}"]
    return {
        "text_input": " ".join(inp),
        "text_target": " ".join(tgt),
        "n_spans": len(spans),
        "corrupted_tokens": len(sel),
    }


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "alpha bravo charlie delta echo foxtrot golf hotel"),
            (2, "one two three"),
            (3, "solo"),
            (4, " ".join(f"tok{i}" for i in range(50))),
            (5, "x y"),
        ],
        "doc_id long, text string",
    )


@pytest.mark.parametrize(
    "rate,span_len,salt",
    [(0.15, 3, ""), (0.3, 2, "s"), (0.5, 1, "a"), (1.0, 4, "z"),
     (0.0, 3, "")],
)
def test_matches_python_reference(spark, rate, span_len, salt):
    out = {
        r["doc_id"]: r.asDict()
        for r in span_corruption_transform(
            _docs(spark), "doc_id", "text",
            rate=rate, span_len=span_len, salt=salt,
        ).collect()
    }
    for doc_id, text in _docs(spark).collect():
        exp = _py_corrupt(doc_id, text, rate, span_len, salt)
        got = out[doc_id]
        for k, v in exp.items():
            assert got[k] == v, (doc_id, k, got[k], v)


def test_rate_zero_is_pure_passthrough(spark):
    rows = span_corruption_transform(
        _docs(spark), "doc_id", "text", rate=0.0
    ).collect()
    for r in rows:
        assert r["text_input"] == r["text"]
        assert r["text_target"] == "<extra_id_0>"
        assert r["n_spans"] == 0 and r["corrupted_tokens"] == 0


def test_rate_one_masks_everything(spark):
    rows = span_corruption_transform(
        _docs(spark), "doc_id", "text", rate=1.0, span_len=3
    ).collect()
    for r in rows:
        # every token selected -> one maximal run covering the doc
        assert r["n_spans"] == 1
        assert r["corrupted_tokens"] == len(r["text"].split(" "))
        assert r["text_input"] == "<extra_id_0>"
        assert r["text_target"] == f"<extra_id_0> {r['text']} <extra_id_1>"


def test_roundtrip_reconstruction(spark):
    """The published objective's defining invariant: splicing each
    target span back over its input sentinel reproduces the original
    document exactly."""
    rows = span_corruption_transform(
        _docs(spark), "doc_id", "text", rate=0.3, span_len=2, salt="rt"
    ).collect()
    for r in rows:
        spans: dict[int, list[str]] = {}
        cur = None
        for t in r["text_target"].split(" "):
            if t.startswith("<extra_id_") and t.endswith(">"):
                cur = int(t[len("<extra_id_"):-1])
                spans[cur] = []
            else:
                spans[cur].append(t)
        rebuilt: list[str] = []
        for t in r["text_input"].split(" "):
            if t.startswith("<extra_id_") and t.endswith(">"):
                rebuilt += spans[int(t[len("<extra_id_"):-1])]
            else:
                rebuilt.append(t)
        assert " ".join(rebuilt) == r["text"], r["doc_id"]


def test_token_conservation(spark):
    """input tokens + target span tokens == original tokens; sentinel
    counts match n_spans (+1 final)."""
    rows = span_corruption_transform(
        _docs(spark), "doc_id", "text", rate=0.4, span_len=3, salt="tc"
    ).collect()
    for r in rows:
        n_orig = len(r["text"].split(" "))
        inp = r["text_input"].split(" ")
        tgt = r["text_target"].split(" ")
        inp_sent = sum(t.startswith("<extra_id_") for t in inp)
        tgt_sent = sum(t.startswith("<extra_id_") for t in tgt)
        assert inp_sent == r["n_spans"]
        assert tgt_sent == r["n_spans"] + 1
        assert (len(inp) - inp_sent) + (len(tgt) - tgt_sent) == n_orig


def test_mean_span_length_tracks_span_len(spark):
    """The (rate, span_len) knobs realize the published objective:
    whole units of span_len are masked, so every maximal run is a
    multiple of span_len except where it hits the document tail."""
    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(60))) for i in range(50)],
        "doc_id long, text string",
    )
    rows = span_corruption_transform(
        docs, "doc_id", "text", rate=0.3, span_len=3, salt="ms"
    ).collect()
    total = n = 0
    for r in rows:
        spans: dict[int, int] = {}
        cur = None
        for t in r["text_target"].split(" ")[:-1]:
            if t.startswith("<extra_id_"):
                cur = int(t[len("<extra_id_"):-1])
                spans[cur] = 0
            else:
                spans[cur] += 1
        for k, ln in spans.items():
            total += ln
            n += 1
            assert ln % 3 == 0 or ln % 3 == 60 % 3, (r["doc_id"], k, ln)
    # mean run length >= span_len (adjacent masked units merge)
    assert n > 0 and total / n >= 3


def test_custom_sentinels(spark):
    rows = span_corruption_transform(
        _docs(spark), "doc_id", "text", rate=1.0,
        sentinel_prefix="[M", sentinel_suffix="]",
    ).collect()
    for r in rows:
        assert r["text_input"] == "[M0]"
        assert r["text_target"].startswith("[M0] ")
        assert r["text_target"].endswith(" [M1]")


def test_invalid_args_raise(spark):
    with pytest.raises(ValueError):
        span_corruption_transform(_docs(spark), "doc_id", "text", rate=1.5)
    with pytest.raises(ValueError):
        span_corruption_transform(
            _docs(spark), "doc_id", "text", span_len=0
        )


def test_plan_is_pure_scan_projection(spark):
    """100 TB shape: the whole transform is scan-stage expressions —
    no exchange, no join, no window, no explode, no Python."""
    from tests.test_plan_quality import plan_of

    df = span_corruption_transform(
        _docs(spark), "doc_id", "text", rate=0.3
    )
    plan = plan_of(df)
    tree = plan.split("\n\n")[0]
    assert "Exchange" not in tree
    assert "Join" not in tree and "Window" not in tree
    assert "Generate" not in tree  # no explode
    assert "EvalPython" not in plan


def _b32(key: str, salt: str = "") -> int:
    return int(hashlib.md5(f"{salt}{key}".encode()).hexdigest()[:8], 16)


def _py_mod(doc_id, text, salt, weights=(0.5, 0.25, 0.25),
            r=(0.15, 3), x=(0.5, 8)):
    tk = text.split(" ")
    L = len(tk)
    total = sum(weights)
    cut_r = int(weights[0] / total * 65536)
    cut_rx = int((weights[0] + weights[1]) / total * 65536)
    rb = _bucket(str(doc_id), salt + "route")
    route = "R" if rb < cut_r else ("X" if rb < cut_rx else "S")
    if route == "S":
        c = _b32(str(doc_id), salt + "s") % (L + 1)
        sel = [p for p in range(1, L + 1) if p > c]
    else:
        rate, slen = r if route == "R" else x
        cut = int(rate * 65536)
        sel = [
            p for p in range(1, L + 1)
            if _bucket(f"{doc_id}-{(p - 1) // slen}", salt + "u") < cut
        ]
    spans: list[list[int]] = []
    for p in sel:
        if spans and spans[-1][1] == p - 1:
            spans[-1][1] = p
        else:
            spans.append([p, p])
    inp, tgt, prev = [], [], 0
    for k, (s_, e_) in enumerate(spans):
        inp += tk[prev:s_ - 1] + [f"<extra_id_{k}>"]
        tgt += [f"<extra_id_{k}>"] + tk[s_ - 1:e_]
        prev = e_
    inp += tk[prev:]
    tgt += [f"<extra_id_{len(spans)}>"]
    return route, " ".join(inp), " ".join(tgt), len(spans), len(sel)


def test_mixture_of_denoisers_matches_python_reference(spark):
    from nsl_kdd_spark.operators.corpus import mixture_of_denoisers

    rows = [
        (i, " ".join(f"w{i}_{j}" for j in range(20 + i % 13)))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in mixture_of_denoisers(
            df, "doc_id", "text", salt="t1"
        ).collect()
    }
    seen = set()
    for doc_id, text in rows:
        route, inp, tgt, nsp, ct = _py_mod(doc_id, text, "t1")
        g = out[doc_id]
        seen.add(route)
        assert (
            g["denoiser"], g["text_input"], g["text_target"],
            g["n_spans"], g["corrupted_tokens"],
        ) == (route, inp, tgt, nsp, ct), doc_id
    assert seen == {"R", "X", "S"}  # all three objectives exercised


def test_mixture_weights_route_everything(spark):
    from nsl_kdd_spark.operators.corpus import mixture_of_denoisers

    df = spark.createDataFrame(
        [(i, "a b c d e f g h") for i in range(20)],
        "doc_id long, text string",
    )
    all_r = mixture_of_denoisers(
        df, "doc_id", "text", weights=(1.0, 0.0, 0.0)
    ).collect()
    assert all(r["denoiser"] == "R" for r in all_r)
    all_s = mixture_of_denoisers(
        df, "doc_id", "text", weights=(0.0, 0.0, 1.0)
    ).collect()
    assert all(r["denoiser"] == "S" for r in all_s)
    # S = prefix-LM: input ends with the sentinel (suffix masked),
    # and the target carries the suffix (or the K=0 bare sentinel
    # when the split lands at L)
    for r in all_s:
        if r["n_spans"] == 1:
            assert r["text_input"].endswith("<extra_id_0>")
            assert r["text_target"].endswith("<extra_id_1>")
        else:
            assert r["n_spans"] == 0
            assert r["text_target"] == "<extra_id_0>"


def test_mixture_invalid_args(spark):
    from nsl_kdd_spark.operators.corpus import mixture_of_denoisers

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        mixture_of_denoisers(df, "doc_id", "text", weights=(1.0, 0.0))
    with pytest.raises(ValueError):
        mixture_of_denoisers(df, "doc_id", "text", weights=(0, 0, 0))
    with pytest.raises(ValueError):
        mixture_of_denoisers(df, "doc_id", "text", r_denoiser=(1.5, 3))
    with pytest.raises(ValueError):
        mixture_of_denoisers(df, "doc_id", "text", x_denoiser=(0.5, 0))


def test_mixture_plan_is_pure_scan_projection(spark):
    from tests.test_plan_quality import plan_of

    from nsl_kdd_spark.operators.corpus import mixture_of_denoisers

    df = spark.createDataFrame(
        [(1, "a b c d")], "doc_id long, text string"
    )
    plan = plan_of(mixture_of_denoisers(df, "doc_id", "text"))
    tree = plan.split("\n\n")[0]
    assert "Exchange" not in tree
    assert "Join" not in tree and "Window" not in tree
    assert "Generate" not in tree
    assert "EvalPython" not in plan
