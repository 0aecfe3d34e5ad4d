"""Product-quantization ANN tier (engine extension; completes the
similarity ladder in ``operators/similarity.py``: brute force → IVF →
sign-LSH → PQ). At 100 TB the corpus' float vectors don't fit hot
storage: PQ stores m one-byte codes per vector (e.g. 64-dim float64 →
8 bytes, a 64x shrink) and scores queries against codes via ADC
(asymmetric distance computation) — a per-query lookup table over
subspace centroids, gathered with numpy, no float vector reads at all
on the scan path.

Spark-first shape:
- codebooks train DRIVER-SIDE on a bounded sample (m independent
  k-means over dim/m-wide subvectors — classic Jégou et al. PQ,
  IEEE TPAMI 2011) and broadcast as plain numpy arrays;
- encoding is one Arrow ``mapInPandas`` pass (batch numpy argmin —
  no per-row Python), yielding (id, array<smallint> code);
- scoring broadcasts the (small) query set, builds each query's
  ADC table once per Arrow batch, gathers approximate distances for
  the whole batch in one numpy take, keeps a per-partition top-k,
  then resolves the global top-k with one window — the same
  partial-topk-then-merge shape as ``knn_bruteforce``.

Vectors are L2-normalized before quantization so squared-L2 and
cosine agree (||a-b||² = 2-2·cos for unit vectors); results report
``cos_sim ≈ 1 - d²/2`` to stay comparable with the other tiers.
Optional exact re-scoring of an expanded shortlist (``refine``)
trades one narrow join for recall.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    ShortType,
    StructField,
    StructType,
)

from nsl_kdd_spark.functions.vector import cosine_prenorm, norm, to_double_array


def _kmeans_np(x: np.ndarray, k: int, seed: int, iters: int = 25) -> np.ndarray:
    """Tiny deterministic Lloyd's k-means (numpy, driver-side): PQ
    codebooks are m×(k×subdim) floats — small enough that pulling in
    a distributed trainer would cost more than it saves."""
    rng = np.random.default_rng(seed)
    centers = x[rng.choice(len(x), size=k, replace=len(x) < k)]
    for _ in range(iters):
        d2 = ((x[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
        assign = d2.argmin(1)
        for j in range(k):
            sel = x[assign == j]
            if len(sel):
                centers[j] = sel.mean(0)
    return centers


def _normalize(v: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(v, axis=-1, keepdims=True)
    return v / np.where(n == 0, 1.0, n)


def train_codebooks(
    corpus: DataFrame,
    dim: int,
    m: int = 8,
    k: int = 32,
    sample: int = 10_000,
    seed: int = 42,
    vec_col: str = "embedding",
) -> np.ndarray:
    """(m, k, dim/m) codebooks from a bounded corpus sample. The
    sample caps driver memory regardless of corpus size (100 TB corpus
    -> same 10k×dim floats on the driver)."""
    assert dim % m == 0, f"dim {dim} must split into m={m} subspaces"
    sub = dim // m
    frac_df = corpus.select(to_double_array(vec_col).alias("v")).limit(sample)
    x = _normalize(np.array([r["v"] for r in frac_df.collect()], dtype=np.float64))
    return np.stack([
        _kmeans_np(x[:, i * sub : (i + 1) * sub], k, seed + i) for i in range(m)
    ])


def encode_pq(
    corpus: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One Arrow pass: vector -> m subspace-centroid indices.
    (id, code array<smallint>) is the table that persists; at scale
    this is the only thing the scan path ever reads."""
    m, k, sub = codebooks.shape
    cb = codebooks  # closure-captured; ships once per task via pickle

    schema = StructType([
        StructField("vec_id", LongType()),
        StructField("code", ArrayType(ShortType())),
    ])

    def batches(it):
        for pdf in it:
            if not len(pdf):
                continue
            v = _normalize(np.stack(pdf["__v"].to_numpy()))
            codes = np.empty((len(v), m), dtype=np.int16)
            for i in range(m):
                s = v[:, i * sub : (i + 1) * sub]
                d2 = ((s[:, None, :] - cb[i][None, :, :]) ** 2).sum(-1)
                codes[:, i] = d2.argmin(1)
            import pandas as pd

            yield pd.DataFrame({"vec_id": pdf["__id"], "code": list(codes)})

    prepared = corpus.select(
        F.col(id_col).cast("long").alias("__id"), to_double_array(vec_col).alias("__v")
    )
    return prepared.mapInPandas(batches, schema=schema)


def knn_pq(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int,
    m: int = 8,
    codebook_k: int = 32,
    sample: int = 10_000,
    seed: int = 42,
    refine: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    codebooks: np.ndarray | None = None,
    codes: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k cosine via PQ/ADC. ``refine > 0`` exact-
    rescored the top ``refine*k`` ADC shortlist per query (one narrow
    join against the float vectors — the standard recall knob).
    Pass precomputed ``codebooks``/``codes`` to skip training/encoding
    (the persistent-index usage)."""
    if codebooks is None:
        codebooks = train_codebooks(
            corpus, dim, m=m, k=codebook_k, sample=sample, seed=seed, vec_col=vec_col
        )
    if codes is None:
        codes = encode_pq(corpus, codebooks, id_col=id_col, vec_col=vec_col)
    mm, kk, sub = codebooks.shape
    cb = codebooks

    qrows = queries.select(
        F.col(id_col).cast("long").alias("__qid"), to_double_array(vec_col).alias("__qv")
    ).collect()
    qids = np.array([r["__qid"] for r in qrows], dtype=np.int64)
    qvs = _normalize(np.array([r["__qv"] for r in qrows], dtype=np.float64))
    # ADC tables: [n_queries, m, k] — distances from each query
    # subvector to every subspace centroid, built ONCE on the driver
    # (tiny) and closure-shipped
    luts = np.stack([
        ((qvs[:, i * sub : (i + 1) * sub][:, None, :] - cb[i][None, :, :]) ** 2).sum(-1)
        for i in range(mm)
    ], axis=1)
    shortlist = k * refine if refine > 0 else k

    out_schema = StructType([
        StructField("query_id", LongType()),
        StructField("vec_id", LongType()),
        StructField("approx_d2", DoubleType()),
    ])

    def score(it):
        import pandas as pd

        for pdf in it:
            if not len(pdf):
                continue
            c = np.stack(pdf["code"].to_numpy()).astype(np.int64)  # [n, m]
            n = len(c)
            # gather: d2[q, n] = sum_i luts[q, i, c[n, i]]
            d2 = np.zeros((len(qids), n))
            for i in range(mm):
                d2 += luts[:, i, :][:, c[:, i]]
            # per-batch top-shortlist per query
            take = min(shortlist, n)
            idx = np.argpartition(d2, take - 1, axis=1)[:, :take]
            rows_q = np.repeat(qids, take)
            rows_v = pdf["vec_id"].to_numpy()[idx.ravel()]
            rows_d = np.take_along_axis(d2, idx, axis=1).ravel()
            yield pd.DataFrame(
                {"query_id": rows_q, "vec_id": rows_v, "approx_d2": rows_d}
            )

    scored = codes.mapInPandas(score, schema=out_schema).filter(
        F.col("query_id") != F.col("vec_id")
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("approx_d2"), F.asc("vec_id"))
    top = scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= shortlist
    )

    if refine <= 0:
        return (
            top.filter(F.col("rank") <= k)
            .select(
                F.col("query_id").alias(query_id_col),
                F.col("vec_id").alias(id_col),
                (1.0 - F.col("approx_d2") / 2.0).alias("cos_sim"),
                F.col("rank").cast("long").alias("rank"),
            )
            .orderBy(query_id_col, "rank")
        )

    # exact re-score of the shortlist: one narrow join on vec_id
    vecs = corpus.select(
        F.col(id_col).cast("long").alias("vec_id"), to_double_array(vec_col).alias("__cv")
    ).withColumn("__cn", norm(F.col("__cv")))
    qdf = queries.select(
        F.col(id_col).cast("long").alias("query_id"), to_double_array(vec_col).alias("__qv")
    ).withColumn("__qn", norm(F.col("__qv")))
    exact = (
        top.select("query_id", "vec_id")
        .join(vecs, "vec_id")
        .join(F.broadcast(qdf), "query_id")
        .select(
            "query_id", "vec_id",
            cosine_prenorm(
                F.col("__qv"), F.col("__cv"), F.col("__qn"), F.col("__cn")
            ).alias("cos_sim"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w2).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("query_id").alias(query_id_col),
            F.col("vec_id").alias(id_col),
            "cos_sim",
            "rank",
        )
        .orderBy(query_id_col, "rank")
    )


# ---------------------------------------------------------------------------
# IVF-PQ: coarse cells + residual product quantization (the classic
# composition — Jégou et al. 2011's IVFADC). The coarse quantizer
# routes each vector to a cell; PQ encodes the RESIDUAL (vector minus
# cell centroid), which is much better-centered than the raw vector,
# so the same code budget quantizes tighter. Queries probe only the
# n_probe nearest cells and score via per-(query, cell) ADC tables.
# ---------------------------------------------------------------------------


def train_ivfpq(
    corpus: DataFrame,
    dim: int,
    n_cells: int = 16,
    m: int = 8,
    k: int = 64,
    sample: int = 10_000,
    seed: int = 42,
    vec_col: str = "embedding",
) -> dict:
    """Driver-side index training on a bounded sample: coarse KMeans
    over full vectors, then PQ codebooks over residuals pooled across
    cells (shared codebooks — the standard memory/quality trade)."""
    assert dim % m == 0
    sub = dim // m
    rows = corpus.select(to_double_array(vec_col).alias("v")).limit(sample).collect()
    x = _normalize(np.array([r["v"] for r in rows], dtype=np.float64))
    coarse = _kmeans_np(x, n_cells, seed)
    d2 = ((x[:, None, :] - coarse[None, :, :]) ** 2).sum(-1)
    resid = x - coarse[d2.argmin(1)]
    codebooks = np.stack([
        _kmeans_np(resid[:, i * sub : (i + 1) * sub], k, seed + 100 + i)
        for i in range(m)
    ])
    return {"coarse": coarse, "codebooks": codebooks}


def encode_ivfpq(
    corpus: DataFrame,
    index: dict,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """One Arrow pass: (id, cell, residual PQ code)."""
    coarse, cb = index["coarse"], index["codebooks"]
    m, k, sub = cb.shape

    schema = StructType([
        StructField("vec_id", LongType()),
        StructField("cell", ShortType()),
        StructField("code", ArrayType(ShortType())),
    ])

    def batches(it):
        import pandas as pd

        for pdf in it:
            if not len(pdf):
                continue
            v = _normalize(np.stack(pdf["__v"].to_numpy()))
            d2 = ((v[:, None, :] - coarse[None, :, :]) ** 2).sum(-1)
            cells = d2.argmin(1)
            resid = v - coarse[cells]
            codes = np.empty((len(v), m), dtype=np.int16)
            for i in range(m):
                s = resid[:, i * sub : (i + 1) * sub]
                codes[:, i] = (
                    ((s[:, None, :] - cb[i][None, :, :]) ** 2).sum(-1).argmin(1)
                )
            yield pd.DataFrame({
                "vec_id": pdf["__id"],
                "cell": cells.astype(np.int16),
                "code": list(codes),
            })

    prepared = corpus.select(
        F.col(id_col).cast("long").alias("__id"), to_double_array(vec_col).alias("__v")
    )
    return prepared.mapInPandas(batches, schema=schema)


def knn_ivfpq(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    dim: int,
    n_cells: int = 16,
    n_probe: int = 4,
    m: int = 8,
    codebook_k: int = 64,
    sample: int = 10_000,
    seed: int = 42,
    refine: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    index: dict | None = None,
    codes: DataFrame | None = None,
) -> DataFrame:
    """IVF-PQ top-k: probe ``n_probe`` cells per query, ADC-score
    residual codes against per-(query, cell) lookup tables (LUTs are
    n_queries x n_probe x m x k driver-side floats — tiny), optional
    exact shortlist refinement. The scan path reads codes only and
    skips ~(1 - n_probe/n_cells) of every batch."""
    if index is None:
        index = train_ivfpq(
            corpus, dim, n_cells=n_cells, m=m, k=codebook_k,
            sample=sample, seed=seed, vec_col=vec_col,
        )
    if codes is None:
        codes = encode_ivfpq(corpus, index, id_col=id_col, vec_col=vec_col)
    coarse, cb = index["coarse"], index["codebooks"]
    n_cells = len(coarse)
    mm, kk, sub = cb.shape

    qrows = queries.select(
        F.col(id_col).cast("long").alias("__qid"), to_double_array(vec_col).alias("__qv")
    ).collect()
    qids = np.array([r["__qid"] for r in qrows], dtype=np.int64)
    qvs = _normalize(np.array([r["__qv"] for r in qrows], dtype=np.float64))
    qd2 = ((qvs[:, None, :] - coarse[None, :, :]) ** 2).sum(-1)
    probes = np.argsort(qd2, axis=1)[:, :n_probe]  # [nq, n_probe]
    # LUT[qi, pi, i, kk]: ADC table of query residual vs codebooks,
    # where the query residual is vs the PROBED cell's centroid
    qresid = qvs[:, None, :] - coarse[probes]      # [nq, n_probe, dim]
    luts = np.stack([
        (
            (qresid[:, :, i * sub : (i + 1) * sub][:, :, None, :] - cb[i][None, None, :, :])
            ** 2
        ).sum(-1)
        for i in range(mm)
    ], axis=2)                                     # [nq, n_probe, m, kk]
    shortlist = k * refine if refine > 0 else k

    out_schema = StructType([
        StructField("query_id", LongType()),
        StructField("vec_id", LongType()),
        StructField("approx_d2", DoubleType()),
    ])

    def score(it):
        import pandas as pd

        for pdf in it:
            if not len(pdf):
                continue
            cells = pdf["cell"].to_numpy()
            c = np.stack(pdf["code"].to_numpy()).astype(np.int64)
            ids = pdf["vec_id"].to_numpy()
            out_q, out_v, out_d = [], [], []
            for qi in range(len(qids)):
                for pi in range(n_probe):
                    mask = cells == probes[qi, pi]
                    if not mask.any():
                        continue
                    cm = c[mask]
                    d2 = np.zeros(len(cm))
                    for i in range(mm):
                        d2 += luts[qi, pi, i][cm[:, i]]
                    take = min(shortlist, len(cm))
                    sel = np.argpartition(d2, take - 1)[:take]
                    out_q.append(np.full(take, qids[qi]))
                    out_v.append(ids[mask][sel])
                    out_d.append(d2[sel])
            if not out_q:
                yield pd.DataFrame({"query_id": [], "vec_id": [], "approx_d2": []}).astype(
                    {"query_id": "int64", "vec_id": "int64", "approx_d2": "float64"}
                )
                continue
            yield pd.DataFrame({
                "query_id": np.concatenate(out_q),
                "vec_id": np.concatenate(out_v),
                "approx_d2": np.concatenate(out_d),
            })

    scored = codes.mapInPandas(score, schema=out_schema).filter(
        F.col("query_id") != F.col("vec_id")
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("approx_d2"), F.asc("vec_id"))
    top = scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= shortlist
    )
    if refine <= 0:
        return (
            top.filter(F.col("rank") <= k)
            .select(
                F.col("query_id").alias(query_id_col),
                F.col("vec_id").alias(id_col),
                (1.0 - F.col("approx_d2") / 2.0).alias("cos_sim"),
                F.col("rank").cast("long").alias("rank"),
            )
            .orderBy(query_id_col, "rank")
        )
    vecs = corpus.select(
        F.col(id_col).cast("long").alias("vec_id"), to_double_array(vec_col).alias("__cv")
    ).withColumn("__cn", norm(F.col("__cv")))
    qdf = queries.select(
        F.col(id_col).cast("long").alias("query_id"), to_double_array(vec_col).alias("__qv")
    ).withColumn("__qn", norm(F.col("__qv")))
    exact = (
        top.select("query_id", "vec_id")
        .join(vecs, "vec_id")
        .join(F.broadcast(qdf), "query_id")
        .select(
            "query_id", "vec_id",
            cosine_prenorm(
                F.col("__qv"), F.col("__cv"), F.col("__qn"), F.col("__cn")
            ).alias("cos_sim"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w2).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("query_id").alias(query_id_col),
            F.col("vec_id").alias(id_col),
            "cos_sim",
            "rank",
        )
        .orderBy(query_id_col, "rank")
    )
