"""Generic Bloom-filter key set + semi-join reduction (round-8).

At 100 TB the classic "filter the fact table by a dimension subset"
shape has three Spark plans: broadcast semi join (needs the key set
to fit a broadcast hash relation, ~8+ bytes/key), shuffle semi join
(shuffles the FACT side — the disaster at scale), or AQE's runtime
row-level filtering (only fires under broadcast thresholds it
controls). This module is the explicit fourth option: build a ~10
bits/key Bloom bitmap over the small side's keys, probe the big side
MAP-SIDE (no shuffle of the big side, ~60x less broadcast traffic
than the hash relation), then optionally re-check survivors with an
exact semi join whose probe input is now tiny (true matches +
fpp * |big|). With the re-check the result is EXACTLY the semi join;
without it, a documented false-positive superset for pipelines that
re-verify downstream anyway (operators/decontam.py's gram probe is
that pattern).

One arithmetic implementation: `bloom_positions` (numpy, wrapping
int64 — the same two's-complement semantics as Java longs) is used by
the builder and the probe, so build/probe can never disagree. The two
64-bit keys per row are Spark-side `xxhash64(cols...)` and
`xxhash64(cols..., 1)`; bit positions follow standard double hashing
(h1 + i*h2 mod m, Kirsch & Mitzenmacher 2006).
"""

from __future__ import annotations

import math
from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bloom_positions(h1, h2, m: int, k: int):
    """(len(h1), k) int64 array of bit positions; wrapping int64
    arithmetic, then a floored mod into [0, m)."""
    import numpy as np

    with np.errstate(over="ignore"):
        h1 = np.asarray(h1, dtype=np.int64)
        h2 = np.asarray(h2, dtype=np.int64)
        i = np.arange(k, dtype=np.int64)
        raw = h1[:, None] + i[None, :] * h2[:, None]  # wraps like Java
    return np.mod(raw, np.int64(m))  # floored mod -> non-negative


@dataclass(frozen=True)
class KeyBloom:
    """A built Bloom filter: packed little-endian bit array plus the
    (m, k) geometry and build metadata."""

    bits: bytes  # ceil(m/8) bytes, bit j = bits[j//8] >> (j%8) & 1
    m: int  # filter size in bits
    k: int  # hashes per item
    n_items: int  # distinct keys inserted

    @property
    def n_bytes(self) -> int:
        return len(self.bits)

    def unpersist(self) -> None:
        """Destroy the cached bitmap broadcast (if one was created by
        a probe). Call when a long-lived session is done probing this
        filter; idempotent, and a later probe simply re-broadcasts."""
        cached = self.__dict__.pop("_bc", None)
        if cached is not None:
            try:
                cached[1].destroy()
            except Exception:
                pass  # context already stopped — nothing to free

    def __getstate__(self):
        """Pickle only the filter itself, never the broadcast cache
        (round-9 review): a probed instance would otherwise become
        unpicklable (weakref + Broadcast in __dict__), breaking the
        documented build-once/cache/probe-many amortization pattern.
        The deserialized copy simply re-broadcasts on first probe."""
        state = dict(self.__dict__)
        state.pop("_bc", None)
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)


def bloom_geometry(n_items: int, fpp: float) -> tuple[int, int]:
    """Standard sizing: m = -n ln(p)/ln(2)^2 bits, k = m/n ln(2)."""
    n_items = max(1, n_items)
    m = max(64, math.ceil(-n_items * math.log(fpp) / (math.log(2) ** 2)))
    k = max(1, round(m / n_items * math.log(2)))
    return m, k


def key_hash_cols(cols: Sequence[str | Column]) -> tuple[Column, Column]:
    """The (h1, h2) 64-bit key pair over a column tuple."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.xxhash64(*cs), F.xxhash64(*cs, F.lit(1))


def build_bloom_from_keys(keys: DataFrame, fpp: float) -> KeyBloom:
    """Build a filter from a ``(__h1, __h2)`` key-pair DataFrame,
    distributively: executors emit (word_index, 64-bit word) partial
    rows via an Arrow-batched mapInPandas; one bit_or aggregation
    merges them; the driver materializes exactly ``m/8`` bytes (the
    filter itself — the one artifact that MUST land on the driver to
    be broadcast). Peak driver transfer is the set-word count,
    <= m/64 rows — the dense limit equals the filter size, never the
    key count. One count() job sizes the filter first."""
    import numpy as np

    keys = keys.select("__h1", "__h2").distinct()
    n_items = keys.count()
    m, k = bloom_geometry(n_items, fpp)

    def emit_words(batches):
        import pandas as pd

        for pdf in batches:
            pos = bloom_positions(
                pdf["__h1"].to_numpy(), pdf["__h2"].to_numpy(), m, k
            ).ravel()
            words = np.unique(pos // 64)
            acc = np.zeros(len(words), dtype=np.uint64)
            idx = np.searchsorted(words, pos // 64)
            np.bitwise_or.at(
                acc, idx, np.uint64(1) << (pos % 64).astype(np.uint64)
            )
            yield pd.DataFrame(
                {"widx": words.astype("int64"), "word": acc.astype("int64")}
            )

    merged = (
        keys.mapInPandas(emit_words, "widx long, word long")
        .groupBy("widx")
        .agg(F.bit_or("word").alias("word"))
        .collect()
    )
    arr = np.zeros((m + 63) // 64, dtype=np.int64)
    for row in merged:
        arr[row["widx"]] = row["word"]
    bits = arr.view(np.uint8).tobytes()[: (m + 7) // 8]
    return KeyBloom(bits=bits, m=m, k=k, n_items=n_items)


def build_key_bloom(
    df: DataFrame, cols: Sequence[str | Column], fpp: float = 0.01
) -> KeyBloom:
    """Bloom filter over the distinct ``cols`` tuples of ``df``."""
    h1, h2 = key_hash_cols(cols)
    return build_bloom_from_keys(
        df.select(h1.alias("__h1"), h2.alias("__h2")), fpp
    )


def _bloom_broadcast(spark, bloom: KeyBloom):
    """ONE bitmap broadcast per KeyBloom per SparkContext, cached on
    the instance (round-9 advisory: a fresh broadcast per probe call
    accumulated driver+executor broadcast blocks in long-lived
    sessions that probe the same filter repeatedly — the prebuilt-
    bloom decontam path, the fuzz/bench loops). ``KeyBloom.unpersist``
    releases it. The context is held by WEAK reference: identity is
    checked against the live object (an ``id()`` key could collide
    after a restarted context reuses the address), and the cache
    never keeps a stopped SparkContext alive."""
    import weakref

    sc = spark.sparkContext
    cached = bloom.__dict__.get("_bc")
    if cached is not None and cached[0]() is sc:
        return cached[1]
    bc = sc.broadcast(bloom.bits)
    object.__setattr__(  # frozen dataclass: bypass the field guard
        bloom, "_bc", (weakref.ref(sc), bc)
    )
    return bc


def bloom_might_contain_col(spark, bloom: KeyBloom):
    """Arrow-batched membership-test column factory over (h1, h2).
    The packed bitmap rides a SparkContext broadcast so executors
    fetch it once per worker, not per task — and repeated probes of
    the same KeyBloom reuse one cached broadcast instead of leaking
    a new block per call."""
    from pyspark.sql.pandas.functions import pandas_udf

    bc = _bloom_broadcast(spark, bloom)
    m, k = bloom.m, bloom.k

    @pandas_udf("boolean")
    def might_contain(h1, h2):  # type: ignore[no-untyped-def]
        import numpy as np
        import pandas as pd

        buf = np.frombuffer(bc.value, dtype=np.uint8)
        pos = bloom_positions(h1.to_numpy(), h2.to_numpy(), m, k)
        hit = (buf[pos // 8] >> (pos % 8).astype(np.uint8)) & 1
        return pd.Series(hit.all(axis=1))

    # asNondeterministic (optimization r13, guide §4.4): the probe IS
    # deterministic, but the optimizer infers the probe filter across
    # the phase-2 semi join's key equality and re-evaluates it over
    # the SMALL side too — a second ArrowEvalPython pass over every
    # build-side row that the join would filter anyway (observed in
    # the q147/q148 plans: two probe nodes, one per scan). Marking it
    # non-deterministic pins the probe to the big side only; results
    # are unchanged (the probe only ever pre-filters a join input).
    return might_contain.asNondeterministic()


def bloom_semi_join(
    large: DataFrame,
    small: DataFrame,
    on: str | Sequence[str],
    small_on: str | Sequence[str] | None = None,
    fpp: float = 0.01,
    exact: bool = True,
    bloom: KeyBloom | None = None,
) -> DataFrame:
    """Rows of ``large`` whose ``on`` key tuple appears in ``small``
    (``small_on`` when the columns are named differently).

    Phase 1 drops non-matching rows map-side via the bitmap probe —
    the big side never shuffles and never crosses into a join. With
    ``exact=True`` (default) a LEFT SEMI join against the small
    side's distinct keys removes the false positives, and because
    phase 1 already discarded ~everything else, that join's probe
    input is ~|matches| + fpp*|large| rows; the result is exactly
    the semi join (SQL NULL semantics included — a NULL key never
    survives phase 2). ``exact=False`` returns the bloom-approved
    superset: each non-matching row passes with probability ~fpp,
    and NULL keys hash to a constant that may probe true — only for
    pipelines that re-verify downstream. Pass a prebuilt ``bloom``
    to amortize the build across many probes of the same key set."""
    on = [on] if isinstance(on, str) else list(on)
    small_on = (
        on if small_on is None
        else [small_on] if isinstance(small_on, str) else list(small_on)
    )
    if len(on) != len(small_on):
        raise ValueError(f"key widths differ: {on} vs {small_on}")
    if bloom is None:
        bloom = build_key_bloom(small, small_on, fpp=fpp)
    h1, h2 = key_hash_cols(on)
    probe = bloom_might_contain_col(large.sparkSession, bloom)
    passed = large.filter(probe(h1, h2))
    if not exact:
        return passed
    keys = small.select(
        *[F.col(s).alias(o) for s, o in zip(small_on, on)]
    ).distinct()
    return passed.join(keys, on=on, how="left_semi")
