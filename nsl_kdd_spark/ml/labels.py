"""Label derivation operators (SURVEY.md §1.2, §2.8 D1/F1, §2.10 M1).

The reference derives two label columns: ``labels2`` via a
negative-lookahead ``regexp_replace`` (README.md:229) and ``labels5``
via a Python dict-lookup UDF that KeyErrors on unseen labels
(README.md:173-220,238). The engine keeps the regex trick (Java regex
supports lookahead) and replaces the UDF with a Catalyst ``create_map``
literal lookup — JVM-side, constant-folded, broadcast-free — with the
KeyError strictness reproduced via ``raise_error`` when asked.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def binary_label(col: Column | str, normal_value: str = "normal",
                 positive_value: str = "attack") -> Column:
    """labels2: anything not equal to ``normal_value`` becomes
    ``positive_value`` — the reference's negative-lookahead regex
    ``regexp_replace(labels, '^(?!normal).*$', 'attack')``
    (README.md:229)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, f"^(?!{normal_value}).*$", positive_value)


def map_label(col: Column | str, mapping: Mapping[str, str],
              strict: bool = True) -> Column:
    """labels5: dictionary lookup as a map-literal expression
    (replaces D1's Python UDF). ``strict=True`` reproduces the
    reference's KeyError-on-unseen-label semantics (README.md:220) via
    ``raise_error``; ``strict=False`` yields null for unseen keys."""
    c = F.col(col) if isinstance(col, str) else col
    pairs: list[Column] = []
    for k, v in mapping.items():
        pairs += [F.lit(k), F.lit(v)]
    # try_element_at: NULL on unseen key under BOTH ANSI settings —
    # plain element_at(map, key) throws under ANSI mode, breaking the
    # strict=False null contract (and strict=True's raise_error path)
    looked_up = F.try_element_at(F.create_map(*pairs), c)
    if not strict:
        return looked_up
    return F.when(
        looked_up.isNull() & c.isNotNull(),
        F.raise_error(F.concat(F.lit("unseen label: "), c)),
    ).otherwise(looked_up)


def with_labels(df: DataFrame, label_col: str, mapping: Mapping[str, str],
                normal_value: str = "normal", strict: bool = True) -> DataFrame:
    """Convenience: adds ``labels2`` and ``labels5`` in one projection
    (the reference's Labels2Converter/Labels5Converter transformers,
    README.md:222-238)."""
    return df.withColumns({
        "labels2": binary_label(label_col, normal_value=normal_value),
        "labels5": map_label(label_col, mapping, strict=strict),
    })
