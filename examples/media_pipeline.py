"""Multimodal corpus pipeline end-to-end on the REAL codec tier:
synthesize a mixed-format image corpus (PNG/BMP/JPEG, with planted
cross-format and lossy near-duplicates), then run the strict Arrow
path a 100 TB media pipeline would run:

    decode -> pixel features -> perceptual near-dup pairs
           -> connected components -> canonical selection

    python examples/media_pipeline.py [--docs 200]

Everything after synthesis is the production shape: metadata stays
JVM-side (blobs pruned unless a stage needs them), decode/fingerprint
ride `mapInPandas` Arrow batches, pairing uses the same banded-hamming
backend as text simhash, and survivors come from the same
`select_canonical` used for text dedup (q126).
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np  # noqa: E402

from nsl_kdd_spark.session import get_session  # noqa: E402


def build_corpus(spark, n_docs: int):
    """Mixed-format image table with planted duplicate structure:
    every 4th image is the BMP twin of the previous PNG (exact pixels,
    different container) and every 7th is a q85 JPEG re-encode of the
    previous image (lossy near-dup). The rest are distinct patterns."""
    from nsl_kdd_spark.multimodal.binary import MEDIA_SCHEMA
    from nsl_kdd_spark.multimodal.codecs import (
        bmp_encode, jpeg_encode, png_encode,
    )

    rng = np.random.default_rng(42)
    rows = []
    prev = None
    for i in range(n_docs):
        if prev is not None and i % 4 == 3:
            payload = bmp_encode(prev)            # exact cross-format twin
        elif prev is not None and i % 7 == 6:
            payload = jpeg_encode(prev, quality=85)   # lossy near-dup
        else:
            yy, xx = np.mgrid[0:16, 0:16]
            kind = i % 3
            if kind == 0:
                img = np.stack(
                    [(xx * (3 + i)) % 256, (yy * (5 + i)) % 256,
                     ((xx + yy) * 2) % 256], axis=-1)
            elif kind == 1:
                img = (((xx // (1 + i % 3) + yy // (1 + i % 4)) % 2) * 255)[
                    ..., None].repeat(3, axis=2)
            else:
                img = rng.integers(0, 256, (16, 16, 3))
            prev = img.astype(np.uint8)
            payload = png_encode(prev)
        rows.append(
            (i, "image", "image/mixed", len(payload), bytearray(payload))
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=200)
    args = ap.parse_args()

    spark = get_session(app_name="media-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()

    from pyspark.sql import functions as F

    from nsl_kdd_spark.multimodal.binary import decode_media, media_near_dup
    from nsl_kdd_spark.operators.corpus import select_canonical
    from nsl_kdd_spark.operators.graph import connected_components

    media = build_corpus(spark, args.docs).localCheckpoint()
    print(f"corpus: {media.count()} images, "
          f"{media.agg(F.sum('n_bytes')).first()[0]} bytes")

    feats = decode_media(media, strict=True).localCheckpoint()
    print(f"decoded: {feats.count()} "
          f"({feats.select('digest').distinct().count()} distinct pixel "
          f"digests -> exact cross-format twins collapse)")

    pairs = media_near_dup(media, max_hamming=6, bands=8).localCheckpoint()
    print(f"perceptual near-dup pairs: {pairs.count()}")

    comps = connected_components(
        pairs.select(F.col("id_a"), F.col("id_b"))
    )
    # canonical = best quality per duplicate family; prefer the
    # lossless (non-jpeg) and larger payload
    quality = media.select(
        F.col("media_id").alias("doc_id"), F.col("n_bytes").alias("q")
    )
    survivors = select_canonical(quality, comps, F.col("q"))
    kept = survivors.count()
    print(f"duplicate families: "
          f"{comps.select('comp').distinct().count()}; "
          f"canonical survivors incl. singletons: {kept} / {args.docs}")
    print(f"done in {time.perf_counter() - t0:.1f}s")


if __name__ == "__main__":
    main()
