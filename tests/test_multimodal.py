"""Multimodal binary-column plumbing: schema, Arrow batch path,
deterministic fake decode, strict-stub behavior."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from nsl_kdd_spark.multimodal.binary import (
    MEDIA_SCHEMA,
    attach_payload_metadata,
    decode_media,
    synthesize_media,
)
from nsl_kdd_spark.sources.parquet import load_tables
from tests.conftest import SF_SMOKE


def test_media_schema_and_fake_decode(spark):
    docs = load_tables(spark, SF_SMOKE).documents.limit(20)
    media = synthesize_media(spark, docs, "text", "doc_id")
    assert [f.name for f in media.schema.fields] == [f.name for f in MEDIA_SCHEMA.fields]

    feats = decode_media(media).collect()
    assert len(feats) == 20
    # digest must equal md5 of the utf-8 payload, computed independently
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for row in feats:
        want = hashlib.md5(texts[row["media_id"]].encode()).hexdigest()
        assert row["digest"] == want
        assert row["n_bytes"] == len(texts[row["media_id"]].encode())


def test_metadata_stays_jvm_side(spark):
    docs = load_tables(spark, SF_SMOKE).documents.limit(5)
    media = attach_payload_metadata(synthesize_media(spark, docs, "text", "doc_id"))
    rows = media.select("media_id", "n_bytes", "crc").collect()
    assert all(r["n_bytes"] > 0 and r["crc"] is not None for r in rows)


def test_strict_decode_rejects_unknown_formats(spark):
    # text payloads are not a recognized image format: the strict
    # path must fail loudly (executor-side UnsupportedMediaError),
    # never silently fall back to the fake
    docs = load_tables(spark, SF_SMOKE).documents.limit(1)
    media = synthesize_media(spark, docs, "text", "doc_id")
    with pytest.raises(Exception, match="no built-in codec"):
        decode_media(media, strict=True).collect()


def test_resize_media_deterministic_fake(spark):
    docs = load_tables(spark, SF_SMOKE).documents.limit(20)
    media = synthesize_media(spark, docs, "text", "doc_id")
    from nsl_kdd_spark.multimodal.binary import resize_media

    out = resize_media(media, width=8, height=4)
    rows = out.collect()
    assert len(rows) == 20
    assert all(len(r.payload) == 32 for r in rows)  # exactly w*h bytes
    assert all(r.width == 8 and r.height == 4 for r in rows)
    # deterministic: same input -> same bytes
    again = {r.media_id: r.payload for r in resize_media(media, 8, 4).collect()}
    assert all(again[r.media_id] == r.payload for r in rows)
    with pytest.raises(Exception, match="no built-in codec"):
        resize_media(media, 8, 4, strict=True).collect()


def test_sample_frames_one_to_many(spark):
    docs = load_tables(spark, SF_SMOKE).documents.limit(5)
    media = synthesize_media(spark, docs, "text", "doc_id")
    from nsl_kdd_spark.multimodal.binary import sample_frames

    out = sample_frames(media, every_n=2, max_frames=3, frame_bytes=16)
    per = {r[0]: r[1] for r in out.groupBy("media_id").count().collect()}
    n_bytes = {r.media_id: r.n_bytes for r in media.collect()}
    for mid, cnt in per.items():
        total_frames = (n_bytes[mid] + 15) // 16
        assert cnt == min((total_frames + 1) // 2, 3)
    # frame timestamps reflect the pre-sampling index at 25 fps
    f = {(r.media_id, r.frame_idx): r.ts_ms for r in out.collect()}
    assert all(f[(m, i)] == i * 2 * 40 for (m, i) in f)
    with pytest.raises(NotImplementedError):
        sample_frames(media, strict=True)


# ---------------------------------------------------------------------------
# Real built-in codecs (PPM/BMP): the strict path end-to-end
# ---------------------------------------------------------------------------

def _gradient(h, w, phase=0):
    import numpy as np

    y, x = np.mgrid[0:h, 0:w]
    img = np.stack([(x * 7 + phase), (y * 11 + phase), (x + y + phase)], axis=-1)
    return (img % 256).astype(np.uint8)


def test_codec_roundtrips():
    import numpy as np

    from nsl_kdd_spark.multimodal.codecs import (
        bmp_decode, bmp_encode, ppm_decode, ppm_encode,
    )

    for h, w in [(1, 1), (4, 3), (5, 7), (16, 16)]:  # odd widths hit BMP row padding
        img = _gradient(h, w)
        assert np.array_equal(ppm_decode(ppm_encode(img)), img)
        assert np.array_equal(bmp_decode(bmp_encode(img)), img)


def test_codec_cross_format_same_pixels():
    # the digest is over DECODED pixels, so the same image encoded as
    # ppm and as bmp must yield identical features
    from nsl_kdd_spark.multimodal.codecs import bmp_encode, image_features, ppm_encode

    img = _gradient(9, 13)
    f_ppm = image_features(ppm_encode(img))
    f_bmp = image_features(bmp_encode(img))
    assert f_ppm == f_bmp


def test_ppm_header_comments_and_detect():
    import numpy as np

    from nsl_kdd_spark.multimodal.codecs import detect_format, ppm_decode

    img = _gradient(2, 2)
    raw = b"P6\n# a comment\n2 2\n# another\n255\n" + img.tobytes()
    assert np.array_equal(ppm_decode(raw), img)
    assert detect_format(raw) == "ppm"
    assert detect_format(b"\xff\xd8\xff\xe0rest") == "jpeg"
    assert detect_format(b"\x89PNG\r\n\x1a\nrest") == "png"
    assert detect_format(b"garbage") == "unknown"


def _media_df(spark, payloads):
    from nsl_kdd_spark.multimodal.binary import MEDIA_SCHEMA

    rows = [
        (i, "image", "image/x-portable-pixmap", len(p), bytearray(p))
        for i, p in enumerate(payloads)
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_strict_decode_real_codec_through_arrow(spark):
    # mixed ppm + bmp payloads through the real mapInPandas path;
    # executor-side features must equal a local decode
    from nsl_kdd_spark.multimodal.codecs import bmp_encode, image_features, ppm_encode

    payloads = [ppm_encode(_gradient(6, 5, i)) for i in range(4)]
    payloads += [bmp_encode(_gradient(3, 7, i)) for i in range(4)]
    media = _media_df(spark, payloads)
    got = {r.media_id: r for r in decode_media(media, strict=True).collect()}
    assert len(got) == 8
    for i, p in enumerate(payloads):
        want = image_features(p)
        assert got[i].digest == want["digest"]
        assert got[i].feat_mean == want["feat_mean"]
        assert got[i].feat_first == want["feat_first"]
        assert got[i].n_bytes == len(p)


def test_strict_resize_real_codec_through_arrow(spark):
    import numpy as np

    from nsl_kdd_spark.multimodal.binary import resize_media
    from nsl_kdd_spark.multimodal.codecs import (
        bmp_decode, bmp_encode, ppm_decode, ppm_encode, resize_nearest,
    )

    imgs = {0: _gradient(12, 10), 1: _gradient(5, 9, 3)}
    media = _media_df(spark, [ppm_encode(imgs[0]), bmp_encode(imgs[1])])
    out = {r.media_id: r for r in resize_media(media, width=8, height=6, strict=True).collect()}
    # format preserved, dims recorded, pixels == local nearest-neighbor
    got0 = ppm_decode(bytes(out[0].payload))
    got1 = bmp_decode(bytes(out[1].payload))
    assert got0.shape == (6, 8, 3) and got1.shape == (6, 8, 3)
    assert np.array_equal(got0, resize_nearest(imgs[0], 8, 6))
    assert np.array_equal(got1, resize_nearest(imgs[1], 8, 6))
    assert out[0].width == 8 and out[0].height == 6


def _make_wav(freq_hz: float, rate: int = 8000, n: int = 8000,
              amp: int = 16000) -> bytes:
    import numpy as np

    from nsl_kdd_spark.multimodal.codecs import wav_encode

    t = np.arange(n) / rate
    return wav_encode(
        (np.sin(2 * np.pi * freq_hz * t) * amp).astype("<i2"), rate
    )


def test_decode_audio_real_wav_through_arrow_path(spark):
    from nsl_kdd_spark.multimodal.binary import decode_audio

    rows = [
        (1, "audio", "audio/wav", None, _make_wav(440.0)),
        (2, "audio", "audio/wav", None, _make_wav(220.0, n=4000)),
    ]
    df = spark.createDataFrame(
        rows, "media_id long, kind string, mime string, n_bytes long, payload binary"
    )
    out = {r["media_id"]: r for r in decode_audio(df).collect()}
    assert out[1]["duration_ms"] == 1000 and out[1]["framerate"] == 8000
    assert out[2]["duration_ms"] == 500 and out[2]["n_channels"] == 1
    # 16000-amplitude sine -> RMS ~ 16000/sqrt(2) ~ 11313
    assert abs(out[1]["rms"] - 11313) <= 2
    assert out[1]["digest"] != out[2]["digest"]


def test_resample_audio_preserves_duration_and_tone(spark):
    from nsl_kdd_spark.multimodal.binary import decode_audio, resample_audio

    df = spark.createDataFrame(
        [(1, "audio", "audio/wav", None, _make_wav(440.0))],
        "media_id long, kind string, mime string, n_bytes long, payload binary",
    )
    down = resample_audio(df, 4000)
    feats = decode_audio(down.select("media_id", "kind", "payload")).first()
    assert feats["framerate"] == 4000
    assert abs(feats["duration_ms"] - 1000) <= 1
    # loudness survives linear-interp downsampling (440 Hz << 2 kHz Nyquist)
    assert abs(feats["rms"] - 11313) <= 150


def test_decode_audio_rejects_compressed_formats(spark):
    import pytest

    from nsl_kdd_spark.multimodal.binary import decode_audio

    df = spark.createDataFrame(
        [(1, "audio", "audio/mpeg", None, b"\xff\xfb\x90\x00" + bytes(64))],
        "media_id long, kind string, mime string, n_bytes long, payload binary",
    )
    with pytest.raises(Exception, match="wav|Error|unknown"):
        decode_audio(df).collect()


def test_resample_audio_degenerate_payloads_pass_through(spark):
    from nsl_kdd_spark.multimodal.binary import decode_audio, resample_audio
    from nsl_kdd_spark.multimodal.codecs import wav_encode

    import numpy as np

    zero_frames = wav_encode(np.zeros((0, 1), dtype="<i2"), 8000)
    df = spark.createDataFrame(
        [
            (1, "audio", "audio/wav", None, zero_frames),
            (2, "audio", "audio/wav", None, None),
            (3, "audio", "audio/wav", None, b""),
        ],
        "media_id long, kind string, mime string, n_bytes long, payload binary",
    )
    out = {r["media_id"]: r for r in resample_audio(df, 4000).collect()}
    # zero-frame WAV re-encodes at the target rate; None/empty unchanged
    feats = decode_audio(
        spark.createDataFrame(
            [(1, "audio", out[1]["payload"])],
            "media_id long, kind string, payload binary",
        )
    ).first()
    assert feats["framerate"] == 4000 and feats["duration_ms"] == 0
    assert out[2]["payload"] is None
    assert out[3]["payload"] == b""


def test_media_near_dup_finds_perceptual_twins_across_formats(spark):
    import numpy as np

    from nsl_kdd_spark.multimodal.binary import media_near_dup
    from nsl_kdd_spark.multimodal.codecs import bmp_encode, ppm_encode

    grad = (
        np.linspace(0, 255, 32)[None, :, None]
        .repeat(32, axis=0).repeat(3, axis=2).astype(np.uint8)
    )
    tweaked = grad.copy()
    tweaked[0, 0] = 255  # imperceptible edit
    flipped = np.ascontiguousarray(np.flip(grad, axis=1))
    rows = [
        (1, "image", "image/bmp", None, bmp_encode(grad)),
        (2, "image", "image/x-ppm", None, ppm_encode(grad)),     # format twin
        (3, "image", "image/bmp", None, bmp_encode(tweaked)),    # near twin
        (4, "image", "image/bmp", None, bmp_encode(flipped)),    # different
    ]
    df = spark.createDataFrame(
        rows, "media_id long, kind string, mime string, n_bytes long, payload binary"
    )
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in media_near_dup(df).collect()}
    assert set(pairs) == {(1, 2), (1, 3), (2, 3)}
    assert pairs[(1, 2)] == 0  # same pixels, different container
    # non-default id column + NULL payload rows are handled
    renamed = df.withColumnRenamed("media_id", "image_id").unionByName(
        spark.createDataFrame(
            [(9, "image", "image/bmp", None, None)],
            "image_id long, kind string, mime string, n_bytes long, payload binary",
        )
    )
    pairs2 = {(r["id_a"], r["id_b"])
              for r in media_near_dup(renamed, id_col="image_id").collect()}
    assert pairs2 == {(1, 2), (1, 3), (2, 3)}
    import pytest

    with pytest.raises(ValueError, match="pigeonhole"):
        media_near_dup(df, max_hamming=4, bands=4)


def test_media_near_dup_audio_fingerprint(spark):
    import numpy as np

    from nsl_kdd_spark.multimodal.binary import media_near_dup, resample_audio
    from nsl_kdd_spark.multimodal.codecs import audio_hash64, wav_encode

    t = np.arange(16000) / 16000.0
    env = (np.sin(2 * np.pi * 3 * t) > 0).astype(float) * 0.8 + 0.2
    tone = (np.sin(2 * np.pi * 440 * t) * env * 16000).astype("<i2")
    other = (np.sin(2 * np.pi * 440 * t) * np.roll(env, 4000) * 16000).astype("<i2")
    base = spark.createDataFrame(
        [(1, "audio", "audio/wav", wav_encode(tone, 16000)),
         (3, "audio", "audio/wav", wav_encode(other, 16000))],
        "media_id long, kind string, mime string, payload binary",
    )
    # id 2 = id 1 downsampled to 8 kHz: same loudness contour
    down = resample_audio(base.filter("media_id = 1"), 8000).select(
        (F.col("media_id") + 1).alias("media_id"), "kind", "mime", "payload"
    )
    df = base.select("media_id", "kind", "mime", "payload").unionByName(down)
    pairs = {(r["id_a"], r["id_b"]) for r in
             media_near_dup(df, hash_fn=audio_hash64).collect()}
    assert pairs == {(1, 2)}


def test_png_roundtrip_and_filters():
    import struct
    import zlib

    import numpy as np

    from nsl_kdd_spark.multimodal.codecs import (
        detect_format, png_decode, png_encode,
    )

    for h, w in [(1, 1), (4, 3), (5, 7), (16, 16)]:
        img = _gradient(h, w)
        raw = png_encode(img)
        assert detect_format(raw) == "png"
        assert np.array_equal(png_decode(raw), img)

    # hand-filter the same scanlines with every PNG filter type and
    # check the decoder unfilters each back to the original pixels
    img = _gradient(6, 5, 2)
    flat = img.reshape(6, 15).astype(np.int32)

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    for ftype in (0, 1, 2, 3, 4):
        rows = []
        for y in range(6):
            line = flat[y]
            prev = flat[y - 1] if y else np.zeros(15, np.int32)
            filt = np.zeros(15, np.int32)
            for x in range(15):
                a = line[x - 3] if x >= 3 else 0
                b = prev[x]
                c = prev[x - 3] if x >= 3 else 0
                if ftype == 0:
                    pred = 0
                elif ftype == 1:
                    pred = a
                elif ftype == 2:
                    pred = b
                elif ftype == 3:
                    pred = (a + b) >> 1
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                filt[x] = (line[x] - pred) & 0xFF
            rows.append(bytes([ftype]) + bytes(filt.astype(np.uint8)))
        ihdr = struct.pack(">IIBBBBB", 5, 6, 8, 2, 0, 0, 0)
        payload = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                   + chunk(b"IDAT", zlib.compress(b"".join(rows)))
                   + chunk(b"IEND", b""))
        assert np.array_equal(png_decode(payload), img), f"filter {ftype}"


def test_png_color_types_and_unsupported():
    import struct
    import zlib

    import numpy as np
    import pytest

    from nsl_kdd_spark.multimodal.codecs import UnsupportedMediaError, png_decode

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    def build(w, h, color, scan, extra=b""):
        ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
        return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + extra
                + chunk(b"IDAT", zlib.compress(scan)) + chunk(b"IEND", b""))

    # grayscale expands to RGB
    gray = build(3, 2, 0, b"\x00\x10\x20\x30" + b"\x00\x40\x50\x60")
    out = png_decode(gray)
    assert out.shape == (2, 3, 3)
    assert np.array_equal(out[0, 1], [0x20, 0x20, 0x20])

    # RGBA drops alpha
    rgba_scan = b"\x00" + bytes([1, 2, 3, 9, 4, 5, 6, 9])
    rgba = build(2, 1, 6, rgba_scan)
    assert np.array_equal(png_decode(rgba), [[[1, 2, 3], [4, 5, 6]]])

    # palette indexes PLTE
    plte = chunk(b"PLTE", bytes([10, 11, 12, 20, 21, 22]))
    pal = build(2, 1, 3, b"\x00\x01\x00", extra=plte)
    assert np.array_equal(png_decode(pal), [[[20, 21, 22], [10, 11, 12]]])

    # 16-bit depth and interlace raise
    ihdr16 = struct.pack(">IIBBBBB", 1, 1, 16, 2, 0, 0, 0)
    bad = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr16)
           + chunk(b"IDAT", zlib.compress(b"\x00\x00\x00\x00\x00\x00\x00"))
           + chunk(b"IEND", b""))
    with pytest.raises(UnsupportedMediaError, match="8-bit"):
        png_decode(bad)
    ihdr_i = struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 1)
    bad_i = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr_i)
             + chunk(b"IDAT", zlib.compress(b"\x00\x00\x00\x00"))
             + chunk(b"IEND", b""))
    with pytest.raises(UnsupportedMediaError, match="interlace"):
        png_decode(bad_i)


def test_png_strict_arrow_path_and_neardup_vs_bmp_twin(spark):
    # the dominant real-world format through the REAL mapInPandas
    # strict path: decode features match a local decode, the digest is
    # container-invariant vs the BMP twin, resize preserves format,
    # and media_near_dup pairs the PNG with its BMP twin
    import numpy as np

    from nsl_kdd_spark.multimodal.binary import (
        decode_media, media_near_dup, resize_media,
    )
    from nsl_kdd_spark.multimodal.codecs import (
        bmp_encode, image_features, png_decode, png_encode,
    )

    img_a = _gradient(16, 16)
    # perceptually DIFFERENT image (checkerboard, not a shifted
    # gradient — aHash correctly pairs same-structure gradients)
    yy, xx = np.mgrid[0:16, 0:16]
    img_b = (((xx // 2 + yy // 2) % 2) * 255).astype(np.uint8)
    img_b = np.repeat(img_b[..., None], 3, axis=2)
    payloads = [png_encode(img_a), bmp_encode(img_a), png_encode(img_b)]
    media = _media_df(spark, payloads)

    got = {r.media_id: r for r in decode_media(media, strict=True).collect()}
    assert got[0].digest == image_features(payloads[0])["digest"]
    assert got[0].digest == got[1].digest          # container-invariant

    out = {r.media_id: r
           for r in resize_media(media, width=8, height=8, strict=True).collect()}
    resized = png_decode(bytes(out[0].payload))
    assert resized.shape == (8, 8, 3)

    pairs = {(r.id_a, r.id_b)
             for r in media_near_dup(media).collect()}
    assert (0, 1) in pairs                         # png twin of the bmp
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_jpeg_roundtrip_444_and_420():
    import numpy as np

    from nsl_kdd_spark.multimodal.codecs import (
        detect_format, jpeg_decode, jpeg_encode,
    )

    yy, xx = np.mgrid[0:32, 0:48]
    img = np.stack(
        [(xx * 5) % 256, (yy * 7) % 256, ((xx + yy) * 3) % 256], axis=-1
    ).astype(np.uint8)
    for sub in (False, True, "422"):
        raw = jpeg_encode(img, quality=90, subsample=sub)
        assert detect_format(raw) == "jpeg"
        out = jpeg_decode(raw)
        assert out.shape == img.shape
        err = np.abs(out.astype(int) - img.astype(int))
        # lossy, but q90 on this gradient stays within a few levels
        assert err.max() <= (8 if sub else 5), (sub, err.max())
    # odd (non-multiple-of-MCU) dims crop back exactly at every sampling
    odd = img[:27, :41]
    assert jpeg_decode(jpeg_encode(odd, subsample=True)).shape == (27, 41, 3)
    assert jpeg_decode(jpeg_encode(odd, subsample="422")).shape == (27, 41, 3)
    import pytest
    with pytest.raises(ValueError, match="subsample"):
        jpeg_encode(img, subsample="411")


def test_jpeg_handbuilt_dc_only_gray_and_restart():
    """Decoder correctness independent of our encoder: hand-assemble
    a grayscale JPEG whose blocks are DC-only with unit quant, so the
    exact pixel value is computable by hand (dc/8 + 128). Two blocks
    with DRI=1 exercise restart segmentation + predictor reset."""
    import struct

    import numpy as np

    from nsl_kdd_spark.multimodal.codecs import (
        _BitWriter, _huff_encode_map, _jpeg_ac_spec, _JPEG_DC_LUMA_SPEC,
        jpeg_decode,
    )

    def seg(marker, body):
        return struct.pack(">HH", marker, len(body) + 2) + body

    ac_bits, ac_syms = _jpeg_ac_spec()
    dc_map = _huff_encode_map(*_JPEG_DC_LUMA_SPEC)
    ac_map = _huff_encode_map(ac_bits, ac_syms)

    def dc_only_block(writer, diff):
        size = abs(diff).bit_length()
        bits = diff if diff >= 0 else diff + (1 << size) - 1
        code, ln = dc_map[size]
        writer.write(code, ln)
        if size:
            writer.write(bits, size)
        code, ln = ac_map[0x00]          # EOB
        writer.write(code, ln)

    head = (
        b"\xff\xd8"
        + seg(0xFFDB, bytes([0]) + bytes([1] * 64))          # unit quant
        + seg(0xFFC4, bytes([0x00]) + bytes(_JPEG_DC_LUMA_SPEC[0])
              + bytes(_JPEG_DC_LUMA_SPEC[1]))
        + seg(0xFFC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_syms))
        + seg(0xFFC0, struct.pack(">BHHB", 8, 8, 16, 1)
              + bytes([1, 0x11, 0]))                          # 8x16 gray
        + seg(0xFFDD, struct.pack(">H", 1))                   # DRI = 1
        + seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
    )
    # block 1: dc=80 -> 80/8+128 = 138; RST0; block 2 (pred RESET):
    # dc=-40 -> -5+128 = 123
    w1 = _BitWriter()
    dc_only_block(w1, 80)
    w2 = _BitWriter()
    dc_only_block(w2, -40)
    payload = head + w1.flush() + b"\xff\xd0" + w2.flush() + b"\xff\xd9"

    out = jpeg_decode(payload)
    assert out.shape == (8, 16, 3)
    assert np.all(out[:, :8] == 138)
    assert np.all(out[:, 8:] == 123)


def test_jpeg_unsupported_variants():
    import struct

    import pytest

    from nsl_kdd_spark.multimodal.codecs import (
        UnsupportedMediaError, jpeg_decode,
    )

    def seg(marker, body):
        return struct.pack(">HH", marker, len(body) + 2) + body

    progressive = (
        b"\xff\xd8"
        + seg(0xFFC2, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    )
    with pytest.raises(UnsupportedMediaError, match="progressive"):
        jpeg_decode(progressive)
    with pytest.raises(UnsupportedMediaError, match="not a JPEG"):
        jpeg_decode(b"\x89PNG\r\n\x1a\nnot")


def test_jpeg_strict_arrow_and_neardup_vs_lossless_twin(spark):
    """JPEG payloads through the real mapInPandas strict path, and a
    q90 jpeg pairs with its lossless BMP twin in media_near_dup (the
    perceptual hash survives quantization noise)."""
    import numpy as np

    from nsl_kdd_spark.multimodal.binary import decode_media, media_near_dup
    from nsl_kdd_spark.multimodal.codecs import (
        bmp_encode, jpeg_encode, phash64,
    )

    img_a = _gradient(16, 16)
    yy, xx = np.mgrid[0:16, 0:16]
    img_b = (((xx // 2 + yy // 2) % 2) * 255).astype(np.uint8)
    img_b = np.repeat(img_b[..., None], 3, axis=2)
    payloads = [jpeg_encode(img_a, quality=90), bmp_encode(img_a),
                jpeg_encode(img_b, quality=90)]
    media = _media_df(spark, payloads)
    got = {r.media_id: r for r in decode_media(media, strict=True).collect()}
    assert len(got) == 3 and all(r.digest for r in got.values())

    # perceptual: jpeg(A) pairs with bmp(A), not with jpeg(B)
    h_jpeg = phash64(payloads[0])
    h_bmp = phash64(payloads[1])
    assert bin(h_jpeg ^ h_bmp).count("1") <= 6
    pairs = {(r.id_a, r.id_b) for r in media_near_dup(media).collect()}
    assert (0, 1) in pairs and (0, 2) not in pairs


def test_corrupt_payloads_raise_typed_error():
    import pytest

    from nsl_kdd_spark.multimodal.codecs import (
        UnsupportedMediaError, decode_image, jpeg_encode, png_encode,
    )
    import numpy as np

    img = _gradient(8, 8)
    for raw in (png_encode(img), jpeg_encode(img)):
        truncated = raw[: len(raw) // 2]
        with pytest.raises(UnsupportedMediaError):
            decode_image(truncated)
    # flipping bytes in the middle must also surface as the typed error
    raw = bytearray(png_encode(img))
    raw[40:60] = b"\x00" * 20
    with pytest.raises(UnsupportedMediaError):
        decode_image(bytes(raw))


def test_audio_dominant_frequency(spark):
    """FFT-based dominant frequency: pure tones report their own
    frequency through both the local hook and the Arrow decode path;
    silence reports 0."""
    import numpy as np

    from nsl_kdd_spark.multimodal.binary import MEDIA_SCHEMA, decode_audio
    from nsl_kdd_spark.multimodal.codecs import audio_features, wav_encode

    t = np.arange(8000) / 8000.0
    tones = {440.0: None, 1000.0: None}
    payloads = []
    for i, f in enumerate(sorted(tones)):
        wav = wav_encode((16000 * np.sin(2 * np.pi * f * t)).astype("<i2"),
                         8000)
        assert audio_features(wav)["dom_freq_hz"] == int(f)
        payloads.append((i, "audio", "audio/wav", len(wav), bytearray(wav)))
    silence = wav_encode(np.zeros(4000, dtype="<i2"), 8000)
    assert audio_features(silence)["dom_freq_hz"] == 0
    payloads.append((9, "audio", "audio/wav", len(silence),
                     bytearray(silence)))

    media = spark.createDataFrame(payloads, MEDIA_SCHEMA)
    got = {r.media_id: r.dom_freq_hz for r in decode_audio(media).collect()}
    assert got == {0: 440, 1: 1000, 9: 0}


def test_phash128_invariance_recall_and_wide_banding(spark):
    """128-bit perceptual hash (the scale signature): container-
    invariant, png-vs-jpeg twins land within the banded radius,
    distinct images stay far, and media_near_dup(bits=128) pairs the
    twin at 16-bit band width (the round-4 quadratic-bucket fix)."""
    import numpy as np

    from nsl_kdd_spark.multimodal.binary import media_near_dup
    from nsl_kdd_spark.multimodal.codecs import (
        bmp_encode, jpeg_encode, phash128, png_encode, ppm_encode,
    )

    img_a = _gradient(16, 16)
    # same pixels, three containers -> identical 128-bit hash
    sigs = {phash128(enc(img_a))
            for enc in (png_encode, bmp_encode, ppm_encode)}
    assert len(sigs) == 1

    def ham(a, b):
        return (bin(a[0] ^ b[0]).count("1")
                + bin(a[1] ^ b[1]).count("1"))

    # jpeg re-encode stays within the banded radius
    twin = ham(phash128(png_encode(img_a)),
               phash128(jpeg_encode(img_a, quality=85)))
    assert twin <= 6

    # distinct random images stay far apart at 128 bits
    rng = np.random.default_rng(11)
    img_b = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    assert ham(phash128(png_encode(img_a)),
               phash128(png_encode(img_b))) > 20

    payloads = [png_encode(img_a), jpeg_encode(img_a, quality=85),
                png_encode(img_b)]
    media = _media_df(spark, payloads)
    pairs = {(r.id_a, r.id_b): r.hamming for r in media_near_dup(
        media, max_hamming=6, bands=8, bits=128).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] == twin
    assert all(k == (0, 1) for k in pairs)

    import pytest
    with pytest.raises(ValueError, match="bits"):
        media_near_dup(media, bits=96)


def test_banded_hamming_multi_long_matches_single_long_semantics(spark):
    """The multi-long banding backend: pairs/join over ['hi','lo']
    signatures are pigeonhole-lossless within the radius, reject
    beyond it, and validate band geometry."""
    import pytest

    from nsl_kdd_spark.operators.dedup import (
        banded_hamming_join, banded_hamming_pairs,
    )

    rows = [
        (1, 0x0123456789ABCDEF, 0x0F0F0F0F0F0F0F0F),
        (2, 0x0123456789ABCDEF, 0x0F0F0F0F0F0F0F0E),  # hamming 1 vs id 1
        (3, 0x0123456789ABCDEE, 0x0F0F0F0F0F0F0F00),  # hamming 1+3=4 vs id 2
        (4, -0x0123456789ABCDF0, 0x7070707070707070),  # far from all
    ]
    sigs = spark.createDataFrame(rows, "id long, hi long, lo long")
    pairs = {(r.id_a, r.id_b): r.hamming for r in banded_hamming_pairs(
        sigs, "id", ["hi", "lo"], bands=8, max_hamming=4).collect()}
    assert pairs[(1, 2)] == 1 and pairs[(2, 3)] == 4
    assert (1, 3) not in pairs          # hamming 5 > radius 4
    assert not any(4 in k for k in pairs)

    probe = spark.createDataFrame(
        [(10, 0x0123456789ABCDEF, 0x0F0F0F0F0F0F0F0F)],
        "id long, hi long, lo long")
    hits = {(r.id_l, r.id_r): r.hamming for r in banded_hamming_join(
        probe, sigs, "id", ["hi", "lo"], "id", ["hi", "lo"],
        bands=8, max_hamming=1).collect()}
    assert hits == {(10, 1): 0, (10, 2): 1}

    with pytest.raises(ValueError, match="equal slices"):
        banded_hamming_pairs(sigs, "id", ["hi", "lo"], bands=3,
                             max_hamming=1)
    with pytest.raises(ValueError, match="widths differ"):
        banded_hamming_join(probe, sigs, "id", ["hi", "lo"], "id", "hi")


def test_simhash128_two_long_bands_match_crossjoin_truth(spark):
    """bits=128 simhash (the 1e9-doc text configuration): the banded
    two-long path must find exactly the pairs the exact cross-join
    path finds, at both band geometries (8x16-bit, 4x32-bit), and the
    signature must be the two-long layout."""
    from nsl_kdd_spark.operators.dedup import simhash, simhash_pairs

    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta iota"),   # near 1
        (3, "totally different words about spark shuffles and parquet"),
        (4, "alpha beta gamma delta epsilon zeta eta theta"),  # dup of 1
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    sigs = simhash(docs, "doc_id", "text", bits=128)
    assert set(sigs.columns) == {"doc_id", "simhash_hi", "simhash_lo"}
    by_id = {r.doc_id: (r.simhash_hi, r.simhash_lo) for r in sigs.collect()}
    assert by_id[1] == by_id[4]            # identical text, identical sig

    truth = {(r.id_a, r.id_b, r.hamming) for r in simhash_pairs(
        docs, "doc_id", "text", max_hamming=16, bits=128).collect()}
    assert (1, 4, 0) in truth
    # bands=3 included: non-dividing band counts are valid since the
    # round-6 covered-bits slicer (near-equal widths, straddles OK)
    for bands in (8, 4, 3):
        banded = {(r.id_a, r.id_b, r.hamming) for r in simhash_pairs(
            docs, "doc_id", "text", max_hamming=bands - 1, bits=128,
            bands=bands).collect()}
        want = {t for t in truth if t[2] <= bands - 1}
        assert banded == want

    import pytest
    with pytest.raises(ValueError, match="more bands"):
        # width would be 128 > 64 — a band value must fit one long
        simhash_pairs(docs, "doc_id", "text", max_hamming=0, bits=128,
                      bands=1)
    with pytest.raises(ValueError, match="multiple of 4"):
        simhash(docs, "doc_id", "text", bits=132)


def test_simhash_wide_partial_bits_bands_cover_only_covered_bits(spark):
    """Round-6 advisory regression: for 64 < bits < 128 the banded
    path used to slice the full 128-bit layout, so every band over
    the always-zero region above ``bits`` was constant 0 for all rows
    — an all-pairs bucket (O(n^2) candidates). The covered-bits
    slicer must (a) keep the banded output identical to the exact
    cross-join truth and (b) leave no band constant across a diverse
    corpus."""
    from nsl_kdd_spark.operators.dedup import (
        _covered_band_slices,
        simhash,
        simhash_pairs,
    )

    words = ("alpha beta gamma delta shard shuffle parquet arrow flink "
             "spark kafka iceberg delta hudi presto trino duck goose "
             "heron samza storm beam dataflow ray dask polars pandas").split()
    rows = [
        (i, " ".join(words[j % len(words)] for j in range(i, i + 9)))
        for i in range(14)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    for bits in (68, 96, 124):
        truth = {(r.id_a, r.id_b, r.hamming) for r in simhash_pairs(
            docs, "doc_id", "text", max_hamming=7, bits=bits).collect()}
        banded = {(r.id_a, r.id_b, r.hamming) for r in simhash_pairs(
            docs, "doc_id", "text", max_hamming=7, bits=bits,
            bands=8).collect()}
        assert banded == truth

    # (b) no degenerate band: every band index must see >1 distinct
    # value over distinct texts (the old slicer left bands over the
    # uncovered region constant 0)
    from pyspark.sql import functions as F
    sigs = simhash(docs, "doc_id", "text", bits=96)
    slices = _covered_band_slices("simhash_lo", "simhash_hi", 96, 8)
    per_band = (
        sigs.select(F.posexplode(F.array(*slices)).alias("bi", "bv"))
        .groupBy("bi").agg(F.countDistinct("bv").alias("n"))
        .collect()
    )
    assert len(per_band) == 8
    assert all(r.n > 1 for r in per_band)


def test_covered_band_slices_match_python_reference(spark):
    """The wide covered-bits slice geometry, checked bit-for-bit
    against a Python reference over random signatures, including
    word-boundary-straddling bands and the sign bit of the low
    long."""
    import random

    from pyspark.sql import functions as F

    from nsl_kdd_spark.operators.dedup import _covered_band_slices

    bits = 100
    rng = random.Random(7)
    raw = [rng.getrandbits(bits) for _ in range(16)]
    raw.append((1 << bits) - 1)          # all ones: sign bit of lo set

    def signed64(x: int) -> int:
        return x - (1 << 64) if x >= (1 << 63) else x

    df = spark.createDataFrame(
        [(i, signed64(v & ((1 << 64) - 1)), signed64(v >> 64))
         for i, v in enumerate(raw)],
        "id long, lo long, hi long",
    )
    for bands in (2, 5, 8, 13):
        base, extra = divmod(bits, bands)
        widths = [base + (1 if i < extra else 0) for i in range(bands)]
        got = df.select(
            "id",
            *[s.alias(f"b{j}") for j, s in
              enumerate(_covered_band_slices("lo", "hi", bits, bands))],
        ).collect()
        for r in got:
            v, start = raw[r.id], 0
            for j, w in enumerate(widths):
                want = (v >> start) & ((1 << w) - 1)
                assert signed64(want) == r[f"b{j}"], (bands, j)
                start += w


def test_banded_hamming_single_long_nondividing_bands_still_work(spark):
    """Round-5 review regression: single-long signatures must accept
    any band count up to 64 (floor-width slicing, uncovered high bits
    keep the pigeonhole guarantee) — the multi-long equal-slice rule
    must not reject previously-valid configs like bands=5."""
    from nsl_kdd_spark.operators.dedup import banded_hamming_pairs

    sigs = spark.createDataFrame(
        [(1, 0x0123456789ABCDEF), (2, 0x0123456789ABCDEE),  # hamming 1
         (3, -0x123456789ABCDF0)],
        "id long, sig long",
    )
    for bands in (3, 5, 7, 12):
        pairs = {(r.id_a, r.id_b): r.hamming for r in banded_hamming_pairs(
            sigs, "id", "sig", bands=bands, max_hamming=2).collect()}
        assert pairs.get((1, 2)) == 1, bands
        assert all(3 not in k for k in pairs), bands


def test_banded_hamming_128_randomized_equals_bruteforce(spark):
    """Randomized (seeded) ground-truth check of the multi-long banded
    backend: over 120 random 128-bit signatures with planted
    near-neighbors, banded pairs at radius 7 must equal the exact
    all-pairs answer at both valid geometries."""
    import random

    rng = random.Random(123)
    sigs = []
    for i in range(80):
        sigs.append((i, rng.getrandbits(64), rng.getrandbits(64)))
    # planted neighbors: flip <= 7 random bits of existing sigs
    for j in range(40):
        base = sigs[rng.randrange(80)]
        hi, lo = base[1], base[2]
        for _ in range(rng.randrange(8)):
            b = rng.randrange(128)
            if b < 64:
                lo ^= 1 << b
            else:
                hi ^= 1 << (b - 64)
        sigs.append((100 + j, hi, lo))

    def signed(v):
        return v - (1 << 64) if v >= (1 << 63) else v

    rows = [(i, signed(hi), signed(lo)) for i, hi, lo in sigs]
    want = set()
    for x in range(len(sigs)):
        for y in range(x + 1, len(sigs)):
            ia, ha, la = sigs[x]
            ib, hb, lb = sigs[y]
            d = bin(ha ^ hb).count("1") + bin(la ^ lb).count("1")
            if d <= 7:
                a, b = sorted((ia, ib))
                want.add((a, b, d))

    from nsl_kdd_spark.operators.dedup import banded_hamming_pairs

    df = spark.createDataFrame(rows, "id long, hi long, lo long")
    for bands in (8, 16):
        got = {(r.id_a, r.id_b, r.hamming) for r in banded_hamming_pairs(
            df, "id", ["hi", "lo"], bands=bands, max_hamming=7).collect()}
        assert got == want, f"bands={bands}"
    assert len(want) >= 40          # the planted neighbors are found


def test_banded_backend_partial_bits_contract(spark):
    """Round-7 (r6 verdict residual edge): the PUBLIC backend entry
    points accept a ``bits`` contract for partial-coverage two-long
    signatures. At bits 68/96/124: (a) banded pairs == brute-force
    truth, (b) no band is constant across a diverse corpus (the
    degeneration the contract exists to prevent), and (c) the
    cross-table join finds the same pairs."""
    import random

    from pyspark.sql import functions as F

    from nsl_kdd_spark.operators.dedup import (
        _band_explode,
        banded_hamming_join,
        banded_hamming_pairs,
    )

    def signed(v):
        return v - (1 << 64) if v >= (1 << 63) else v

    for bits in (68, 96, 124):
        rng = random.Random(bits)
        raw = [rng.getrandbits(bits) for _ in range(60)]
        for j in range(30):  # planted near-neighbors, <= 7 flips
            v = raw[rng.randrange(60)]
            for _ in range(rng.randrange(8)):
                v ^= 1 << rng.randrange(bits)
            raw.append(v)
        want = set()
        for x in range(len(raw)):
            for y in range(x + 1, len(raw)):
                d = bin(raw[x] ^ raw[y]).count("1")
                if d <= 7:
                    want.add((x, y, d))
        assert want, bits
        mask = (1 << 64) - 1
        df = spark.createDataFrame(
            [(i, signed(v & mask), signed(v >> 64))
             for i, v in enumerate(raw)],
            "id long, lo long, hi long",
        )
        # (a) self-join truth through the public entry point
        got = {(r.id_a, r.id_b, r.hamming) for r in banded_hamming_pairs(
            df, "id", ["lo", "hi"], bands=8, max_hamming=7,
            bits=bits).collect()}
        assert got == want, bits

        # (b) every band sees >1 distinct value (no constant band)
        per_band = (
            _band_explode(df, "id", ["lo", "hi"], 8, bits)
            .groupBy("__band").agg(F.countDistinct("__val").alias("n"))
            .collect()
        )
        assert len(per_band) == 8 and all(r.n > 1 for r in per_band), bits

        # (c) cross-table variant: probe half against the other half
        left = df.filter(F.col("id") < 60)
        right = df.filter(F.col("id") >= 60)
        got_j = {(r.id_l, r.id_r, r.hamming) for r in banded_hamming_join(
            left, right, "id", ["lo", "hi"], "id", ["lo", "hi"],
            bands=8, max_hamming=7, bits=bits).collect()}
        want_j = {(a, b, d) for a, b, d in want if a < 60 <= b}
        assert got_j == want_j, bits


def test_banded_backend_partial_bits_single_long(spark):
    """bits <= 64 on a single long column: the covered-bits slicer
    replaces the floor-width geometry, so bands spread over exactly
    bits 0..bits-1 (floor-width at bands=8/bits=40 would band only
    the low 40 bits anyway — but at bands=7 the widths differ; truth
    must hold either way)."""
    import random

    from nsl_kdd_spark.operators.dedup import banded_hamming_pairs

    bits = 40
    rng = random.Random(9)
    raw = [rng.getrandbits(bits) for _ in range(50)]
    for j in range(25):
        v = raw[rng.randrange(50)]
        for _ in range(rng.randrange(6)):
            v ^= 1 << rng.randrange(bits)
        raw.append(v)
    want = set()
    for x in range(len(raw)):
        for y in range(x + 1, len(raw)):
            d = bin(raw[x] ^ raw[y]).count("1")
            if d <= 5:
                want.add((x, y, d))
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(raw)], "id long, sig long"
    )
    for bands in (7, 8):
        got = {(r.id_a, r.id_b, r.hamming) for r in banded_hamming_pairs(
            df, "id", "sig", bands=bands, max_hamming=5,
            bits=bits).collect()}
        assert got == want, bands


def test_banded_backend_bits_validation(spark):
    """Invalid bits contracts fail loudly instead of degenerating."""
    import pytest

    from nsl_kdd_spark.operators.dedup import banded_hamming_pairs

    two = spark.createDataFrame(
        [(1, 2, 3), (2, 4, 5)], "id long, lo long, hi long"
    )
    one = spark.createDataFrame([(1, 2), (2, 3)], "id long, sig long")
    with pytest.raises(ValueError, match="does not fit"):
        banded_hamming_pairs(two, "id", ["lo", "hi"], bands=4,
                             max_hamming=3, bits=60).collect()
    with pytest.raises(ValueError, match="does not fit"):
        banded_hamming_pairs(one, "id", "sig", bands=4,
                             max_hamming=3, bits=96).collect()
    with pytest.raises(ValueError, match="exceeds"):
        # bands > bits: width floors to 0 -> constant bands
        banded_hamming_pairs(one, "id", "sig", bands=48,
                             max_hamming=3, bits=40).collect()
