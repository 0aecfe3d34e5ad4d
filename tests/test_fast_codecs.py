"""Accelerated codec tier (round-7): Pillow auto-detect behind the
CODECS seam. Parity tests skip cleanly when Pillow is absent (this
container); the registration plumbing is covered everywhere via a
monkeypatched fake provider."""

from __future__ import annotations

import numpy as np
import pytest

from nsl_kdd_spark.multimodal import codecs, fast_codecs


def _rgb(h=24, w=32, seed=5):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


# --- parity vs the pure codecs (require Pillow; skip here) -----------

def test_pillow_png_decode_bit_identical_to_pure():
    pytest.importorskip("PIL.Image")
    img = _rgb()
    payload = codecs.png_encode(img)
    assert np.array_equal(fast_codecs._pil_decode(payload),
                          codecs.png_decode(payload))


def test_pillow_jpeg_decode_within_idct_tolerance_of_pure():
    """JPEG decode is spec-bounded, not bit-exact: different IDCTs
    legitimately differ by a couple of 8-bit steps per pixel."""
    pytest.importorskip("PIL.Image")
    img = _rgb(40, 48)
    payload = codecs.jpeg_encode(img, quality=90)
    pure = codecs.jpeg_decode(payload).astype(np.int16)
    fast = fast_codecs._pil_decode(payload).astype(np.int16)
    assert pure.shape == fast.shape
    assert int(np.abs(pure - fast).max()) <= 4


# --- registration plumbing (run everywhere via fake provider) --------

class _FakeImage:
    """Stand-in PIL.Image module: open() -> context manager whose
    convert('RGB') yields a fixed recognizable array."""

    MARKER = np.full((4, 4, 3), 7, dtype=np.uint8)

    class _Im:
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def convert(self, mode):
            assert mode == "RGB"
            return _FakeImage.MARKER

    @staticmethod
    def open(buf):
        if buf.getvalue() == b"corrupt":
            raise OSError("cannot identify image file")
        return _FakeImage._Im()


@pytest.fixture
def fake_pillow(monkeypatch):
    monkeypatch.setattr(fast_codecs, "HAVE_PILLOW", True)
    monkeypatch.setattr(fast_codecs, "_PILImage", _FakeImage)
    monkeypatch.delenv("NSL_KDD_SPARK_PURE_CODECS", raising=False)


def test_register_swaps_decode_and_keeps_pure(fake_pillow):
    reg = {f: dict(e) for f, e in codecs.CODECS.items()}
    done = fast_codecs.register_accelerated_codecs(reg)
    assert done == ["jpeg", "png"]
    for fmt in done:
        assert reg[fmt]["tier"] == "pillow"
        assert reg[fmt]["pure_decode"] is codecs.CODECS[fmt]["decode"]
        # acceptance-checked wrapper, not the raw PIL decode (r8 advisory)
        assert reg[fmt]["decode"] is fast_codecs.CHECKED_DECODERS[fmt]
        # encode stays pure (write path is engine-controlled)
        assert reg[fmt]["encode"] is codecs.CODECS[fmt]["encode"]
    # uncompressed formats untouched: already numpy-speed in pure form
    assert "tier" not in reg["ppm"] and "tier" not in reg["bmp"]
    # idempotent: a second call does nothing
    assert fast_codecs.register_accelerated_codecs(reg) == []
    assert reg["png"]["pure_decode"] is codecs.CODECS["png"]["decode"]


def test_register_noop_without_pillow(monkeypatch):
    monkeypatch.setattr(fast_codecs, "HAVE_PILLOW", False)
    reg = {f: dict(e) for f, e in codecs.CODECS.items()}
    assert fast_codecs.register_accelerated_codecs(reg) == []
    assert reg["jpeg"]["decode"] is codecs.CODECS["jpeg"]["decode"]
    assert "tier" not in reg["jpeg"]


def test_pure_codecs_env_pins_pure_tier(fake_pillow, monkeypatch):
    monkeypatch.setenv("NSL_KDD_SPARK_PURE_CODECS", "1")
    reg = {f: dict(e) for f, e in codecs.CODECS.items()}
    assert fast_codecs.register_accelerated_codecs(reg) == []
    assert reg["jpeg"]["decode"] is codecs.CODECS["jpeg"]["decode"]


def test_decode_image_uses_registered_tier(fake_pillow, monkeypatch):
    """decode_image (and so decode_media / media signatures above it)
    picks up whatever decode the registry holds — the seam is the
    dispatch point, no caller branches on the tier."""
    fast_codecs.register_accelerated_codecs(codecs.CODECS)
    try:
        payload = codecs.jpeg_encode(_rgb())
        out = codecs.decode_image(payload)
        assert np.array_equal(out, _FakeImage.MARKER)
        # typed failure policy preserved through the fast tier: the
        # payload must sniff as a known format to reach the decoder
        with pytest.raises(codecs.UnsupportedMediaError, match="corrupt"):
            fast_codecs._pil_decode(b"corrupt")
    finally:
        for fmt in fast_codecs.ACCELERATABLE:
            entry = codecs.CODECS[fmt]
            if "pure_decode" in entry:
                entry["decode"] = entry.pop("pure_decode")
                entry.pop("tier", None)


def test_module_autodetect_matches_environment():
    """codecs.ACCELERATED reflects reality: empty exactly when Pillow
    is not importable (this container) or the pure pin is set."""
    try:
        import PIL.Image  # noqa: F401
        have = True
    except ImportError:
        have = False
    import os
    if not have or os.environ.get("NSL_KDD_SPARK_PURE_CODECS"):
        assert codecs.ACCELERATED == []
    else:
        assert set(codecs.ACCELERATED) <= set(fast_codecs.ACCELERATABLE)


# --- acceptance-set parity (round-8 advisory; runs WITHOUT Pillow) ---
# The tier swap must not change which payloads are ACCEPTED, only how
# fast they decode. The checked decoders pre-screen headers against
# the pure subset; these tests pin checker-vs-pure agreement on both
# sides of the boundary using hand-built payloads, so the contract is
# enforced on Pillow-less hosts too.

import struct
import zlib


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))


def _make_png(w=6, h=4, color=2, depth=8, interlace=0) -> bytes:
    """Minimal spec-conformant PNG of any IHDR geometry — including
    configurations the pure tier rejects (16-bit, interlaced)."""
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace)
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color]
    bpp = ch * max(depth // 8, 1)
    raw = b"".join(
        b"\x00" + bytes((x * 7 + y * 13) % 256 for x in range(w * bpp))
        for y in range(h)
    )
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if color == 3:
        out += _chunk(b"PLTE", bytes(
            v for i in range(256) for v in (i, (i * 3) % 256, (i * 7) % 256)
        ))
    return out + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")


def test_png_checker_accepts_exactly_the_pure_subset():
    # inside the subset: pure decodes AND the checker passes
    for color in (0, 2, 3, 6):
        payload = _make_png(color=color)
        assert codecs.png_decode(payload).shape == (4, 6, 3)
        fast_codecs._check_png_subset(payload)  # no raise
    # outside the subset: BOTH reject (PIL alone would accept these)
    for bad in (
        _make_png(depth=16),            # 16-bit depth
        _make_png(interlace=1),         # Adam7
        _make_png(color=4),             # gray+alpha (unsupported type)
    ):
        with pytest.raises(codecs.UnsupportedMediaError):
            codecs.png_decode(bad)
        with pytest.raises(codecs.UnsupportedMediaError):
            fast_codecs._check_png_subset(bad)


def test_jpeg_checker_accepts_exactly_the_pure_subset():
    payload = codecs.jpeg_encode(_rgb(16, 16), quality=90)
    assert codecs.jpeg_decode(payload).shape == (16, 16, 3)
    fast_codecs._check_jpeg_subset(payload)  # no raise
    # rewrite SOF0 -> SOF2: a progressive JPEG PIL would decode
    assert b"\xff\xc0" in payload
    progressive = payload.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(codecs.UnsupportedMediaError, match="progressive"):
        codecs.jpeg_decode(progressive)
    with pytest.raises(codecs.UnsupportedMediaError, match="progressive"):
        fast_codecs._check_jpeg_subset(progressive)
    # extended sequential (SOF5) — both reject
    sof5 = payload.replace(b"\xff\xc0", b"\xff\xc5", 1)
    with pytest.raises(codecs.UnsupportedMediaError):
        codecs.jpeg_decode(sof5)
    with pytest.raises(codecs.UnsupportedMediaError):
        fast_codecs._check_jpeg_subset(sof5)


def test_checked_decoders_reject_before_pil(fake_pillow):
    """The registered (checked) decoder rejects out-of-subset payloads
    even when the provider would happily decode them — the fake PIL
    here accepts anything, so a pass-through would return MARKER."""
    with pytest.raises(codecs.UnsupportedMediaError, match="interlace"):
        fast_codecs._pil_decode_png(_make_png(interlace=1))
    payload = codecs.jpeg_encode(_rgb(16, 16), quality=90)
    with pytest.raises(codecs.UnsupportedMediaError, match="progressive"):
        fast_codecs._pil_decode_jpeg(
            payload.replace(b"\xff\xc0", b"\xff\xc2", 1))
    # in-subset payloads flow through to the provider
    assert np.array_equal(
        fast_codecs._pil_decode_jpeg(payload), _FakeImage.MARKER)
    assert np.array_equal(
        fast_codecs._pil_decode_png(_make_png()), _FakeImage.MARKER)


def test_pillow_png_parity_across_color_types():
    """Round-8 advisory: the bit-identical contract is parity-tested
    over the WHOLE accepted subset (gray/palette/RGBA, not just plain
    RGB). Requires Pillow; skips here."""
    pytest.importorskip("PIL.Image")
    for color in (0, 2, 3, 6):
        payload = _make_png(color=color)
        assert np.array_equal(fast_codecs._pil_decode_png(payload),
                              codecs.png_decode(payload)), color
