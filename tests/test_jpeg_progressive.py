"""Progressive JPEG (SOF2) codec certification.

The load-bearing property: ``encode_jpeg_progressive`` shares the
quantization front half with the baseline encoder, so a progressive
stream carries IDENTICAL quantized coefficients to the baseline stream
of the same (pixels, quality, subsampling) — and the decoder must
therefore reconstruct BIT-IDENTICAL pixels from both. That turns a
lossy multi-scan codec into an exactly-checkable one: any error in the
scan script, EOB-run accounting, successive-approximation bit plumbing,
or table generation shows up as a pixel mismatch against the
already-certified baseline path.

Reference parity note: the reference proxy (mbta/trike) has no imaging
surface at all — this is extension-surface coverage for web-crawled
training corpora, where progressive is the second-most-common JPEG
layout after baseline 4:2:0.
"""

from __future__ import annotations

import numpy as np
import pytest

from trike_spark.functions.jpeg import (
    decode_jpeg_baseline,
    encode_jpeg_baseline,
    encode_jpeg_progressive,
    parse_jpeg_header,
    roundtrip_error_bound,
    roundtrip_error_bound_color,
)

RNG = np.random.default_rng(2024)


@pytest.mark.parametrize("quality", [30, 50, 75, 90, 95])
@pytest.mark.parametrize("shape", [(8, 8), (11, 13), (24, 17), (40, 33)])
def test_progressive_grayscale_bit_identical_to_baseline(quality, shape):
    x = RNG.integers(0, 256, shape, dtype=np.uint8)
    base = decode_jpeg_baseline(encode_jpeg_baseline(x, quality))
    prog = decode_jpeg_baseline(encode_jpeg_progressive(x, quality))
    assert base[:3] == prog[:3]
    assert np.array_equal(base[3], prog[3])


@pytest.mark.parametrize("quality", [30, 50, 75, 90, 95])
@pytest.mark.parametrize("sub", ["4:4:4", "4:2:0"])
def test_progressive_color_bit_identical_to_baseline(quality, sub):
    x = RNG.integers(0, 256, (21, 26, 3), dtype=np.uint8)
    base = decode_jpeg_baseline(encode_jpeg_baseline(x, quality, sub))
    prog = decode_jpeg_baseline(encode_jpeg_progressive(x, quality, sub))
    assert base[:3] == prog[:3]
    assert np.array_equal(base[3], prog[3])


def test_progressive_randomized_sweep():
    """Randomized shapes/qualities/content — the shotgun that catches
    EOB-run/ZRL/correction-bit edge cases the fixed cases miss."""
    rng = np.random.default_rng(7)
    for _ in range(40):
        h, w = int(rng.integers(1, 50)), int(rng.integers(1, 50))
        gray = bool(rng.integers(0, 2))
        q = int(rng.integers(25, 98))
        sub = "4:2:0" if (not gray and rng.integers(0, 2)) else "4:4:4"
        x = rng.integers(0, 256, (h, w) if gray else (h, w, 3), dtype=np.uint8)
        base = decode_jpeg_baseline(encode_jpeg_baseline(x, q, sub))
        prog = decode_jpeg_baseline(encode_jpeg_progressive(x, q, sub))
        assert base[:3] == prog[:3], (h, w, gray, q, sub)
        assert np.array_equal(base[3], prog[3]), (h, w, gray, q, sub)


def test_progressive_eob_runs_across_blocks():
    """A constant image zeroes every AC band, so each AC scan is one
    long cross-block EOB run (the EOBn path with n > 0 in both encoder
    and decoder); a smooth gradient exercises runs broken by sparse
    low-frequency coefficients."""
    const = np.full((64, 48, 3), 130, dtype=np.uint8)
    grad = (
        np.linspace(0, 255, 64 * 48).reshape(64, 48).astype(np.uint8)
    )
    for x, sub in [(const, "4:2:0"), (const, "4:4:4"), (grad, "4:4:4")]:
        base = decode_jpeg_baseline(encode_jpeg_baseline(x, 90, sub))
        prog = decode_jpeg_baseline(encode_jpeg_progressive(x, 90, sub))
        assert np.array_equal(base[3], prog[3])


def test_progressive_respects_roundtrip_error_bounds():
    """Bit-identity to baseline means the PROVEN error bounds transfer
    verbatim; check directly anyway (grayscale any input; color on the
    2x2-block-constant class where 4:2:0 is lossless)."""
    g = RNG.integers(0, 256, (16, 16), dtype=np.uint8)
    _, _, _, out = decode_jpeg_baseline(encode_jpeg_progressive(g, 85))
    assert int(np.abs(out.astype(int) - g.astype(int)).max()) <= roundtrip_error_bound(85)

    base = RNG.integers(0, 256, (6, 5, 3), dtype=np.uint8)
    rgb = np.repeat(np.repeat(base, 2, axis=0), 2, axis=1)
    _, _, _, out = decode_jpeg_baseline(
        encode_jpeg_progressive(rgb, 90, subsampling="4:2:0")
    )
    assert int(np.abs(out.astype(int) - rgb.astype(int)).max()) <= roundtrip_error_bound_color(90)


def test_progressive_header_catalog_fields():
    x = RNG.integers(0, 256, (12, 18, 3), dtype=np.uint8)
    data = encode_jpeg_progressive(x, 80, subsampling="4:2:0")
    info = parse_jpeg_header(data)
    assert info["width"] == 18 and info["height"] == 12
    assert info["components"] == 3
    assert info["progressive"] is True
    # the q00 quality law holds for the shared quantizer: q=80 -> s=40
    assert info["q00"] == (16 * (200 - 2 * 80) + 50) // 100


def test_progressive_container_shape():
    data = encode_jpeg_progressive(RNG.integers(0, 256, (9, 9), dtype=np.uint8), 90)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    assert b"\xff\xc2" in data  # SOF2
    # multi-scan: a grayscale simple progression has 6 SOS markers
    assert data.count(b"\xff\xda") >= 6


def test_progressive_quarantine_contract():
    good = encode_jpeg_progressive(RNG.integers(0, 256, (16, 16), dtype=np.uint8), 90)
    with pytest.raises(ValueError, match="missing SOI"):
        decode_jpeg_baseline(b"nope" + good[4:])
    with pytest.raises(ValueError):
        decode_jpeg_baseline(good[: len(good) // 2])
    with pytest.raises(ValueError):
        decode_jpeg_baseline(good[:-8])


def test_progressive_encoder_determinism():
    x = RNG.integers(0, 256, (10, 14, 3), dtype=np.uint8)
    assert encode_jpeg_progressive(x, 75) == encode_jpeg_progressive(x, 75)
