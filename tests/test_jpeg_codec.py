"""Baseline JPEG codec (functions/jpeg.py): numpy+stdlib implementation
of T.81 sequential DCT — encode/decode round-trip within the PROVEN
quantization bound, marker framing, Huffman canonical tables, and the
ValueError quarantine contract shared with decode_png."""

from __future__ import annotations

import numpy as np
import pytest

from trike_spark.functions.jpeg import (
    _fdct,
    _idct,
    _canonical_codes,
    _AC_LUM_BITS,
    _AC_LUM_VALS,
    _DC_LUM_BITS,
    _DC_LUM_VALS,
    decode_jpeg_baseline,
    encode_jpeg_baseline,
    roundtrip_error_bound,
)

RNG = np.random.default_rng(20260816)


def test_dct_is_orthonormal_inverse():
    blocks = RNG.standard_normal((10, 8, 8))
    assert np.allclose(_idct(_fdct(blocks)), blocks, atol=1e-10)
    # Parseval: orthonormal transform preserves energy
    assert np.allclose(
        (blocks**2).sum(axis=(1, 2)), (_fdct(blocks) ** 2).sum(axis=(1, 2))
    )


def test_canonical_huffman_tables_are_prefix_free():
    for bits, vals in ((_DC_LUM_BITS, _DC_LUM_VALS), (_AC_LUM_BITS, _AC_LUM_VALS)):
        codes = _canonical_codes(bits, vals)
        assert len(codes) == len(vals)
        as_strings = {f"{c:0{ln}b}" for c, ln in codes.values()}
        assert len(as_strings) == len(codes)  # distinct
        for a in as_strings:
            for b in as_strings:
                if a is not b and len(a) < len(b):
                    assert not b.startswith(a), f"{a} prefixes {b}"


@pytest.mark.parametrize("quality", [50, 75, 90, 100])
def test_gray_roundtrip_within_proven_bound(quality):
    bound = roundtrip_error_bound(quality)
    for shape in [(16, 16), (24, 40), (20, 12), (8, 8), (9, 17)]:
        x = RNG.integers(0, 256, shape, dtype=np.uint8)
        w, h, c, out = decode_jpeg_baseline(encode_jpeg_baseline(x, quality))
        assert (w, h, c) == (shape[1], shape[0], 1)
        assert out.shape == shape
        err = np.abs(out.astype(int) - x.astype(int)).max()
        assert err <= bound, f"q{quality} {shape}: err {err} > proven {bound}"


def test_gray_smooth_content_is_near_exact_at_q90():
    # smooth gradients quantize to DC + small AC: error should be tiny,
    # far inside the worst-case bound (sanity that the pipeline doesn't
    # ride the bound)
    x = (np.linspace(0, 200, 40)[None, :] + np.linspace(0, 40, 24)[:, None]).astype(
        np.uint8
    )
    _, _, _, out = decode_jpeg_baseline(encode_jpeg_baseline(x, 90))
    assert np.abs(out.astype(int) - x.astype(int)).max() <= 2


def test_rgb_roundtrip():
    x = RNG.integers(0, 256, (17, 23, 3), dtype=np.uint8)
    w, h, c, out = decode_jpeg_baseline(encode_jpeg_baseline(x, 95))
    assert (w, h, c) == (23, 17, 3)
    assert out.shape == (17, 23, 3)
    # color adds YCbCr transform rounding on top of the luma-only bound;
    # at q95 noise stays well under the q95 luma bound + transform slack
    err = np.abs(out.astype(int) - x.astype(int)).max()
    assert err <= roundtrip_error_bound(95) + 8


def test_encode_is_deterministic():
    x = RNG.integers(0, 256, (16, 16), dtype=np.uint8)
    assert encode_jpeg_baseline(x, 90) == encode_jpeg_baseline(x, 90)


def test_bitstream_is_marker_clean():
    # every 0xFF inside the entropy segment must be stuffed; the decoder
    # round-trip above proves readability, this pins the container shape
    data = encode_jpeg_baseline(RNG.integers(0, 256, (16, 16), dtype=np.uint8), 90)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    assert b"JFIF" in data[:30]


@pytest.mark.parametrize(
    "mutate, match",
    [
        (lambda d: b"nope" + d[4:], "missing SOI"),
        (lambda d: d[: len(d) // 3], "truncated"),
        (lambda d: d[:-6], "truncated JPEG entropy stream"),
        # flip SOF0 (0xC0) to SOF2: the baseline scan header (Ss=0,
        # Se=63) is an ILLEGAL progressive scan — since round 10 the
        # decoder accepts real SOF2 streams, so the quarantine trigger
        # here is the scan-validation error, not the marker itself
        (
            lambda d: d.replace(b"\xff\xc0", b"\xff\xc2", 1),
            "invalid progressive scan",
        ),
    ],
)
def test_quarantine_contract_valueerror(mutate, match):
    good = encode_jpeg_baseline(RNG.integers(0, 256, (16, 16), dtype=np.uint8), 90)
    with pytest.raises(ValueError, match=match):
        decode_jpeg_baseline(mutate(good))


def test_error_bound_monotone_in_quality():
    bounds = [roundtrip_error_bound(q) for q in (10, 30, 50, 75, 90, 100)]
    assert bounds == sorted(bounds, reverse=True)
    assert bounds[-1] >= 1  # never claims exactness


# --- 4:2:0 chroma subsampling (round 9) --------------------------------------


def _block_constant_rgb(bh, bw, seed=0):
    """RGB image constant on each 2x2 pixel block — the input class for
    which 4:2:0 subsampling is provably lossless (box average of four
    equal values), so roundtrip_error_bound_color applies exactly."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (bh, bw, 3), dtype=np.uint8)
    return np.repeat(np.repeat(base, 2, axis=0), 2, axis=1)


@pytest.mark.parametrize("quality", [50, 75, 90, 100])
def test_420_blockconstant_roundtrip_within_color_bound(quality):
    from trike_spark.functions.jpeg import roundtrip_error_bound_color

    bound = roundtrip_error_bound_color(quality)
    for bh, bw in [(5, 4), (8, 8), (3, 11), (9, 7)]:
        x = _block_constant_rgb(bh, bw, seed=bh * 100 + bw)
        w, h, c, out = decode_jpeg_baseline(
            encode_jpeg_baseline(x, quality, subsampling="4:2:0")
        )
        assert (w, h, c) == (x.shape[1], x.shape[0], 3)
        err = np.abs(out.astype(int) - x.astype(int)).max()
        assert err <= bound, f"q{quality} {x.shape}: err {err} > proven {bound}"


def test_444_rgb_roundtrip_within_color_bound_any_input():
    from trike_spark.functions.jpeg import roundtrip_error_bound_color

    x = RNG.integers(0, 256, (19, 27, 3), dtype=np.uint8)
    _, _, _, out = decode_jpeg_baseline(encode_jpeg_baseline(x, 90))
    assert np.abs(out.astype(int) - x.astype(int)).max() <= roundtrip_error_bound_color(90)


def test_420_odd_dims_pad_and_crop():
    # dims that are multiples of neither 16 nor 2: the MCU pad/crop path
    x = _block_constant_rgb(7, 9)[:13, :17]
    w, h, c, out = decode_jpeg_baseline(
        encode_jpeg_baseline(x, 90, subsampling="4:2:0")
    )
    assert (w, h, c) == (17, 13, 3) and out.shape == (13, 17, 3)


def test_420_actually_subsamples():
    # the SOF must carry 2x2 Y sampling and the chroma payload must shrink
    # for chroma-detailed content
    x = RNG.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    sub = encode_jpeg_baseline(x, 90, subsampling="4:2:0")
    full = encode_jpeg_baseline(x, 90)
    i = sub.find(b"\xff\xc0")
    assert sub[i + 11] == 0x22  # Y sampling factors 2x2
    assert full[full.find(b"\xff\xc0") + 11] == 0x11
    assert len(sub) < len(full)


def test_420_gray_content_matches_luma_bound():
    # r=g=b input: chroma planes are exactly 128, the chroma path
    # contributes nothing, and the grayscale luma bound applies to RGB
    g = RNG.integers(0, 256, (20, 24), dtype=np.uint8)
    x = np.stack([g, g, g], axis=-1)
    _, _, _, out = decode_jpeg_baseline(
        encode_jpeg_baseline(x, 90, subsampling="4:2:0")
    )
    assert np.abs(out.astype(int) - x.astype(int)).max() <= roundtrip_error_bound(90) + 1


def test_unsupported_sampling_factor_quarantines():
    enc = bytearray(encode_jpeg_baseline(_block_constant_rgb(4, 4), 90, subsampling="4:2:0"))
    i = enc.find(b"\xff\xc0")
    enc[i + 11] = 0x33
    with pytest.raises(ValueError, match="sampling factors 3x3"):
        decode_jpeg_baseline(bytes(enc))


def test_encoder_rejects_unknown_subsampling():
    with pytest.raises(ValueError, match="subsampling"):
        encode_jpeg_baseline(_block_constant_rgb(4, 4), 90, subsampling="4:1:1")


def test_parse_jpeg_header_matches_encode_params():
    from trike_spark.functions.jpeg import parse_jpeg_header

    x = RNG.integers(0, 256, (11, 13), dtype=np.uint8)
    for q, want_q00 in [(50, 16), (60, 13), (70, 10), (80, 6), (90, 3)]:
        info = parse_jpeg_header(encode_jpeg_baseline(x, q))
        assert info["width"] == 13 and info["height"] == 11
        assert info["components"] == 1 and info["n_dht"] == 2
        assert info["q00"] == want_q00
    rgb = RNG.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    info = parse_jpeg_header(encode_jpeg_baseline(rgb, 90, subsampling="4:2:0"))
    assert info["components"] == 3 and info["n_dht"] == 4


def test_parse_jpeg_header_quarantines_bad_bytes():
    from trike_spark.functions.jpeg import parse_jpeg_header

    good = encode_jpeg_baseline(RNG.integers(0, 256, (8, 8), dtype=np.uint8), 90)
    with pytest.raises(ValueError, match="missing SOI"):
        parse_jpeg_header(b"nope" + good[4:])
    # cut after APP0: headers simply end -> missing mandatory segments;
    # cut mid-segment -> truncated. Both are the quarantine ValueError.
    with pytest.raises(ValueError, match="missing SOF0/DQT"):
        parse_jpeg_header(good[:20])
    with pytest.raises(ValueError, match="truncated"):
        parse_jpeg_header(good[:30])
    # SOF2 is a supported frame kind since round 10: the catalog reports
    # it as a typed flag instead of quarantining (decode handles it too)
    info = parse_jpeg_header(good.replace(b"\xff\xc0", b"\xff\xc2", 1))
    assert info["progressive"] is True
    assert parse_jpeg_header(good)["progressive"] is False
