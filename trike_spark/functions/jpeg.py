"""JPEG codec (ITU-T T.81: sequential baseline DCT AND progressive
DCT, Huffman) in numpy + stdlib — no PIL/libjpeg.

Round 7 left JPEG as the one image format with a stub kernel ("blocked
on environment: PIL/ffmpeg are absent"). Baseline JPEG needs neither:
the whole pipeline — level shift, 8×8 forward/inverse DCT, quality-
scaled quantization (the libjpeg scaling convention), zigzag, DC
prediction, the Annex K.3 Huffman tables, byte stuffing, JFIF marker
framing — is arithmetic and table lookups, all expressible in numpy and
``struct``. This module implements:

* ``encode_jpeg_baseline(pixels, quality, subsampling)`` — grayscale
  (h, w) or RGB (h, w, 3) uint8 → a spec-compliant baseline JFIF
  bytestream. 4:4:4 (default) or 4:2:0 chroma subsampling (2×2 box
  average, MCU-interleaved scan), standard Annex K Huffman tables, one
  scan, no restart markers.
* ``encode_jpeg_progressive(pixels, quality, subsampling)`` — the same
  pixels/quality/subsampling surface emitting a PROGRESSIVE (SOF2)
  stream: the standard simple-progression scan script (interleaved
  DC-first with one point-transform bit, banded AC-first scans, DC and
  AC refinement passes — T.81 Annex G), with Huffman tables generated
  per Annex K.2 (the sample tables carry no EOBn symbols, so generated
  tables are mandatory for progressive). Because it shares the
  quantization front half with the baseline encoder, the two encodings
  carry IDENTICAL coefficients and decode bit-identically — the
  round-trip certification the tests assert.
* ``decode_jpeg_baseline(data)`` — parses SOI/APP/DQT/SOF0|SOF2/DHT/
  SOS, canonical Huffman decode (MCU-interleaved for subsampled
  streams; multi-scan spectral-selection + successive-approximation
  accumulation for progressive, round 10), dequantize, inverse zigzag,
  IDCT, chroma upsample (pixel replication), YCbCr → RGB. Returns
  (width, height, components, uint8 array). Sampling factors
  h, v ∈ {1, 2} are accepted — that covers 4:4:4, 4:2:0 (the dominant
  real-world layout), 4:2:2 and 4:4:0. Raises ``ValueError`` — the
  quarantine contract shared with ``codecs.decode_png`` — for
  arithmetic-coded, hierarchical, 12-bit, factor-3/4-sampled,
  restart-interval, or truncated/corrupt streams, never a raw
  struct/index error that would kill a Spark task.
* ``roundtrip_error_bound(quality)`` — a PROVEN per-pixel bound on
  |decode(encode(x)) − x| for grayscale input, derived from the
  quantization table (see the function docstring). The Spark face
  certifies measured error ≤ this bound under the driver hash, which is
  how a lossy codec gets an exact oracle.
* ``roundtrip_error_bound_color(quality)`` — the RGB companion: valid
  for any RGB input at 4:4:4, and at 4:2:0 for inputs whose chroma is
  constant on each 2×2 pixel block (the box average of four equal
  values is exact, so subsampling is lossless for that input class —
  which is how the lossy SUBSAMPLED path gets an exact oracle too).

JPEG is lossy, so unlike PNG there is no byte-identity to certify;
the certification face instead checks dimensions exactly and error
against the provable bound.

Scale posture: identical to the PNG path — the codec runs per row
inside Arrow-batched ``mapInPandas`` (embarrassingly parallel, no
shuffle); block DCTs are batched as (n_blocks, 8, 8) einsums. The
ENCODER's entropy stage is fully vectorized as of round 9 (whole-image
Huffman symbol stream as numpy arrays + one ``_pack_bits`` pass —
measured 21× on a 256×256 image, bit-identical output); the DECODER
uses a de-stuffed segment + 16-bit-lookahead LUT (libjpeg's classic
acceleration — 1.4-1.6× measured, output identical), but canonical
Huffman decode is inherently bit-serial, so its per-SYMBOL Python loop
is the one remaining constant-factor ceiling, and a production
deployment swaps in libjpeg through the same
(bytes) -> (w, h, c, array) signature.
"""

from __future__ import annotations

import struct

import numpy as np

# --- tables (ITU-T T.81 Annex K) -------------------------------------------

# K.1 luminance quantization table, in natural (row-major) order
_QLUM = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)

# K.2 chrominance quantization table
_QCHROM = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int64,
)

# zigzag: _ZIGZAG[k] = flat index into the 8x8 block of the k-th coefficient
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)
_UNZIGZAG = np.argsort(_ZIGZAG)

# K.3 Huffman table specifications: (BITS counts per code length 1..16,
# HUFFVAL symbol list). These four tables are what every baseline
# encoder ships.
_DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUM_VALS = list(range(12))
_DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROM_VALS = list(range(12))
_AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
_AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119]
_AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) per T.81 C.2 canonical construction."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling: 50 → the Annex K table, 100 → all ones."""
    if not 1 <= quality <= 100:
        raise ValueError(f"quality must be 1..100, got {quality}")
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (table * s + 50) // 100
    return np.clip(q, 1, 255).astype(np.int64)


# orthonormal DCT-II matrix: row u, col x — C @ block @ C.T is the JPEG FDCT
_C = np.array(
    [
        [
            (np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8))
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _fdct(blocks: np.ndarray) -> np.ndarray:
    """(n, 8, 8) spatial → (n, 8, 8) DCT coefficients (batched einsum)."""
    return np.einsum("ux,nxy,vy->nuv", _C, blocks, _C)


def _idct(coefs: np.ndarray) -> np.ndarray:
    """X = Cᵀ F C — the exact inverse of :func:`_fdct` (C is orthonormal)."""
    return np.einsum("ux,nuv,vy->nxy", _C, coefs, _C)


def roundtrip_error_bound(quality: int) -> int:
    """Provable per-pixel bound on |decode(encode(x)) − x| for GRAYSCALE
    input at the given quality.

    Derivation: the only lossy step is coefficient quantization, which
    perturbs each DCT coefficient by at most q[u,v]/2 (round-to-nearest)
    plus 1/2 from the final spatial-domain rounding. The IDCT basis
    functions are bounded by a(u)·a(v) ≤ 1/2 per sample (a(0) = √(1/8),
    a(u>0) = √(2/8) = 1/2), so a coefficient error of e contributes at
    most e·a(u)·a(v) to any pixel; summing the worst case over all 64
    coefficients:

        max pixel error ≤ Σ_{u,v} a(u)·a(v)·q[u,v]/2 + 1

    (the +1 covers spatial rounding and uint8 clipping at the range
    edges). Extremely conservative — simultaneous worst-case rounding of
    all 64 coefficients with aligned basis signs — but PROVABLE, which is
    what the certification face needs."""
    q = _quality_scale(_QLUM, quality)
    a = np.full(8, np.sqrt(2 / 8))
    a[0] = np.sqrt(1 / 8)
    bound = float(np.sum(np.outer(a, a) * q / 2.0)) + 1.0
    return int(np.ceil(bound))


def roundtrip_error_bound_color(quality: int) -> int:
    """Provable per-pixel RGB bound on |decode(encode(x)) − x|.

    Valid for ANY RGB input at 4:4:4, and at 4:2:0 for inputs whose
    chroma (Cb, Cr) is constant on each 2×2 pixel block — e.g. any image
    that is itself constant per 2×2 block. For that class the box-average
    subsample is exact (mean of four equal doubles is that double), so
    the only lossy steps are again per-plane quantization.

    Derivation: per-plane coefficient error ≤ Σ_{u,v} a(u)a(v)·q[u,v]/2
    exactly as in :func:`roundtrip_error_bound` (call it B_y for the luma
    table, B_c for the chroma table; chroma upsample by replication adds
    nothing). The inverse color transform propagates plane errors to RGB:
    r = y + 1.402·cr′, g = y − 0.344136·cb′ − 0.714136·cr′,
    b = y + 1.772·cb′ — so the worst channel error is
    B_y + max(1.402, 0.344136 + 0.714136, 1.772)·B_c = B_y + 1.772·B_c.
    The +1 covers final round-to-nearest and uint8 clipping."""
    qy = _quality_scale(_QLUM, quality)
    qc = _quality_scale(_QCHROM, quality)
    a = np.full(8, np.sqrt(2 / 8))
    a[0] = np.sqrt(1 / 8)
    aa = np.outer(a, a)
    b_y = float(np.sum(aa * qy / 2.0))
    b_c = float(np.sum(aa * qc / 2.0))
    return int(np.ceil(b_y + 1.772 * b_c + 1.0))


def _to_blocks(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    """(h, w) → (n_blocks, 8, 8) with edge-replication padding; returns
    blocks plus blocks-per-row/col. Block order: raster (row-major)."""
    h, w = plane.shape
    bh, bw = -(-h // 8), -(-w // 8)
    padded = np.pad(plane, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
    blocks = (
        padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(bh * bw, 8, 8)
    )
    return blocks, bh, bw


def _from_blocks(blocks: np.ndarray, bh: int, bw: int, h: int, w: int) -> np.ndarray:
    padded = (
        blocks.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
    )
    return padded[:h, :w]


def _code_arrays(codes: dict[int, tuple[int, int]], n: int) -> tuple[np.ndarray, np.ndarray]:
    """Huffman dict → (code, length) lookup arrays for vectorized gather."""
    c = np.zeros(n, dtype=np.uint32)
    ln = np.zeros(n, dtype=np.int64)
    for sym, (code, length) in codes.items():
        c[sym], ln[sym] = code, length
    return c, ln


def _mag_sizes(v: np.ndarray) -> np.ndarray:
    """Vectorized JPEG magnitude size category: 0 for 0, else bit_length
    of |v| (exact for the < 2^16 coefficient range)."""
    av = np.abs(v)
    return np.where(
        v == 0, 0, np.floor(np.log2(np.maximum(av, 1))).astype(np.int64) + 1
    )


def _mag_codes(v: np.ndarray, sizes: np.ndarray) -> np.ndarray:
    """Vectorized magnitude code: v if positive else v + 2^size − 1."""
    return np.where(v > 0, v, v + (np.int64(1) << sizes) - 1).astype(np.int64)


def _pack_bits(codes: np.ndarray, lengths: np.ndarray) -> bytes:
    """MSB-first variable-length bit packing with T.81 F.1.2.3 byte
    stuffing (0xFF → 0xFF 0x00) and 1-fill padding of the final byte —
    one vectorized pass over the whole entropy-coded segment (the former
    per-symbol BitWriter loop was the codec's documented constant-factor
    ceiling). Zero-length entries contribute nothing (np.repeat drops
    them), so callers can pass unfiltered symbol streams."""
    lengths = lengths.astype(np.int64)
    total = int(lengths.sum())
    pad = (-total) % 8
    if pad:
        codes = np.append(codes.astype(np.int64), (1 << pad) - 1)
        lengths = np.append(lengths, pad)
        total += pad
    starts = np.cumsum(lengths) - lengths
    sym = np.repeat(np.arange(len(codes)), lengths)
    within = np.arange(total) - np.repeat(starts, lengths)
    shift = lengths[sym] - 1 - within
    bits = ((codes.astype(np.int64)[sym] >> shift) & 1).astype(np.uint8)
    by = np.packbits(bits)
    ff = np.nonzero(by == 0xFF)[0]
    if len(ff):
        by = np.insert(by, ff + 1, 0)
    return by.tobytes()


def _component_symbols(
    zzv: np.ndarray,
    scan_pos: np.ndarray,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> tuple[np.ndarray, ...]:
    """Huffman symbol stream for one component's blocks (already in scan
    visit order): returns (scan_pos, k, rank, code, length) arrays, where
    (scan_pos, k, rank) is the lexicographic key that interleaves the
    streams of all components into the exact T.81 bit order. Everything
    is numpy over the whole component — no per-coefficient Python."""
    dc_c, dc_l = _code_arrays(dc_codes, 12)
    ac_c, ac_l = _code_arrays(ac_codes, 256)
    n = zzv.shape[0]

    # DC: differential against the previous visited block of THIS component
    dc = zzv[:, 0]
    diff = dc - np.concatenate(([0], dc[:-1]))
    ds = _mag_sizes(diff)
    dc_sym = (scan_pos, np.zeros(n, np.int64), np.zeros(n, np.int64),
              dc_c[ds].astype(np.int64), dc_l[ds])
    dc_mag = (scan_pos, np.zeros(n, np.int64), np.ones(n, np.int64),
              _mag_codes(diff, ds), ds)

    # AC: run-length over the 63 zigzag positions, all blocks at once
    b_idx, k1 = np.nonzero(zzv[:, 1:])
    k = (k1 + 1).astype(np.int64)
    vals = zzv[b_idx, k]
    first = np.ones(len(k), dtype=bool)
    if len(k):
        first[1:] = b_idx[1:] != b_idx[:-1]
    prev_k = np.where(first, 0, np.concatenate(([0], k[:-1])))
    run = k - prev_k - 1
    nzrl = run >> 4  # ZRL (0xF0) emitted per 16 preceding zeros
    rem = run & 15
    zrl_rep = nzrl.astype(np.int64)
    zrl = (np.repeat(scan_pos[b_idx], zrl_rep), np.repeat(k, zrl_rep),
           np.zeros(int(zrl_rep.sum()), np.int64),
           np.full(int(zrl_rep.sum()), int(ac_c[0xF0]), np.int64),
           np.full(int(zrl_rep.sum()), int(ac_l[0xF0]), np.int64))
    s = _mag_sizes(vals)
    symbol = (rem << 4) | s
    ac_sym = (scan_pos[b_idx], k, np.ones(len(k), np.int64),
              ac_c[symbol].astype(np.int64), ac_l[symbol])
    ac_mag = (scan_pos[b_idx], k, np.full(len(k), 2, np.int64),
              _mag_codes(vals, s), s)

    # EOB where the last nonzero AC index < 63 (row-major np.nonzero means
    # the final write per block below is its maximum k)
    last_nz = np.zeros(n, dtype=np.int64)
    last_nz[b_idx] = k
    eob_mask = last_nz < 63
    ne = int(eob_mask.sum())
    eob = (scan_pos[eob_mask], np.full(ne, 64, np.int64),
           np.zeros(ne, np.int64),
           np.full(ne, int(ac_c[0x00]), np.int64),
           np.full(ne, int(ac_l[0x00]), np.int64))

    parts = [dc_sym, dc_mag, zrl, ac_sym, ac_mag, eob]
    return tuple(
        np.concatenate([p[i] for p in parts]).astype(np.int64) for i in range(5)
    )


def _dht_segment(tc_th: int, bits: list[int], vals: list[int]) -> bytes:
    body = bytes([tc_th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _dqt_segment(tq: int, table: np.ndarray) -> bytes:
    body = bytes([tq]) + bytes(int(table.flat[_ZIGZAG[k]]) for k in range(64))
    return b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body


def _prep_quantized(
    pixels: np.ndarray, quality: int, subsampling: str, who: str
) -> tuple[int, int, list[tuple[int, int]], np.ndarray, np.ndarray, list[np.ndarray], list[int], int, int]:
    """Shared encoder front half (validation → color transform →
    subsample → FDCT → quantize → zigzag): returns
    (h, w, factors, qlum, qchrom, comp_zz, comp_bw, hp, wp). Baseline and
    progressive encode the SAME quantized coefficients — only the scan
    structure differs — which is what makes the progressive round-trip
    certifiable bit-identical against the baseline decode."""
    if pixels.dtype != np.uint8:
        raise ValueError(f"{who} wants uint8, got {pixels.dtype}")
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    if pixels.ndim == 2:
        planes = [pixels.astype(np.float64)]
        factors = [(1, 1)]
    elif pixels.ndim == 3 and pixels.shape[2] == 3:
        r, g, b = (pixels[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
        factors = (
            [(2, 2), (1, 1), (1, 1)]
            if subsampling == "4:2:0"
            else [(1, 1)] * 3
        )
    else:
        raise ValueError(f"unsupported pixel shape {pixels.shape}")
    h, w = pixels.shape[:2]
    qlum = _quality_scale(_QLUM, quality)
    qchrom = _quality_scale(_QCHROM, quality)
    qtabs = [qlum] + [qchrom] * (len(planes) - 1)

    # quantized zigzag coefficients per component, block raster order;
    # every plane is padded (edge replication) to the MCU grid, and
    # lower-sampled components are box-averaged down before blocking
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcu_h, mcu_w = 8 * vmax, 8 * hmax
    hp, wp = -(-h // mcu_h) * mcu_h, -(-w // mcu_w) * mcu_w
    comp_zz = []
    comp_bw = []
    for ci, plane in enumerate(planes):
        hi, vi = factors[ci]
        p = np.pad(plane, ((0, hp - h), (0, wp - w)), mode="edge")
        fy, fx = vmax // vi, hmax // hi
        if fy != 1 or fx != 1:
            p = p.reshape(p.shape[0] // fy, fy, p.shape[1] // fx, fx).mean(
                axis=(1, 3)
            )
        blocks, _, bw_i = _to_blocks(p)  # p already 8-aligned: no extra pad
        coefs = _fdct(blocks - 128.0)
        qz = np.round(coefs / qtabs[ci]).astype(np.int64)
        comp_zz.append(qz.reshape(-1, 64)[:, _ZIGZAG])
        comp_bw.append(bw_i)
    return h, w, factors, qlum, qchrom, comp_zz, comp_bw, hp, wp


def encode_jpeg_baseline(
    pixels: np.ndarray, quality: int = 90, subsampling: str = "4:4:4"
) -> bytes:
    """Grayscale (h, w) or RGB (h, w, 3) uint8 → baseline JFIF bytes.
    ``subsampling``: "4:4:4" (default; ignored for grayscale) or "4:2:0"
    (chroma 2×2 box-averaged, Y sampled 2×2 per MCU — the dominant
    real-world layout). Annex K Huffman tables, single scan. The 4:4:4
    path is bit-identical to the pre-subsampling encoder (its generic MCU
    loop with all-1×1 factors reduces to plain block raster order)."""
    h, w, factors, qlum, qchrom, comp_zz, comp_bw, hp, wp = _prep_quantized(
        pixels, quality, subsampling, "encode_jpeg_baseline"
    )
    n_comp = len(factors)
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcu_h, mcu_w = 8 * vmax, 8 * hmax

    dc_l = _canonical_codes(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_l = _canonical_codes(_AC_LUM_BITS, _AC_LUM_VALS)
    dc_c = _canonical_codes(_DC_CHROM_BITS, _DC_CHROM_VALS)
    ac_c = _canonical_codes(_AC_CHROM_BITS, _AC_CHROM_VALS)

    # Entropy coding, fully vectorized: per component, gather its blocks
    # in T.81 A.2.3 interleaved visit order, emit the Huffman symbol
    # stream as numpy arrays keyed by (global scan position, zigzag k,
    # rank), then one lexsort interleaves all components and one
    # _pack_bits pass writes the entire scan.
    mcuy, mcux = hp // mcu_h, wp // mcu_w
    n_mcu = mcuy * mcux
    blocks_per_mcu = sum(hi * vi for hi, vi in factors)
    my, mx = np.divmod(np.arange(n_mcu), mcux)
    streams = []
    comp_offset = 0
    for ci in range(n_comp):
        hi, vi = factors[ci]
        dc_codes, ac_codes = (dc_l, ac_l) if ci == 0 else (dc_c, ac_c)
        dys = np.repeat(np.arange(vi), hi)  # within-MCU sub-block raster
        dxs = np.tile(np.arange(hi), vi)
        visit = (
            (my[:, None] * vi + dys[None, :]) * comp_bw[ci]
            + (mx[:, None] * hi + dxs[None, :])
        ).reshape(-1)
        scan_pos = (
            np.arange(n_mcu)[:, None] * blocks_per_mcu
            + comp_offset
            + np.arange(vi * hi)[None, :]
        ).reshape(-1)
        comp_offset += vi * hi
        streams.append(
            _component_symbols(comp_zz[ci][visit], scan_pos, dc_codes, ac_codes)
        )
    spos, ks, ranks, codes, lens = (
        np.concatenate([s[i] for s in streams]) for i in range(5)
    )
    order = np.lexsort((ranks, ks, spos))
    scan_bytes = _pack_bits(codes[order], lens[order])

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += _dqt_segment(0, qlum)
    if n_comp == 3:
        out += _dqt_segment(1, qchrom)
    # SOF0: 8-bit precision, h, w, per-component sampling factors
    sof = struct.pack(">BHHB", 8, h, w, n_comp)
    for ci in range(n_comp):
        hi, vi = factors[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, 0 if ci == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0x00, _DC_LUM_BITS, _DC_LUM_VALS)
    out += _dht_segment(0x10, _AC_LUM_BITS, _AC_LUM_VALS)
    if n_comp == 3:
        out += _dht_segment(0x01, _DC_CHROM_BITS, _DC_CHROM_VALS)
        out += _dht_segment(0x11, _AC_CHROM_BITS, _AC_CHROM_VALS)
    sos = bytes([n_comp])
    for ci in range(n_comp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    out += scan_bytes
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- progressive encoder (T.81 Annex G, spectral selection + successive
# approximation) --------------------------------------------------------------


def _optimal_huffman(freq_in: dict[int, int]) -> tuple[list[int], list[int]]:
    """T.81 Annex K.2 optimal code-length generation (the classic
    two-pass table builder): a pseudo-symbol (256) with frequency 1
    reserves the all-ones codeword, the Adjust_BITS procedure limits
    lengths to 16 bits, and vals lists symbols in (length, value) order.
    Progressive scans NEED generated tables — the Annex K sample tables
    carry no EOBn symbols (n ≥ 1), so EOB runs longer than one block are
    unencodable with them."""
    if not freq_in:
        return [0] * 16, []
    freq = [0] * 257
    for s, f in freq_in.items():
        freq[s] = f
    freq[256] = 1  # reserve the all-1s code (T.81 K.2 / C.2 note)
    codesize = [0] * 257
    others = [-1] * 257
    while True:
        c1 = c2 = -1
        v = None
        for i in range(257):
            if freq[i] and (v is None or freq[i] <= v):
                v, c1 = freq[i], i
        v = None
        for i in range(257):
            if freq[i] and i != c1 and (v is None or freq[i] <= v):
                v, c2 = freq[i], i
        if c2 < 0:
            break
        freq[c1] += freq[c2]
        freq[c2] = 0
        codesize[c1] += 1
        while others[c1] >= 0:
            c1 = others[c1]
            codesize[c1] += 1
        others[c1] = c2
        codesize[c2] += 1
        while others[c2] >= 0:
            c2 = others[c2]
            codesize[c2] += 1
    bits = [0] * 33
    for i in range(257):
        if codesize[i]:
            bits[codesize[i]] += 1
    for i in range(32, 16, -1):  # Adjust_BITS: fold >16-bit lengths down
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
    i = 16
    while bits[i] == 0:
        i -= 1
    bits[i] -= 1  # drop the reserved pseudo-symbol's code
    vals = sorted((s for s in range(256) if codesize[s]), key=lambda s: (codesize[s], s))
    return bits[1:17], vals


class _ScanOps:
    """Recorded symbol/raw-bit stream for one progressive scan. Pass 1
    records ops and counts Huffman symbol frequencies; pass 2 (after the
    optimal tables exist) replays them through :func:`_pack_bits`."""

    __slots__ = ("ops",)

    def __init__(self) -> None:
        self.ops: list[tuple[int, int, int, int]] = []

    def sym(self, tclass: int, tid: int, s: int, freq: dict) -> None:
        self.ops.append((0, tclass, tid, s))
        tbl = freq.setdefault((tclass, tid), {})
        tbl[s] = tbl.get(s, 0) + 1

    def raw(self, value: int, n: int) -> None:
        if n:
            self.ops.append((1, int(value) & ((1 << n) - 1), n, 0))

    def pack(self, codes: dict[tuple[int, int], dict[int, tuple[int, int]]]) -> bytes:
        cs = np.empty(len(self.ops), dtype=np.int64)
        ls = np.empty(len(self.ops), dtype=np.int64)
        for i, (kind, a, b, c) in enumerate(self.ops):
            if kind == 0:
                cs[i], ls[i] = codes[(a, b)][c]
            else:
                cs[i], ls[i] = a, b
        return _pack_bits(cs, ls)


def _emit_dc_first(
    ops: _ScanOps, freq: dict, visit: list[tuple[int, int]],
    comp_zz: list[np.ndarray], tids: dict[int, int], al: int,
) -> None:
    """First DC scan (G.1.2.1): differential DC of ``coef >> Al``
    (arithmetic shift), coded like baseline DC."""
    preds: dict[int, int] = {}
    for ci, b in visit:
        v = int(comp_zz[ci][b, 0]) >> al
        diff = v - preds.get(ci, 0)
        preds[ci] = v
        s = abs(diff).bit_length()
        ops.sym(0, tids[ci], s, freq)
        if s:
            ops.raw(diff if diff > 0 else diff + (1 << s) - 1, s)


def _emit_dc_refine(
    ops: _ScanOps, visit: list[tuple[int, int]],
    comp_zz: list[np.ndarray], al: int,
) -> None:
    """DC refinement (G.1.2.1): one raw bit per block — bit ``Al`` of the
    coefficient's two's-complement value."""
    for ci, b in visit:
        ops.raw((int(comp_zz[ci][b, 0]) >> al) & 1, 1)


def _emit_ac_first(
    ops: _ScanOps, freq: dict, zz: np.ndarray, blocks: list[int],
    tid: int, ss: int, se: int, al: int,
) -> None:
    """First AC scan for one band (G.1.2.2): run-length/size symbols over
    the point-transformed band, EOB runs accumulated across blocks and
    flushed as EOBn symbols."""
    eobrun = 0

    def flush() -> None:
        nonlocal eobrun
        if eobrun:
            n = eobrun.bit_length() - 1
            ops.sym(1, tid, n << 4, freq)
            if n:
                ops.raw(eobrun - (1 << n), n)
            eobrun = 0

    for b in blocks:
        row = zz[b]
        r = 0
        for k in range(ss, se + 1):
            c = int(row[k])
            t = abs(c) >> al  # point transform truncates toward zero
            if t == 0:
                r += 1
                continue
            flush()
            while r > 15:
                ops.sym(1, tid, 0xF0, freq)
                r -= 16
            s = t.bit_length()
            ops.sym(1, tid, (r << 4) | s, freq)
            tv = t if c > 0 else -t
            ops.raw(tv if tv > 0 else tv + (1 << s) - 1, s)
            r = 0
        if r > 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush()
    flush()


def _emit_ac_refine(
    ops: _ScanOps, freq: dict, zz: np.ndarray, blocks: list[int],
    tid: int, ss: int, se: int, al: int,
) -> None:
    """AC refinement scan (G.1.2.3, the jcphuff shape): newly-significant
    coefficients (|coef| >> Al == 1) emit (run, 1) symbols + a sign bit;
    history-nonzero coefficients emit buffered correction bits that
    follow the next symbol; trailing runs and their correction bits fold
    into the cross-block EOB run."""
    eobrun = 0
    pend: list[int] = []  # correction bits riding the EOB run

    def flush() -> None:
        nonlocal eobrun, pend
        if eobrun:
            n = eobrun.bit_length() - 1
            ops.sym(1, tid, n << 4, freq)
            if n:
                ops.raw(eobrun - (1 << n), n)
            for bit in pend:
                ops.raw(bit, 1)
            eobrun = 0
            pend = []

    for b in blocks:
        row = zz[b]
        ts = [abs(int(row[k])) >> al for k in range(ss, se + 1)]
        eob_idx = -1  # last newly-significant index; runs past it fold into EOB
        for k in range(ss, se + 1):
            if ts[k - ss] == 1:
                eob_idx = k
        r = 0
        br: list[int] = []  # correction bits since the last emitted symbol
        for k in range(ss, se + 1):
            t = ts[k - ss]
            if t == 0:
                r += 1
                continue
            while r > 15 and k <= eob_idx:
                flush()
                ops.sym(1, tid, 0xF0, freq)
                r -= 16
                for bit in br:
                    ops.raw(bit, 1)
                br = []
            if t > 1:
                br.append(t & 1)
                continue
            flush()
            ops.sym(1, tid, (r << 4) | 1, freq)
            ops.raw(1 if int(row[k]) > 0 else 0, 1)
            for bit in br:
                ops.raw(bit, 1)
            br = []
            r = 0
        if r > 0 or br:
            eobrun += 1
            pend.extend(br)
            if eobrun == 0x7FFF or len(pend) > 937:
                flush()
    flush()


def _progressive_script(n_comp: int) -> list[tuple[tuple[int, ...], int, int, int, int]]:
    """The standard simple-progression scan script (the shape libjpeg's
    ``jpeg_simple_progression`` emits, which is what web corpora mostly
    contain): an interleaved DC-first scan with one point-transform bit,
    banded AC-first scans, then DC and AC refinement passes. Entries are
    (component indexes, Ss, Se, Ah, Al)."""
    if n_comp == 1:
        return [
            ((0,), 0, 0, 0, 1),
            ((0,), 1, 5, 0, 2),
            ((0,), 6, 63, 0, 2),
            ((0,), 0, 0, 1, 0),
            ((0,), 1, 63, 2, 1),
            ((0,), 1, 63, 1, 0),
        ]
    return [
        ((0, 1, 2), 0, 0, 0, 1),
        ((0,), 1, 5, 0, 2),
        ((2,), 1, 63, 0, 1),
        ((1,), 1, 63, 0, 1),
        ((0,), 6, 63, 0, 2),
        ((0, 1, 2), 0, 0, 1, 0),
        ((0,), 1, 63, 2, 1),
        ((2,), 1, 63, 1, 0),
        ((1,), 1, 63, 1, 0),
        ((0,), 1, 63, 1, 0),
    ]


def encode_jpeg_progressive(
    pixels: np.ndarray, quality: int = 90, subsampling: str = "4:4:4"
) -> bytes:
    """Grayscale (h, w) or RGB (h, w, 3) uint8 → PROGRESSIVE (SOF2) JFIF
    bytes. Same color transform / subsampling / quantization as
    :func:`encode_jpeg_baseline` (shared ``_prep_quantized``), so the two
    encodings carry IDENTICAL quantized coefficients and must decode
    bit-identically — the round-trip certification the tests assert.
    Scan script: simple progression (DC Al=1 → banded AC → DC refine →
    AC refine); Huffman tables are generated per T.81 K.2 because the
    Annex K sample tables lack EOBn symbols."""
    h, w, factors, qlum, qchrom, comp_zz, comp_bw, hp, wp = _prep_quantized(
        pixels, quality, subsampling, "encode_jpeg_progressive"
    )
    n_comp = len(factors)
    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcuy, mcux = hp // (8 * vmax), wp // (8 * hmax)
    tids = {ci: (0 if ci == 0 else 1) for ci in range(n_comp)}

    # interleaved MCU visit order (T.81 A.2.3) for multi-component DC scans
    inter_visit: list[tuple[int, int]] = []
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(n_comp):
                hi, vi = factors[ci]
                for dy in range(vi):
                    for dx in range(hi):
                        inter_visit.append((ci, (my * vi + dy) * (mcux * hi) + (mx * hi + dx)))
    # non-interleaved per-component block lists (T.81 A.2.2: the
    # component's own ceil(x/8) × ceil(y/8) grid, NOT the MCU-padded one)
    comp_blocks: list[list[int]] = []
    for ci in range(n_comp):
        hi, vi = factors[ci]
        cbw = -(-(-(-(w * hi) // hmax)) // 8)  # ceil(ceil(w*hi/hmax)/8)
        cbh = -(-(-(-(h * vi) // vmax)) // 8)
        comp_blocks.append(
            [by * (mcux * hi) + bx for by in range(cbh) for bx in range(cbw)]
        )

    freq: dict[tuple[int, int], dict[int, int]] = {}
    scan_ops: list[_ScanOps] = []
    script = _progressive_script(n_comp)
    for comps_in, ss, se, ah, al in script:
        ops = _ScanOps()
        if ss == 0:
            visit = (
                inter_visit
                if len(comps_in) > 1
                else [(comps_in[0], b) for b in comp_blocks[comps_in[0]]]
            )
            if ah == 0:
                _emit_dc_first(ops, freq, visit, comp_zz, tids, al)
            else:
                _emit_dc_refine(ops, visit, comp_zz, al)
        else:
            (ci,) = comps_in
            if ah == 0:
                _emit_ac_first(ops, freq, comp_zz[ci], comp_blocks[ci], tids[ci], ss, se, al)
            else:
                _emit_ac_refine(ops, freq, comp_zz[ci], comp_blocks[ci], tids[ci], ss, se, al)
        scan_ops.append(ops)

    tables: dict[tuple[int, int], tuple[list[int], list[int]]] = {
        key: _optimal_huffman(f) for key, f in freq.items()
    }
    codes = {
        key: _canonical_codes(bits, vals) for key, (bits, vals) in tables.items()
    }

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += _dqt_segment(0, qlum)
    if n_comp == 3:
        out += _dqt_segment(1, qchrom)
    sof = struct.pack(">BHHB", 8, h, w, n_comp)
    for ci in range(n_comp):
        hi, vi = factors[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, 0 if ci == 0 else 1])
    out += b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + sof  # SOF2
    for (tclass, tid), (bits, vals) in sorted(tables.items()):
        out += _dht_segment((tclass << 4) | tid, bits, vals)
    for (comps_in, ss, se, ah, al), ops in zip(script, scan_ops):
        sos = bytes([len(comps_in)])
        for ci in comps_in:
            td = tids[ci] if (ss == 0 and ah == 0) else 0
            ta = tids[ci] if ss > 0 else 0
            sos += bytes([ci + 1, (td << 4) | ta])
        sos += bytes([ss, se, (ah << 4) | al])
        out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
        out += ops.pack(codes)
    out += b"\xff\xd9"
    return bytes(out)


# --- decoder ----------------------------------------------------------------


def _entropy_segment_ex(data: bytes, pos: int) -> tuple[bytes, int]:
    """Extract the de-stuffed entropy-coded segment starting at ``pos``:
    0xFF 0x00 pairs collapse to 0xFF (T.81 F.1.2.3); the first 0xFF
    followed by any other byte is a real marker (EOI, the next SOS/DHT of
    a progressive stream, or RSTn which this profile never emits) and
    ends the segment. One C-speed scan + one ``bytes.replace`` instead of
    per-bit stuffing checks. Returns (segment, offset of the terminating
    marker) so a multi-scan caller can continue the marker walk."""
    i = pos
    end = len(data)
    while True:
        j = data.find(b"\xff", i)
        if j == -1 or j + 1 >= len(data):
            break
        if data[j + 1] == 0x00:
            i = j + 2
            continue
        end = j
        break
    return data[pos:end].replace(b"\xff\x00", b"\xff"), end


def _entropy_segment(data: bytes, pos: int) -> bytes:
    return _entropy_segment_ex(data, pos)[0]


def _parse_dqt(body: bytes, qtabs: dict[int, np.ndarray]) -> None:
    """DQT segment body → 8-bit quant tables (possibly several per
    segment), de-zigzagged into (8, 8)."""
    off = 0
    while off < len(body):
        pq, tq = body[off] >> 4, body[off] & 0xF
        if pq != 0:
            raise ValueError("unsupported JPEG (16-bit quant table)")
        tab = np.zeros(64, dtype=np.int64)
        tab[_ZIGZAG] = np.frombuffer(body[off + 1 : off + 65], dtype=np.uint8).astype(
            np.int64
        )
        qtabs[tq] = tab.reshape(8, 8)
        off += 65


def _parse_dht(
    body: bytes, huff_dc: dict[int, "_HuffDecoder"], huff_ac: dict[int, "_HuffDecoder"]
) -> None:
    """DHT segment body → cached LUT decoders; progressive streams
    redefine tables between scans, so later definitions replace earlier
    ones (T.81 B.2.4.2)."""
    off = 0
    while off < len(body):
        tc, th = body[off] >> 4, body[off] & 0xF
        bits = list(body[off + 1 : off + 17])
        n = sum(bits)
        vals = list(body[off + 17 : off + 17 + n])
        (huff_dc if tc == 0 else huff_ac)[th] = _huff_decoder(bits, vals)
        off += 17 + n


class _BitReader:
    """MSB-first reader over the de-stuffed entropy segment: a small-int
    accumulator window (all fast CPython int ops, no per-bit function
    calls); raises ValueError on exhaustion (the quarantine contract)."""

    __slots__ = ("data", "pos", "_acc", "_n")

    def __init__(self, entropy: bytes) -> None:
        self.data = entropy
        self.pos = 0
        self._acc = 0
        self._n = 0

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        while self._n < n:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy stream")
            self._acc = (self._acc << 8) | self.data[self.pos]
            self.pos += 1
            self._n += 8
        self._n -= n
        v = (self._acc >> self._n) & ((1 << n) - 1)
        self._acc &= (1 << self._n) - 1
        return v

    def peek16(self) -> int:
        """Zero-padded 16-bit lookahead for the LUT decode; padding is
        inert — an entry whose code length exceeds the remaining real
        bits fails in :meth:`consume` as truncated."""
        while self._n < 16 and self.pos < len(self.data):
            self._acc = (self._acc << 8) | self.data[self.pos]
            self.pos += 1
            self._n += 8
        if self._n >= 16:
            return (self._acc >> (self._n - 16)) & 0xFFFF
        return (self._acc << (16 - self._n)) & 0xFFFF

    def consume(self, n: int) -> None:
        if n > self._n:
            raise ValueError("truncated JPEG entropy stream")
        self._n -= n
        self._acc &= (1 << self._n) - 1


def _receive_extend(reader: _BitReader, size: int) -> int:
    if size == 0:
        return 0
    v = reader.bits(size)
    if v < (1 << (size - 1)):
        v -= (1 << size) - 1
    return v


class _HuffDecoder:
    """Canonical Huffman decode via a 16-bit-lookahead LUT (the classic
    libjpeg-style acceleration of T.81 F.2.2.3): every 16-bit window maps
    to (symbol, code length) in two byte-string indexes, so a symbol costs
    ~4 int ops instead of a Python call per bit. Windows matching no code
    keep length 0 → ValueError (quarantine contract).

    The LUT is BUILT with numpy and STORED as two 64 KiB ``bytes``: the
    original per-length Python slice-assignment build cost ~1.1 ms per
    table, which dominated small-image decode on corpora whose files carry
    per-image OPTIMAL tables (every file = 4 fresh tables, so the
    table-spec cache never hits) — measured 28× cheaper this way
    (~0.04 ms), and ``bytes`` indexing is as fast as list indexing in the
    per-symbol loop while holding 128 KiB per decoder instead of ~2 MB of
    boxed ints (the unbounded-cache RSS growth that degraded long-lived
    Python workers)."""

    def __init__(self, bits: list[int], vals: list[int]) -> None:
        lut_sym = np.zeros(65536, dtype=np.uint8)
        lut_len = np.zeros(65536, dtype=np.uint8)
        code, k = 0, 0
        for length in range(1, 17):
            nb = bits[length - 1]
            if nb:
                start = code << (16 - length)
                span = 1 << (16 - length)
                end = start + nb * span
                if end > 65536:
                    # overfull table spec: more codes than the 16-bit code
                    # space holds — malformed DHT, quarantine not a crash
                    raise ValueError("invalid JPEG Huffman table (overfull)")
                lut_sym[start:end] = np.repeat(
                    np.asarray(vals[k : k + nb], dtype=np.uint8), span
                )
                lut_len[start:end] = length
                code += nb
                k += nb
            code <<= 1
        self.lut_sym = lut_sym.tobytes()
        self.lut_len = lut_len.tobytes()

    def decode(self, reader: _BitReader) -> int:
        w = reader.peek16()
        length = self.lut_len[w]
        if length == 0:
            raise ValueError("invalid JPEG Huffman code (no match in 16 bits)")
        reader.consume(length)
        return self.lut_sym[w]


# Decode tables repeat across a corpus when files share the Annex K
# defaults, so cache by table spec — but BOUNDED: a corpus of per-image
# optimal tables (what our own encoder emits) otherwise grows the cache by
# ~4 entries per file forever, and a long-lived reused Python worker
# degrades as its RSS climbs (measured: the quarantine face's per-run
# decode time tripled over three bench runs before this cap). Rebuilds
# are ~0.04 ms, so plain clear-on-overflow eviction is cheaper than LRU
# bookkeeping.
_HUFF_CACHE: dict[tuple[bytes, bytes], _HuffDecoder] = {}
_HUFF_CACHE_CAP = 64  # 64 × 128 KiB = 8 MiB ceiling per worker


def _huff_decoder(bits: list[int], vals: list[int]) -> _HuffDecoder:
    key = (bytes(bits), bytes(vals))
    dec = _HUFF_CACHE.get(key)
    if dec is None:
        if len(_HUFF_CACHE) >= _HUFF_CACHE_CAP:
            _HUFF_CACHE.clear()
        dec = _HuffDecoder(bits, vals)
        _HUFF_CACHE[key] = dec
    return dec


def parse_jpeg_header(data: bytes) -> dict:
    """Marker-walk metadata extraction WITHOUT entropy decode — the
    catalog step a media pipeline runs before deciding what to decode
    (the ffprobe/EXIF analog, here on real JFIF bytes): width, height,
    component count, the luma quantizer's DC step (``q00``, which pins
    the encoder's quality via the libjpeg scaling law), and the Huffman
    table count. Cost is a few dozen byte reads per file regardless of
    image size. Raises ``ValueError`` (quarantine contract) on
    non-JPEG/truncated/non-baseline headers."""
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    out: dict = {"n_dht": 0, "q00": None}
    try:
        while pos + 4 <= len(data):
            if data[pos] != 0xFF:
                raise ValueError(f"bad marker alignment at byte {pos}")
            marker = data[pos + 1]
            if marker == 0xD9:
                break
            (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
            body = data[pos + 4 : pos + 2 + seglen]
            if len(body) != seglen - 2:
                raise ValueError("truncated JPEG segment")
            if marker == 0xDB:
                off = 0
                while off < len(body):
                    pq, tq = body[off] >> 4, body[off] & 0xF
                    if pq != 0:
                        raise ValueError("unsupported JPEG (16-bit quant table)")
                    if tq == 0 and out["q00"] is None:
                        # zigzag position 0 IS the DC step
                        out["q00"] = body[off + 1]
                    off += 65
            elif marker == 0xC4:
                off = 0
                while off < len(body):
                    n = sum(body[off + 1 : off + 17])
                    out["n_dht"] += 1
                    off += 17 + n
            elif marker in (0xC0, 0xC2):
                prec, fh, fw, nc = struct.unpack(">BHHB", body[:6])
                if prec != 8:
                    raise ValueError(f"unsupported JPEG ({prec}-bit precision)")
                out.update(
                    width=fw, height=fh, components=nc,
                    progressive=marker == 0xC2,
                )
            elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                raise ValueError(f"unsupported JPEG (SOF{marker - 0xC0} frame)")
            elif marker == 0xDA:
                break  # header complete; entropy data follows
            pos = pos + 2 + seglen
    except struct.error as e:
        raise ValueError(f"truncated JPEG header: {e}") from e
    if "width" not in out or out["q00"] is None:
        raise ValueError("missing SOF0/DQT")
    return out


def decode_jpeg_baseline(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """JFIF bytes → (width, height, components, uint8 array (h, w) or
    (h, w, 3)). Baseline sequential (SOF0) AND progressive (SOF2 —
    spectral selection + successive approximation, T.81 Annex G);
    grayscale and RGB with sampling factors h, v ∈ {1, 2} (4:4:4, 4:2:0,
    4:2:2, 4:4:0). Everything else — arithmetic-coded, hierarchical,
    factor-3/4 sampling, 12-bit, restart-interval entropy, truncated —
    raises ``ValueError`` so a corpus scan can quarantine instead of
    crash. Subsampled chroma is upsampled by pixel replication."""
    if len(data) < 4 or data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    frame = None  # (h, w, [(comp_id, tq, hi, vi)])
    scan = None
    progressive = False
    try:
        while pos + 4 <= len(data):
            if data[pos] != 0xFF:
                raise ValueError(f"bad marker alignment at byte {pos}")
            marker = data[pos + 1]
            if marker == 0xD9:  # EOI before SOS
                break
            (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
            body = data[pos + 4 : pos + 2 + seglen]
            if len(body) != seglen - 2:
                raise ValueError("truncated JPEG segment")
            if marker == 0xDB:  # DQT (possibly several tables per segment)
                _parse_dqt(body, qtabs)
            elif marker == 0xC4:  # DHT
                _parse_dht(body, huff_dc, huff_ac)
            elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
                progressive = marker == 0xC2
                prec, fh, fw, nc = struct.unpack(">BHHB", body[:6])
                if prec != 8:
                    raise ValueError(f"unsupported JPEG ({prec}-bit precision)")
                comps = []
                for ci in range(nc):
                    cid, samp, tq = body[6 + 3 * ci : 9 + 3 * ci]
                    hi, vi = samp >> 4, samp & 0xF
                    if hi not in (1, 2) or vi not in (1, 2):
                        raise ValueError(
                            f"unsupported JPEG (sampling factors {hi}x{vi})"
                        )
                    comps.append((cid, tq, hi, vi))
                frame = (fh, fw, comps)
            elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                kinds = {0xC9: "arithmetic-coded"}
                raise ValueError(
                    f"unsupported JPEG ({kinds.get(marker, f'SOF{marker - 0xC0}')} frame)"
                )
            elif marker == 0xDA:  # SOS
                if progressive:
                    if frame is None:
                        raise ValueError("missing SOF2 before SOS")
                    return _decode_progressive(data, pos, frame, qtabs, huff_dc, huff_ac)
                ns = body[0]
                scan = [(body[1 + 2 * i], body[2 + 2 * i]) for i in range(ns)]
                pos = pos + 2 + seglen
                break
            # APPn / COM / DRI(ignored: we never emit restarts) — skip
            pos = pos + 2 + seglen
        else:
            raise ValueError("truncated JPEG (no SOS)")
    except struct.error as e:
        raise ValueError(f"truncated JPEG header: {e}") from e
    if frame is None or scan is None:
        raise ValueError("missing SOF0/SOS")
    fh, fw, comps = frame
    if len(scan) != len(comps):
        raise ValueError("scan/frame component mismatch")
    n_comp = len(comps)
    hmax = max(c[2] for c in comps)
    vmax = max(c[3] for c in comps)
    mcuy, mcux = -(-fh // (8 * vmax)), -(-fw // (8 * hmax))

    reader = _BitReader(_entropy_segment(data, pos))
    preds = [0] * n_comp
    # per-component padded block grid: (mcuy*v_i) rows × (mcux*h_i) cols
    comp_coefs = [
        np.zeros((mcuy * c[3] * mcux * c[2], 64), dtype=np.int64) for c in comps
    ]

    def _decode_block(ci: int, b: int) -> None:
        td, ta = scan[ci][1] >> 4, scan[ci][1] & 0xF
        if td not in huff_dc or ta not in huff_ac:
            raise ValueError("missing Huffman table for scan")
        size = huff_dc[td].decode(reader)
        diff = _receive_extend(reader, size)
        preds[ci] += diff
        zz = comp_coefs[ci][b]
        zz[0] = preds[ci]
        k = 1
        while k <= 63:
            rs = huff_ac[ta].decode(reader)
            r, s = rs >> 4, rs & 0xF
            if s == 0:
                if r == 15:
                    k += 16  # ZRL
                    continue
                break  # EOB
            k += r
            if k > 63:
                raise ValueError("AC run past end of block")
            zz[k] = _receive_extend(reader, s)
            k += 1

    try:
        for my in range(mcuy):  # T.81 A.2.3 interleaved MCU order
            for mx in range(mcux):
                for ci, (_, _, hi, vi) in enumerate(comps):
                    for dy in range(vi):
                        for dx in range(hi):
                            _decode_block(
                                ci, (my * vi + dy) * (mcux * hi) + (mx * hi + dx)
                            )
    except IndexError as e:
        raise ValueError(f"corrupt JPEG entropy stream: {e}") from e

    return _reconstruct(fh, fw, comps, comp_coefs, qtabs, hmax, vmax, mcuy, mcux)


def _reconstruct(
    fh: int, fw: int, comps: list, comp_coefs: list[np.ndarray],
    qtabs: dict[int, np.ndarray], hmax: int, vmax: int, mcuy: int, mcux: int,
) -> tuple[int, int, int, np.ndarray]:
    """Shared decoder back half (dequantize → IDCT → upsample → color):
    baseline and progressive scans both land their coefficients in the
    same MCU-padded per-component zigzag grids, so reconstruction is one
    code path."""
    n_comp = len(comps)
    planes = []
    for ci, (cid, tq, hi, vi) in enumerate(comps):
        if tq not in qtabs:
            raise ValueError(f"missing quant table {tq}")
        deq = (comp_coefs[ci][:, _UNZIGZAG].reshape(-1, 8, 8)) * qtabs[tq]
        blocks = _idct(deq.astype(np.float64)) + 128.0
        bh_i, bw_i = mcuy * vi, mcux * hi
        plane = _from_blocks(blocks, bh_i, bw_i, bh_i * 8, bw_i * 8)
        fy, fx = vmax // vi, hmax // hi
        if fy != 1 or fx != 1:  # chroma upsample by replication
            plane = np.repeat(np.repeat(plane, fy, axis=0), fx, axis=1)
        planes.append(plane[:fh, :fw])
    if n_comp == 1:
        out = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return fw, fh, 1, out
    if n_comp == 3:
        y, cb, cr = planes
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        out = np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)
        return fw, fh, 3, out
    raise ValueError(f"unsupported JPEG ({n_comp} components)")


# --- progressive decoder (T.81 Annex G) --------------------------------------


def _dc_first_block(
    reader: _BitReader, dec: _HuffDecoder, zz: np.ndarray, pred: int, al: int
) -> int:
    """First DC scan block (G.1.2.1): differential DC, point-transformed
    value stored as ``pred << Al``. Returns the updated predictor."""
    size = dec.decode(reader)
    pred += _receive_extend(reader, size)
    zz[0] = pred << al
    return pred


def _ac_first_block(
    reader: _BitReader, dec: _HuffDecoder, zz: np.ndarray,
    ss: int, se: int, al: int, eobrun: int,
) -> int:
    """First AC scan block (G.1.2.2): run/size symbols with EOBn run
    codes; returns the remaining EOB run (blocks fully covered by it
    decode nothing)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = dec.decode(reader)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r != 15:
                run = (1 << r) - 1
                if r:
                    run += reader.bits(r)
                return run  # this block ends; `run` more covered
            k += 16  # ZRL
        else:
            k += r
            if k > se:
                raise ValueError("AC run past end of band")
            zz[k] = _receive_extend(reader, s) << al
            k += 1
    return 0


def _ac_refine_block(
    reader: _BitReader, dec: _HuffDecoder, zz: np.ndarray,
    ss: int, se: int, al: int, eobrun: int,
) -> int:
    """AC refinement scan block (G.1.2.3): newly-significant coefficients
    arrive as (run, 1) symbols + sign bit; every history-nonzero
    coefficient passed over consumes one correction bit; EOB-run-covered
    blocks still read correction bits across the whole band."""
    p1 = 1 << al
    m1 = -1 << al

    def refine(idx: int) -> None:
        if reader.bits(1) and (int(zz[idx]) & p1) == 0:
            zz[idx] += p1 if int(zz[idx]) >= 0 else m1

    if eobrun > 0:
        for j in range(ss, se + 1):
            if zz[j]:
                refine(j)
        return eobrun - 1
    k = ss
    while k <= se:
        rs = dec.decode(reader)
        r, s = rs >> 4, rs & 0xF
        val = 0
        if s == 0:
            if r != 15:
                run = (1 << r) - 1
                if r:
                    run += reader.bits(r)
                for j in range(k, se + 1):  # corrections for the rest of band
                    if zz[j]:
                        refine(j)
                return run
            # r == 15: ZRL — skip 16 zero-history coefficients below
        elif s == 1:
            val = p1 if reader.bits(1) else m1
        else:
            raise ValueError("invalid AC refinement symbol (size > 1)")
        while k <= se:  # advance r zero-history slots, refining along the way
            if zz[k]:
                refine(k)
            else:
                if r == 0:
                    if val:
                        zz[k] = val
                    k += 1
                    break
                r -= 1
            k += 1
    return 0


def _decode_progressive(
    data: bytes, pos: int, frame: tuple,
    qtabs: dict[int, np.ndarray],
    huff_dc: dict[int, _HuffDecoder], huff_ac: dict[int, _HuffDecoder],
) -> tuple[int, int, int, np.ndarray]:
    """Multi-scan progressive decode: ``pos`` points at the first SOS
    marker. Walks SOS/DHT/DQT segments until EOI, accumulating each
    scan's coefficient contributions into the per-component MCU-padded
    grids, then reconstructs once."""
    fh, fw, comps = frame
    n_comp = len(comps)
    hmax = max(c[2] for c in comps)
    vmax = max(c[3] for c in comps)
    mcuy, mcux = -(-fh // (8 * vmax)), -(-fw // (8 * hmax))
    comp_coefs = [
        np.zeros((mcuy * c[3] * mcux * c[2], 64), dtype=np.int64) for c in comps
    ]
    # per-component non-interleaved block grid (T.81 A.2.2)
    cgrid = []
    for cid, tq, hi, vi in comps:
        cw, ch = -(-(fw * hi) // hmax), -(-(fh * vi) // vmax)
        cgrid.append((-(-ch // 8), -(-cw // 8)))
    id2ci = {c[0]: i for i, c in enumerate(comps)}

    try:
        while pos + 2 <= len(data):
            if data[pos] != 0xFF:
                raise ValueError(f"bad marker alignment at byte {pos}")
            marker = data[pos + 1]
            if marker == 0xD9:  # EOI
                break
            if pos + 4 > len(data):
                raise ValueError("truncated JPEG segment header")
            (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
            body = data[pos + 4 : pos + 2 + seglen]
            if len(body) != seglen - 2:
                raise ValueError("truncated JPEG segment")
            if marker == 0xDB:
                _parse_dqt(body, qtabs)
            elif marker == 0xC4:
                _parse_dht(body, huff_dc, huff_ac)
            elif marker == 0xDA:
                ns = body[0]
                scomps = [(body[1 + 2 * i], body[2 + 2 * i]) for i in range(ns)]
                ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
                ahl = body[3 + 2 * ns]
                ah, al = ahl >> 4, ahl & 0xF
                entropy, end = _entropy_segment_ex(data, pos + 2 + seglen)
                _decode_prog_scan(
                    _BitReader(entropy), scomps, ss, se, ah, al,
                    comps, id2ci, comp_coefs, cgrid, mcuy, mcux,
                    huff_dc, huff_ac,
                )
                pos = end
                continue
            pos = pos + 2 + seglen
        else:
            raise ValueError("truncated JPEG (no EOI)")
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt progressive JPEG: {e}") from e
    return _reconstruct(fh, fw, comps, comp_coefs, qtabs, hmax, vmax, mcuy, mcux)


def _decode_prog_scan(
    reader: _BitReader, scomps: list[tuple[int, int]],
    ss: int, se: int, ah: int, al: int,
    comps: list, id2ci: dict[int, int], comp_coefs: list[np.ndarray],
    cgrid: list[tuple[int, int]], mcuy: int, mcux: int,
    huff_dc: dict[int, _HuffDecoder], huff_ac: dict[int, _HuffDecoder],
) -> None:
    """One progressive scan. DC scans (Ss=0) may be interleaved (MCU
    order over the padded grid) or single-component; AC scans are always
    single-component over the component's own block grid."""
    if ss == 0:
        if se != 0:
            raise ValueError("invalid progressive scan (DC scan with Se > 0)")
        preds = dict.fromkeys(range(len(scomps)), 0)
        decs = []
        for cid, tt in scomps:
            td = tt >> 4
            if ah == 0 and td not in huff_dc:
                raise ValueError("missing DC Huffman table for scan")
            decs.append(huff_dc.get(td))
        if len(scomps) > 1:  # interleaved MCU order (incl. padding blocks)
            for my in range(mcuy):
                for mx in range(mcux):
                    for si, (cid, tt) in enumerate(scomps):
                        ci = id2ci[cid]
                        hi, vi = comps[ci][2], comps[ci][3]
                        for dy in range(vi):
                            for dx in range(hi):
                                b = (my * vi + dy) * (mcux * hi) + (mx * hi + dx)
                                zz = comp_coefs[ci][b]
                                if ah == 0:
                                    preds[si] = _dc_first_block(
                                        reader, decs[si], zz, preds[si], al
                                    )
                                elif reader.bits(1):
                                    zz[0] |= 1 << al
        else:
            ci = id2ci[scomps[0][0]]
            hi = comps[ci][2]
            cbh, cbw = cgrid[ci]
            for by in range(cbh):
                for bx in range(cbw):
                    zz = comp_coefs[ci][by * (mcux * hi) + bx]
                    if ah == 0:
                        preds[0] = _dc_first_block(reader, decs[0], zz, preds[0], al)
                    elif reader.bits(1):
                        zz[0] |= 1 << al
        return
    # AC scan
    if len(scomps) != 1:
        raise ValueError("invalid progressive scan (interleaved AC scan)")
    if se > 63 or ss > se:
        raise ValueError(f"invalid progressive scan (band {ss}..{se})")
    cid, tt = scomps[0]
    ta = tt & 0xF
    if ta not in huff_ac:
        raise ValueError("missing AC Huffman table for scan")
    dec = huff_ac[ta]
    ci = id2ci[cid]
    hi = comps[ci][2]
    cbh, cbw = cgrid[ci]
    block_fn = _ac_first_block if ah == 0 else _ac_refine_block
    eobrun = 0
    for by in range(cbh):
        for bx in range(cbw):
            zz = comp_coefs[ci][by * (mcux * hi) + bx]
            eobrun = block_fn(reader, dec, zz, ss, se, al, eobrun)
