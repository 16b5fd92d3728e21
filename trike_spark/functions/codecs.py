"""Real, dependency-free media codecs for the multimodal column model.

The multimodal faces treat image/audio as opaque binary + typed metadata
(SURVEY.md §2.6 "multimodal"), with the DECODE step historically stubbed
because PIL/ffmpeg aren't in the runtime. These two codecs remove the
stub for the formats the standard library can actually handle:

* **PNG** — container parsing + zlib inflate + the five scanline filters
  reconstructed in numpy (spec: RFC 2083). 8-bit depth, color types
  gray(0)/RGB(2)/RGBA(6), non-interlaced — the overwhelmingly common
  case for ML image corpora. Unsupported shapes raise ``ValueError``
  (the honest boundary: a real corpus routes those to a quarantine
  sink, tested in ``tests/test_codecs.py``).
* **WAV** — stdlib ``wave`` (PCM int16), samples exposed as numpy.

Both directions exist (encode + decode) so the Spark faces can prove the
full loop: derive deterministic pixels/samples from table bytes →
encode → decode → hash, while the DuckDB oracle hashes the derived bytes
directly — a hash match certifies the codec round-trips bit-for-bit
through the Arrow batch plumbing.

These run inside ``mapInPandas`` batches (vectorized I/O, per-row codec
work — the same shape a PIL/ffmpeg deployment has). At 100 TB the codec
is embarrassingly parallel per row; the knobs that matter are upstream
(binaryFile ``max_bytes`` guard, partition sizing), not here.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}  # color type → samples per pixel


def encode_png(pixels: np.ndarray) -> bytes:
    """Minimal PNG writer: 8-bit, filter 0, one IDAT. ``pixels`` is
    (h, w) gray, or (h, w, 3|4) RGB/RGBA, dtype uint8."""
    if pixels.dtype != np.uint8:
        raise ValueError(f"encode_png wants uint8, got {pixels.dtype}")
    if pixels.ndim == 2:
        color_type = 0
    elif pixels.ndim == 3 and pixels.shape[2] == 3:
        color_type = 2
    elif pixels.ndim == 3 and pixels.shape[2] == 4:
        color_type = 6
    else:
        raise ValueError(f"unsupported pixel shape {pixels.shape}")
    h, w = pixels.shape[:2]

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + pixels[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode a PNG → (width, height, channels, uint8 array (h, w, c)).

    Handles all five scanline filters (None/Sub/Up/Average/Paeth) per
    RFC 2083 §6; rejects interlace, palette, and non-8-bit depth with
    ``ValueError`` so callers can quarantine rather than mis-decode."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat = 8, None, []
    # Truncated/corrupt containers must surface as ValueError too — the
    # quarantine contract — not as struct.error/zlib.error, which would
    # kill the Spark task instead of routing the row to the bad-file sink.
    try:
        while pos + 8 <= len(data):
            (length,) = struct.unpack(">I", data[pos : pos + 4])
            tag = data[pos + 4 : pos + 8]
            body = data[pos + 8 : pos + 8 + length]
            if tag == b"IHDR":
                ihdr = struct.unpack(">IIBBBBB", body)
            elif tag == b"IDAT":
                idat.append(body)
            elif tag == b"IEND":
                break
            pos += 12 + length
    except struct.error as e:
        raise ValueError(f"truncated PNG chunk structure: {e}") from e
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or color_type not in _CHANNELS or comp or filt or interlace:
        raise ValueError(
            f"unsupported PNG (depth={depth} color={color_type} interlace={interlace})"
        )
    c = _CHANNELS[color_type]
    stride = w * c
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise ValueError(f"corrupt PNG IDAT stream: {e}") from e
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT length mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up
            cur = line + prev
        elif ftype == 1:  # Sub: per-channel-lane prefix sum (mod 256 is
            # preserved by cumsum in a wider dtype + truncation)
            cur = (
                np.cumsum(line.reshape(-1, c).astype(np.int64), axis=0) & 0xFF
            ).astype(np.uint8).reshape(-1)
        elif ftype in (3, 4):  # Average / Paeth: true left-to-right recursion
            cur = line
            for x in range(stride):
                a = int(cur[x - c]) if x >= c else 0  # left
                b = int(prev[x])  # up
                if ftype == 3:
                    cur[x] = (int(line[x]) + (a + b) // 2) & 0xFF
                else:
                    cc = int(prev[x - c]) if x >= c else 0  # up-left
                    p = a + b - cc
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                    cur[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown filter type {ftype}")
        out[y] = cur
        prev = out[y]
    return w, h, c, out.reshape(h, w, c)


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """PCM int16 mono/stereo WAV via stdlib ``wave``. ``samples`` is
    (n,) mono or (n, 2) stereo, dtype int16."""
    import io
    import wave

    if samples.dtype != np.int16:
        raise ValueError(f"encode_wav wants int16, got {samples.dtype}")
    n_ch = 1 if samples.ndim == 1 else samples.shape[1]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(n_ch)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode WAV → (sample_rate, n_channels, n_frames, int16 array).
    PCM-16 only; anything else — including corrupt/truncated RIFF
    containers — raises ``ValueError`` (quarantine contract)."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(data), "rb") as wf:
            if wf.getsampwidth() != 2:
                raise ValueError(f"only PCM-16 supported, width={wf.getsampwidth()}")
            rate, n_ch, n_fr = wf.getframerate(), wf.getnchannels(), wf.getnframes()
            frames = wf.readframes(n_fr)
    except (wave.Error, EOFError, struct.error) as e:
        raise ValueError(f"corrupt WAV container: {e}") from e
    # .copy(): frombuffer is a read-only view; decoded samples must be
    # writable like decode_png's output (consistent mutability contract)
    pcm = np.frombuffer(frames, dtype=np.int16).copy()
    if n_ch > 1:
        pcm = pcm.reshape(-1, n_ch)
    return rate, n_ch, n_fr, pcm


# --- Y4M (YUV4MPEG2) — the uncompressed video interchange container ---------


def encode_y4m(frames: np.ndarray, fps: tuple[int, int] = (25, 1)) -> bytes:
    """YUV4MPEG2 writer (the raw-video interchange format ffmpeg/x264
    pipelines speak): ``frames`` is (n_frames, h, w, 3) uint8 in YUV
    order, written as C444 planar (one Y, U, V plane per frame — no
    chroma subsampling, bit-exact round-trip).

    This upgrades the video leg of the multimodal model from a stub to a
    REAL container: header parsing, frame framing, and plane layout are
    the actual format; only inter-frame compression (a codec like H.264)
    stays out of scope — Y4M is what such codecs decode INTO."""
    if frames.dtype != np.uint8 or frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError(f"encode_y4m wants (n, h, w, 3) uint8, got {frames.shape} {frames.dtype}")
    n, h, w, _ = frames.shape
    head = f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C444\n".encode()
    parts = [head]
    for i in range(n):
        parts.append(b"FRAME\n")
        # planar: all Y, then all U, then all V
        parts.append(frames[i].transpose(2, 0, 1).tobytes())
    return b"".join(parts)


def decode_y4m(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Y4M → (width, height, n_frames, (n, h, w, 3) uint8). C444 only
    (what :func:`encode_y4m` writes); C420 and friends raise
    ``ValueError`` — the quarantine contract — as do truncated frames,
    bad magic, and malformed headers."""
    if not data.startswith(b"YUV4MPEG2"):
        raise ValueError("not a Y4M stream (bad magic)")
    nl = data.find(b"\n")
    if nl < 0:
        raise ValueError("truncated Y4M header")
    w = h = None
    colorspace = "C420jpeg"  # the format's default when the tag is absent
    for tok in data[9:nl].split():
        t = tok.decode("ascii", "replace")
        if t[0] == "W":
            w = int(t[1:])
        elif t[0] == "H":
            h = int(t[1:])
        elif t[0] == "C":
            colorspace = t
    if not w or not h:
        raise ValueError("Y4M header missing W/H")
    if colorspace != "C444":
        raise ValueError(f"unsupported Y4M colorspace {colorspace} (C444 only)")
    frame_bytes = w * h * 3
    frames = []
    pos = nl + 1
    while pos < len(data):
        fnl = data.find(b"\n", pos)
        if fnl < 0 or not data[pos:fnl].startswith(b"FRAME"):
            raise ValueError(f"bad Y4M FRAME marker at byte {pos}")
        body = data[fnl + 1 : fnl + 1 + frame_bytes]
        if len(body) != frame_bytes:
            raise ValueError("truncated Y4M frame payload")
        plane = np.frombuffer(body, dtype=np.uint8).reshape(3, h, w)
        frames.append(plane.transpose(1, 2, 0))
        pos = fnl + 1 + frame_bytes
    if not frames:
        raise ValueError("Y4M stream has no frames")
    return w, h, len(frames), np.stack(frames)
