"""functions/codecs.py: the stdlib PNG/WAV codecs behind the multimodal
round-trip faces. Round-trips, filter reconstruction against an
independently-built PNG, and the unsupported-shape quarantine contract."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from trike_spark.functions.codecs import (
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
)


def _rng(seed: int) -> np.random.Generator:
    return np.random.default_rng(seed)


@pytest.mark.parametrize("shape", [(7, 5), (4, 4, 3), (3, 9, 4)])
def test_png_round_trip_gray_rgb_rgba(shape):
    pixels = _rng(42).integers(0, 256, size=shape, dtype=np.uint8)
    w, h, c, back = decode_png(encode_png(pixels))
    assert (w, h) == (shape[1], shape[0])
    assert c == (1 if len(shape) == 2 else shape[2])
    assert np.array_equal(back.reshape(shape), pixels)


def _png_with_filters(pixels: np.ndarray, filters: list[int]) -> bytes:
    """Independently build a PNG using explicit per-scanline filters —
    exercises the decoder's Sub/Up/Average/Paeth reconstruction, which our
    own filter-0 encoder never emits."""
    h, w, c = pixels.shape
    stride = w * c

    def paeth(a, b, cc):
        p = a + b - cc
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)

    flat = pixels.reshape(h, stride).astype(int)
    raw = bytearray()
    for y, ft in enumerate(filters):
        raw.append(ft)
        for x in range(stride):
            v = flat[y][x]
            a = flat[y][x - c] if x >= c else 0
            b = flat[y - 1][x] if y >= 1 else 0
            cc = flat[y - 1][x - c] if (x >= c and y >= 1) else 0
            if ft == 0:
                enc = v
            elif ft == 1:
                enc = v - a
            elif ft == 2:
                enc = v - b
            elif ft == 3:
                enc = v - (a + b) // 2
            else:
                enc = v - paeth(a, b, cc)
            raw.append(enc & 0xFF)

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_decoder_reconstructs_all_five_filters():
    pixels = _rng(7).integers(0, 256, size=(5, 6, 3), dtype=np.uint8)
    data = _png_with_filters(pixels, [0, 1, 2, 3, 4])
    w, h, c, back = decode_png(data)
    assert (w, h, c) == (6, 5, 3)
    assert np.array_equal(back, pixels)


def test_png_rejects_unsupported_shapes():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JFIF not a png")
    # 16-bit depth header on an otherwise valid container
    pixels = _rng(1).integers(0, 256, size=(2, 2, 3), dtype=np.uint8)
    good = encode_png(pixels)
    bad = bytearray(good)
    bad[24] = 16  # IHDR bit-depth byte
    with pytest.raises(ValueError, match="unsupported"):
        decode_png(bytes(bad))
    with pytest.raises(ValueError):
        encode_png(pixels.astype(np.int32))


def test_wav_round_trip_mono_and_stereo():
    mono = _rng(3).integers(-32768, 32767, size=64, dtype=np.int16)
    rate, n_ch, n_fr, back = decode_wav(encode_wav(mono, 8_000))
    assert (rate, n_ch, n_fr) == (8_000, 1, 64)
    assert np.array_equal(back, mono)

    stereo = _rng(4).integers(-32768, 32767, size=(32, 2), dtype=np.int16)
    rate, n_ch, n_fr, back = decode_wav(encode_wav(stereo, 44_100))
    assert (rate, n_ch, n_fr) == (44_100, 2, 32)
    assert np.array_equal(back, stereo)


def test_wav_rejects_non_pcm16():
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(1)  # 8-bit
        wf.setframerate(8000)
        wf.writeframes(bytes(16))
    with pytest.raises(ValueError, match="PCM-16"):
        decode_wav(buf.getvalue())
    with pytest.raises(ValueError):
        encode_wav(np.zeros(4, dtype=np.float32))


def test_binaryfile_ingest_to_real_decode_end_to_end(spark, tmp_path):
    """The full multimodal ingest path with zero fakes: real PNG files on
    disk -> binaryFile scan (listing-time glob) -> Arrow-batched REAL
    decode -> per-image stats. Asserts pixel-level equality against the
    arrays the files were written from."""
    import hashlib

    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from trike_spark.io import read_binary_files

    d = tmp_path / "imgs"
    d.mkdir()
    want = {}
    for i in range(6):
        pixels = _rng(100 + i).integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
        (d / f"img_{i}.png").write_bytes(encode_png(pixels))
        want[f"img_{i}.png"] = hashlib.sha256(pixels.tobytes()).hexdigest()
    (d / "notes.txt").write_text("not an image")

    schema = StructType(
        [
            StructField("name", StringType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("channels", IntegerType()),
            StructField("nbytes", LongType()),
            StructField("pix_sha", StringType()),
        ]
    )

    def decode_batch(batches):
        import os

        import pandas as pd

        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                w, h, c, arr = decode_png(bytes(content))
                rows.append(
                    (
                        os.path.basename(path),
                        w,
                        h,
                        c,
                        int(arr.nbytes),
                        hashlib.sha256(arr.tobytes()).hexdigest(),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    blobs = read_binary_files(spark, str(d), glob="*.png")
    got = {
        r["name"]: r
        for r in blobs.select("path", "content").mapInPandas(decode_batch, schema=schema).collect()
    }
    assert set(got) == set(want)  # glob pruned the .txt at listing time
    for name, sha in want.items():
        r = got[name]
        assert (r["width"], r["height"], r["channels"], r["nbytes"]) == (7, 5, 3, 105)
        assert r["pix_sha"] == sha


def test_corrupt_containers_raise_valueerror_not_library_errors():
    """The quarantine contract covers CORRUPT bytes, not just unsupported
    shapes: truncation and bit-flips must surface as ValueError (routable
    to a bad-file sink), never struct.error/zlib.error/wave.Error (which
    would kill the Spark task)."""
    pixels = _rng(9).integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    good = encode_png(pixels)
    with pytest.raises(ValueError):
        decode_png(good[:20])  # truncated mid-IHDR
    flipped = bytearray(good)
    flipped[45] ^= 0xFF  # inside the IDAT zlib stream
    with pytest.raises(ValueError):
        decode_png(bytes(flipped))

    wav = encode_wav(np.zeros(8, dtype=np.int16))
    with pytest.raises(ValueError):
        decode_wav(b"RIFFgarbage")
    with pytest.raises(ValueError):
        decode_wav(wav[:16])  # truncated header


def test_decoded_arrays_are_writable():
    pixels = _rng(10).integers(0, 256, size=(3, 3, 3), dtype=np.uint8)
    _, _, _, arr = decode_png(encode_png(pixels))
    arr[0, 0, 0] = 7  # must not raise
    _, _, _, pcm = decode_wav(encode_wav(np.zeros(8, dtype=np.int16)))
    pcm[0] = 7  # must not raise


# --- Y4M ---------------------------------------------------------------------


def test_y4m_roundtrip_byte_exact():
    import numpy as np

    from trike_spark.functions.codecs import decode_y4m, encode_y4m

    rng = np.random.default_rng(11)
    frames = rng.integers(0, 256, (5, 8, 16, 3), dtype=np.uint8)
    w, h, n, out = decode_y4m(encode_y4m(frames, fps=(30, 1)))
    assert (w, h, n) == (16, 8, 5)
    assert (out == frames).all()


def test_y4m_quarantine_contract():
    import numpy as np
    import pytest

    from trike_spark.functions.codecs import decode_y4m, encode_y4m

    frames = np.zeros((2, 4, 4, 3), dtype=np.uint8)
    good = encode_y4m(frames)
    with pytest.raises(ValueError, match="bad magic"):
        decode_y4m(b"RIFF....")
    with pytest.raises(ValueError, match="truncated Y4M frame"):
        decode_y4m(good[:-5])
    with pytest.raises(ValueError, match="unsupported Y4M colorspace"):
        decode_y4m(good.replace(b"C444", b"C420"))
    with pytest.raises(ValueError, match="FRAME marker"):
        decode_y4m(good.replace(b"FRAME", b"FRANE", 1))
    with pytest.raises(ValueError, match="no frames"):
        decode_y4m(good.split(b"FRAME")[0])
