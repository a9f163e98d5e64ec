"""Real codec decoders (functions/codecs.py): WAV against the stdlib
``wave`` encoder (independent author path — the decoder parses RIFF by
hand), PNG against a from-spec encoder built in this test (all 5 filter
types), PPM/PGM roundtrip, honest failure for undecodable formats."""

import io
import struct
import wave
import zlib

import numpy as np
import pytest

from rkmh_spark.functions.codecs import (
    UnsupportedMediaError,
    decode_png,
    decode_ppm,
    decode_wav,
    real_decode_features,
    sniff,
)


# ---------------------------------------------------------------------------
# WAV

def _wav_bytes(samples_i16: np.ndarray, rate: int, channels: int = 1) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples_i16.astype("<i2").tobytes())
    return buf.getvalue()


def test_wav_mono_roundtrip():
    t = np.arange(8000, dtype=np.float64)
    wave_f = np.sin(2 * np.pi * 440.0 * t / 8000.0)
    i16 = (wave_f * 32000).astype(np.int16)
    samples, rate = decode_wav(_wav_bytes(i16, 8000))
    assert rate == 8000
    assert samples.shape == (8000,)
    assert np.allclose(samples, i16 / 32768.0, atol=1e-6)


def test_wav_stereo_downmixes_to_mono():
    left = np.full(100, 1000, dtype=np.int16)
    right = np.full(100, 3000, dtype=np.int16)
    interleaved = np.empty(200, dtype=np.int16)
    interleaved[0::2], interleaved[1::2] = left, right
    samples, rate = decode_wav(_wav_bytes(interleaved, 16000, channels=2))
    assert samples.shape == (100,)
    assert np.allclose(samples, 2000 / 32768.0, atol=1e-6)


def test_wav_rejects_non_riff():
    with pytest.raises(UnsupportedMediaError):
        decode_wav(b"\xff\xd8\xff\xe0" + b"\x00" * 100)  # JPEG magic


# ---------------------------------------------------------------------------
# PNG — encoder written here from the spec (filters applied FORWARD),
# decoder must invert it

def _paeth_ref(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _png_bytes(img: np.ndarray, filter_type: int) -> bytes:
    h, w, c = img.shape
    color = {1: 0, 3: 2, 4: 6}[c]
    raw = bytearray()
    flat = img.reshape(h, w * c).astype(np.int32)
    for y in range(h):
        raw.append(filter_type)
        prev = flat[y - 1] if y > 0 else np.zeros(w * c, np.int32)
        for x in range(w * c):
            cur = int(flat[y][x])
            left = int(flat[y][x - c]) if x >= c else 0
            up = int(prev[x])
            ul = int(prev[x - c]) if x >= c else 0
            if filter_type == 0:
                v = cur
            elif filter_type == 1:
                v = cur - left
            elif filter_type == 2:
                v = cur - up
            elif filter_type == 3:
                v = cur - (left + up) // 2
            else:
                v = cur - _paeth_ref(left, up, ul)
            raw.append(v & 0xFF)

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_filters_roundtrip(filter_type):
    rng = np.random.default_rng(7 + filter_type)
    img = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    out = decode_png(_png_bytes(img, filter_type))
    assert out.shape == img.shape
    assert np.array_equal(out, img), f"filter {filter_type}"


@pytest.mark.parametrize("channels", [1, 3, 4])
def test_png_color_types(channels):
    rng = np.random.default_rng(channels)
    img = rng.integers(0, 256, size=(4, 6, channels), dtype=np.uint8)
    out = decode_png(_png_bytes(img, 4))
    assert np.array_equal(out, img)


def test_png_rejects_interlaced():
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    payload = bytearray(_png_bytes(img, 0))
    # interlace byte is the last byte of the 13-byte IHDR body
    ihdr_body_off = 8 + 8  # magic + len/type
    payload[ihdr_body_off + 12] = 1
    # (crc now wrong, but IHDR parse happens before any crc use)
    with pytest.raises(UnsupportedMediaError, match="interlaced"):
        decode_png(bytes(payload))


# ---------------------------------------------------------------------------
# PPM / PGM

def test_ppm_p6_with_comment():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(3, 5, 3), dtype=np.uint8)
    payload = b"P6\n# a comment line\n5 3\n255\n" + img.tobytes()
    assert np.array_equal(decode_ppm(payload), img)


def test_pgm_p5():
    img = np.arange(12, dtype=np.uint8).reshape(3, 4, 1)
    payload = b"P5\n4 3\n255\n" + img.tobytes()
    assert np.array_equal(decode_ppm(payload), img)


# ---------------------------------------------------------------------------
# dispatch + features + Spark integration

def test_sniff_and_feature_dispatch():
    wav = _wav_bytes(np.zeros(100, dtype=np.int16), 8000)
    png = _png_bytes(np.zeros((2, 2, 3), dtype=np.uint8), 0)
    assert sniff(wav) == "wav" and sniff(png) == "png"
    fa = real_decode_features(wav, "audio", dim=16)
    fi = real_decode_features(png, "image", dim=16)
    assert fa.shape == fi.shape == (16,)
    assert fa[0] == 100.0 and fa[1] == 8000.0  # n_samples, rate
    assert fi[0] == 2.0 and fi[1] == 2.0 and fi[2] == 3.0  # h, w, c
    with pytest.raises(UnsupportedMediaError, match="codec"):
        real_decode_features(b"\xff\xd8\xff\xe0 jpeg-ish", "image")


def test_real_decode_in_spark_pipeline(spark):
    """The decode seam runs REAL decoders inside mapInPandas."""
    from rkmh_spark.operators.multimodal import _real_decode, extract_features

    wav = _wav_bytes(
        (np.sin(np.arange(400) / 10.0) * 20000).astype(np.int16), 8000
    )
    png = _png_bytes(
        np.random.default_rng(3).integers(0, 256, (8, 8, 3), dtype=np.uint8), 2
    )
    rows = [
        ("m://a", "audio", bytearray(wav), None),
        ("m://i", "image", bytearray(png), None),
    ]
    from rkmh_spark.operators.multimodal import media_schema

    media = spark.createDataFrame(rows, schema=media_schema())
    out = {
        r["url"]: r
        for r in extract_features(media, decode=_real_decode).collect()
    }
    assert out["m://a"]["features"][0] == 400.0  # n_samples
    assert out["m://i"]["features"][0] == 8.0    # height
    assert out["m://a"]["payload_bytes"] == len(wav)


@pytest.mark.parametrize(
    "payload",
    [
        b"RIFF\x00\x00\x00\x00WAVEfmt \x04\x00\x00\x00\x01\x00",  # short fmt
        b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\x0dIHDR" + b"\x00" * 13 + b"x",
        b"P6\n12 not-an-int\n255\n\x00\x00\x00",  # non-integer PPM header
        b"P6\n",  # header truncated before width/height/maxval
    ],
)
def test_malformed_payloads_hit_honest_boundary(payload):
    """ADVICE r3: truncated/malformed payloads must surface as
    UnsupportedMediaError (the documented honest-stub boundary), never a
    raw struct/zlib/ValueError that fails the whole mapInPandas task."""
    from rkmh_spark.functions.codecs import (
        UnsupportedMediaError,
        real_decode_features,
    )

    with pytest.raises(UnsupportedMediaError):
        real_decode_features(payload, kind="auto")
