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
    # jpeg-ish magic now reaches the REAL jpeg parser, which rejects the
    # truncated body; mp4-ish magic reaches the REAL box parser, which
    # rejects the missing moov; unknown bytes hit the external-libs wall
    with pytest.raises(UnsupportedMediaError):
        real_decode_features(b"\xff\xd8\xff\xe0 jpeg-ish", "image")
    with pytest.raises(UnsupportedMediaError, match="moov"):
        real_decode_features(
            b"\x00\x00\x00\x10ftypmp42\x00\x00\x00\x00", "video"
        )
    with pytest.raises(UnsupportedMediaError, match="codec"):
        real_decode_features(b"\x1aE\xdf\xa3 webm-ish unknown", "video")


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


# ---------------------------------------------------------------------------
# JPEG — from-spec encoder built HERE (independent author path: direct
# cosine-sum forward DCT, own bit writer / huffman construction) feeding
# the decoder's marker parse + huffman + IDCT pipeline.

_ZZ = [
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]


def _fdct_quant(block: np.ndarray, q: int) -> list[int]:
    """Direct cosine-sum forward DCT (no shared code with the decoder's
    matrix IDCT), flat quantizer q, zigzag order."""
    f = block.astype(np.float64) - 128.0
    out = np.zeros((8, 8))
    for v in range(8):
        for u in range(8):
            cv = (1 / np.sqrt(2)) if v == 0 else 1.0
            cu = (1 / np.sqrt(2)) if u == 0 else 1.0
            s = 0.0
            for y in range(8):
                for x in range(8):
                    s += (
                        f[y, x]
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                    )
            out[v, u] = 0.25 * cv * cu * s
    qz = np.round(out / q).astype(int).reshape(64)
    return [int(qz[i]) for i in _ZZ]


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nb = 0

    def put(self, value: int, nbits: int):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nb += 1
            if self.nb == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc, self.nb = 0, 0

    def flush(self):
        while self.nb:
            self.put(1, 1)  # pad with 1-bits per spec


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _mag_bits(v: int, t: int) -> int:
    return v if v >= 0 else v + (1 << t) - 1


def _block_symbols(coefs: list[int], pred: int):
    """→ (new_pred, dc_sym, [(ac_sym, bits, nbits)...], dc_bits)."""
    diff = coefs[0] - pred
    t = _category(diff)
    acs = []
    run = 0
    last_nz = 0
    for k in range(1, 64):
        if coefs[k] != 0:
            last_nz = k
    k = 1
    while k <= last_nz:
        if coefs[k] == 0:
            run += 1
            if run == 16:
                acs.append((0xF0, 0, 0))  # ZRL
                run = 0
            k += 1
            continue
        s = _category(coefs[k])
        acs.append(((run << 4) | s, _mag_bits(coefs[k], s), s))
        run = 0
        k += 1
    if last_nz < 63:
        acs.append((0x00, 0, 0))  # EOB
    return coefs[0], t, _mag_bits(diff, t), acs


def _canonical_table(symbols):
    syms = sorted(set(symbols))
    length = 2
    while (1 << length) - 2 < len(syms):
        length += 1
    bits = [0] * 16
    bits[length - 1] = len(syms)
    codes = {s: (length, i) for i, s in enumerate(syms)}
    return bits, bytes(syms), codes


def _encode_jpeg(img: np.ndarray, sampling=None, q: int = 4, restart_interval: int = 0) -> bytes:
    """Baseline JPEG encoder. img: (H, W) gray or (H, W, 3) RGB.
    sampling: luma (h, v) for 3-channel input ((1,1)=4:4:4, (2,2)=4:2:0)."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
    else:
        r, g, b = (img[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        sh, sv = sampling or (1, 1)
        planes, samp = [y, cb, cr], [(sh, sv), (1, 1), (1, 1)]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    # pad + downsample each plane to its sampled MCU grid
    sub = []
    for p, (sh, sv) in zip(planes, samp):
        full_h, full_w = mcus_y * 8 * vmax, mcus_x * 8 * hmax
        pp = np.pad(p, ((0, full_h - h), (0, full_w - w)), mode="edge")
        fy, fx = vmax // sv, hmax // sh
        if fy > 1 or fx > 1:
            pp = pp.reshape(full_h // fy, fy, full_w // fx, fx).mean((1, 3))
        sub.append(pp)

    # pass 1: per-MCU, per-component blocks → symbols
    blocks = []  # (comp_idx, dc_sym, dc_bits_t, acs)
    pred = [0] * len(planes)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            mcu_idx = my * mcus_x + mx
            if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                pred = [0] * len(planes)  # spec: RST resets DC prediction
            for ci, (p, (sh, sv)) in enumerate(zip(sub, samp)):
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        coefs = _fdct_quant(p[y0 : y0 + 8, x0 : x0 + 8], q)
                        newp, t, dbits, acs = _block_symbols(coefs, pred[ci])
                        pred[ci] = newp
                        blocks.append((ci, t, dbits, acs))
    dc_syms = {0: [], 1: []}
    ac_syms = {0: [], 1: []}
    tcls = lambda ci: 0 if ci == 0 else 1  # noqa: E731
    for ci, t, _, acs in blocks:
        dc_syms[tcls(ci)].append(t)
        ac_syms[tcls(ci)].extend(s for s, _, _ in acs)
    tables = {}
    for cls in (0, 1):
        if dc_syms[cls]:
            tables[("dc", cls)] = _canonical_table(dc_syms[cls])
            tables[("ac", cls)] = _canonical_table(ac_syms[cls])

    out = bytearray(b"\xff\xd8")
    qtab = bytes([q] * 64)
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + qtab
    if not gray:
        out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x01" + qtab
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i in range(nc):
        sh, sv = samp[i]
        sof += bytes([i + 1, (sh << 4) | sv, 0 if i == 0 else (0 if gray else 1)])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for (kind, cls), (bits, vals, _) in sorted(tables.items()):
        body = bytes([(0 if kind == "dc" else 0x10) | cls]) + bytes(bits) + vals
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([nc])
    for i in range(nc):
        cls = tcls(i)
        sos += bytes([i + 1, (cls << 4) | cls])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    blocks_per_mcu = sum(sh * sv for sh, sv in samp)
    ecs = bytearray()
    bw = _BitWriter()
    rst = 0
    for i in range(0, len(blocks), blocks_per_mcu):
        mcu_idx = i // blocks_per_mcu
        if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
            bw.flush()
            ecs += bw.out + bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            bw = _BitWriter()
        for ci, t, dbits, acs in blocks[i : i + blocks_per_mcu]:
            cls = tcls(ci)
            dl, dc = tables[("dc", cls)][2][t]
            bw.put(dc, dl)
            bw.put(dbits, t)
            for sym, mbits, nb in acs:
                al, ac = tables[("ac", cls)][2][sym]
                bw.put(ac, al)
                if nb:
                    bw.put(mbits, nb)
    bw.flush()
    out += ecs + bw.out + b"\xff\xd9"
    return bytes(out)


def test_jpeg_gray_roundtrip():
    from rkmh_spark.functions.codecs import decode_jpeg

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(24, 17), dtype=np.uint8)
    payload = _encode_jpeg(img, q=4)
    assert sniff(payload) == "jpeg"
    dec = decode_jpeg(payload)
    assert dec.shape == (24, 17, 1)
    # flat q=4 + DCT rounding: reconstruction within a few levels
    assert np.abs(dec[:, :, 0].astype(int) - img.astype(int)).max() <= 8


def test_jpeg_color_444_roundtrip():
    from rkmh_spark.functions.codecs import decode_jpeg

    yy, xx = np.mgrid[0:19, 0:21]
    img = np.stack(
        [
            (yy * 5 + 30) % 256,
            (xx * 7 + 60) % 256,
            ((yy + xx) * 3 + 90) % 256,
        ],
        axis=2,
    ).astype(np.uint8)
    dec = decode_jpeg(_encode_jpeg(img, sampling=(1, 1), q=2))
    assert dec.shape == (19, 21, 3)
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 12


def test_jpeg_color_420_subsampled_roundtrip():
    from rkmh_spark.functions.codecs import decode_jpeg

    # smooth gradient: 4:2:0 chroma loss stays small, so a tight bound
    # still proves the upsample + color-convert path
    yy, xx = np.mgrid[0:33, 0:30]
    img = np.stack(
        [120 + yy, 90 + xx, 60 + (yy + xx) // 2], axis=2
    ).astype(np.uint8)
    dec = decode_jpeg(_encode_jpeg(img, sampling=(2, 2), q=2))
    assert dec.shape == (33, 30, 3)
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 16


def test_jpeg_rejects_progressive():
    from rkmh_spark.functions.codecs import decode_jpeg

    sof2 = b"\xff\xd8\xff\xc2" + struct.pack(">H", 11) + bytes(9) + b"\xff\xd9"
    with pytest.raises(UnsupportedMediaError, match="non-baseline"):
        decode_jpeg(sof2)


def test_jpeg_feature_dispatch():
    img = np.full((16, 16), 99, dtype=np.uint8)
    feats = real_decode_features(_encode_jpeg(img, q=2), kind="image")
    assert feats[0] == 16.0 and feats[1] == 16.0 and feats[2] == 1.0
    assert abs(feats[3] - 99 / 255) < 0.02


def test_jpeg_restart_markers():
    from rkmh_spark.functions.codecs import decode_jpeg

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, size=(16, 40), dtype=np.uint8)  # 10 MCUs
    payload = _encode_jpeg(img, q=4, restart_interval=3)
    assert b"\xff\xdd" in payload  # DRI emitted
    assert any(bytes([0xFF, 0xD0 + i]) in payload for i in range(8))
    dec = decode_jpeg(payload)
    assert dec.shape == (16, 40, 1)
    assert np.abs(dec[:, :, 0].astype(int) - img.astype(int)).max() <= 8


# ---------------------------------------------------------------------------
# MP4 container metadata — fixture built from the ISO-BMFF spec by hand

def _mp4_box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def _mp4_bytes(duration_units=5000, timescale=1000, w=640, h=360) -> bytes:
    ftyp = _mp4_box(b"ftyp", b"mp42\x00\x00\x00\x00mp42")
    # mvhd v0: verflags, creation, modification, timescale, duration,
    # then rate/volume/reserved/matrix/predefined/next_track (unread pad)
    mvhd = _mp4_box(
        b"mvhd",
        bytes(4)
        + struct.pack(">IIII", 0, 0, timescale, duration_units)
        + bytes(80),
    )
    # tkhd v0: verflags + (creation, modification, track_ID, reserved,
    # duration) + 52 pad bytes (layer..matrix) + 16.16 width/height
    tkhd = _mp4_box(
        b"tkhd",
        bytes(4)
        + struct.pack(">IIIII", 0, 0, 1, 0, duration_units)
        + bytes(52)
        + struct.pack(">II", w << 16, h << 16),
    )
    avc1 = struct.pack(">I", 16) + b"avc1" + bytes(8)
    stsd = _mp4_box(b"stsd", bytes(4) + struct.pack(">I", 1) + avc1)
    mdia = _mp4_box(b"mdia", _mp4_box(b"minf", _mp4_box(b"stbl", stsd)))
    trak = _mp4_box(b"trak", tkhd + mdia)
    moov = _mp4_box(b"moov", mvhd + trak)
    return ftyp + moov


def test_mp4_container_metadata():
    from rkmh_spark.functions.codecs import parse_mp4_metadata

    payload = _mp4_bytes()
    assert sniff(payload) == "mp4"
    meta = parse_mp4_metadata(payload)
    assert meta["duration_sec"] == 5.0
    assert meta["timescale"] == 1000
    assert meta["n_tracks"] == 1
    assert (meta["width"], meta["height"]) == (640, 360)
    assert meta["codecs"] == ["avc1"]


def test_mp4_feature_dispatch_and_truncation():
    feats = real_decode_features(_mp4_bytes(), kind="video")
    assert feats[0] == 5.0 and feats[2] == 1.0
    assert feats[3] == 640.0 and feats[4] == 360.0
    # truncated box tree maps to the honest boundary, not struct.error
    with pytest.raises(UnsupportedMediaError):
        real_decode_features(_mp4_bytes()[:40], kind="video")


def test_jpeg_restart_padded_ff_before_marker():
    """r4 review finding (reproduced 126/200 before the fix): when the
    flush-padded byte before an RSTn is 0xFF, the encoder byte-stuffs it
    (FF 00) and the decoder's marker probe must look past the stuffing —
    otherwise the RST is never consumed and DC prediction never resets.
    Sweep many seeds at restart_interval=1 (maximum marker density)."""
    from rkmh_spark.functions.codecs import decode_jpeg

    for seed in range(30):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, size=(8, 32), dtype=np.uint8)  # 4 MCUs
        dec = decode_jpeg(_encode_jpeg(img, q=4, restart_interval=1))
        err = np.abs(dec[:, :, 0].astype(int) - img.astype(int)).max()
        assert err <= 8, (seed, err)


def test_jpeg_missing_tables_hits_honest_boundary():
    """r4 review finding: SOF0+SOS without DQT/DHT must surface as
    UnsupportedMediaError, not a raw KeyError through the dispatch."""
    sof = b"\xff\xc0" + struct.pack(">H", 11) + struct.pack(
        ">BHHB", 8, 8, 8, 1
    ) + bytes([1, 0x11, 0])
    sos = b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00, 0, 63, 0])
    payload = b"\xff\xd8" + sof + sos + b"\x00" * 8 + b"\xff\xd9"
    with pytest.raises(UnsupportedMediaError):
        real_decode_features(payload, kind="image")


def test_jpeg_zero_sampling_factor_hits_honest_boundary():
    """ADVICE r4 (medium): SOF0 declaring h or v = 0 previously reached
    the upsample's vmax // v as a raw ZeroDivisionError, escaping the
    honest boundary and failing the whole task. Also reject factors > 2
    (subsampling layouts this decoder doesn't implement)."""
    from rkmh_spark.functions.codecs import decode_jpeg

    def sof_payload(hv: int) -> bytes:
        sof = b"\xff\xc0" + struct.pack(">H", 11) + struct.pack(
            ">BHHB", 8, 8, 8, 1
        ) + bytes([1, hv, 0])
        return b"\xff\xd8" + sof + b"\xff\xd9"

    for hv in (0x01, 0x10, 0x41, 0x14):  # h=0 / v=0 / h=4 / v=4
        with pytest.raises(UnsupportedMediaError, match="sampling factor"):
            decode_jpeg(sof_payload(hv))
        # and through the dispatch seam, still the honest boundary
        with pytest.raises(UnsupportedMediaError):
            real_decode_features(sof_payload(hv), kind="image")


def test_jpeg_missing_rst_at_restart_boundary_raises():
    """ADVICE r4: DRI set but no RSTn in the entropy stream at an MCU
    restart boundary — spec-valid streams always carry the marker; the
    decoder must raise instead of silently decoding garbage with stale
    DC predictors. Built by splicing a DRI segment into a stream encoded
    WITHOUT restart markers."""
    from rkmh_spark.functions.codecs import decode_jpeg

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(16, 40), dtype=np.uint8)  # 10 MCUs
    payload = _encode_jpeg(img, q=4, restart_interval=0)
    assert b"\xff\xdd" not in payload
    sos_at = payload.index(b"\xff\xda")
    spliced = (
        payload[:sos_at]
        + b"\xff\xdd" + struct.pack(">HH", 4, 3)
        + payload[sos_at:]
    )
    with pytest.raises(UnsupportedMediaError, match="RSTn"):
        decode_jpeg(spliced)


def _stbl_with_sample_tables(uniform: bool) -> bytes:
    """stbl carrying stsd + stsz + stco, built from the ISO-BMFF spec."""
    avc1 = struct.pack(">I", 16) + b"avc1" + bytes(8)
    stsd = _mp4_box(b"stsd", bytes(4) + struct.pack(">I", 1) + avc1)
    if uniform:
        stsz = _mp4_box(b"stsz", bytes(4) + struct.pack(">II", 200, 10))
    else:
        sizes = [100, 200, 300, 400, 500]
        stsz = _mp4_box(
            b"stsz",
            bytes(4)
            + struct.pack(">II", 0, len(sizes))
            + b"".join(struct.pack(">I", s) for s in sizes),
        )
    stco = _mp4_box(
        b"stco", bytes(4) + struct.pack(">III", 2, 4096, 65536)
    )
    return _mp4_box(b"stbl", stsd + stsz + stco)


def test_mp4_sample_tables_parsed():
    """VERDICT r4 #8: stsz/stco sample-table metadata (frame counts, byte
    totals, chunk counts) without frame decode. Both stsz spellings:
    per-sample size table (sample_size=0) and uniform sample_size."""
    from rkmh_spark.functions.codecs import parse_mp4_metadata

    def payload(uniform):
        ftyp = _mp4_box(b"ftyp", b"mp42\x00\x00\x00\x00mp42")
        mvhd = _mp4_box(
            b"mvhd",
            bytes(4) + struct.pack(">IIII", 0, 0, 1000, 5000) + bytes(80),
        )
        tkhd = _mp4_box(
            b"tkhd",
            bytes(4)
            + struct.pack(">IIIII", 0, 0, 1, 0, 5000)
            + bytes(52)
            + struct.pack(">II", 640 << 16, 360 << 16),
        )
        mdia = _mp4_box(
            b"mdia", _mp4_box(b"minf", _stbl_with_sample_tables(uniform))
        )
        moov = _mp4_box(b"moov", mvhd + _mp4_box(b"trak", tkhd + mdia))
        return ftyp + moov

    meta = parse_mp4_metadata(payload(uniform=False))
    assert meta["n_samples"] == 5
    assert meta["total_sample_bytes"] == 1500
    assert meta["n_chunks"] == 2
    meta_u = parse_mp4_metadata(payload(uniform=True))
    assert meta_u["n_samples"] == 10
    assert meta_u["total_sample_bytes"] == 2000

    # features: n_samples / n_chunks / mean byte rate at positions 5-7
    feats = real_decode_features(payload(uniform=False), kind="video")
    assert feats[5] == 5.0 and feats[6] == 2.0
    assert abs(feats[7] - 1500 / 5.0) < 1e-6

    # stsz declaring more entries than its box holds → honest boundary
    bad_stsz = _mp4_box(
        b"stsz", bytes(4) + struct.pack(">II", 0, 999) + b"\x00" * 8
    )
    ftyp = _mp4_box(b"ftyp", b"mp42\x00\x00\x00\x00mp42")
    mvhd = _mp4_box(
        b"mvhd",
        bytes(4) + struct.pack(">IIII", 0, 0, 1000, 5000) + bytes(80),
    )
    moov = _mp4_box(b"moov", mvhd + _mp4_box(b"stbl", bad_stsz))
    with pytest.raises(UnsupportedMediaError, match="stsz"):
        parse_mp4_metadata(ftyp + moov)


# ---------------------------------------------------------------------------
# Progressive JPEG (SOF2) DC-scan preview — from-spec progressive encoder
# built HERE (reuses this file's independent forward-DCT / bit-writer /
# canonical-table helpers, which share no code with the decoder).


def _encode_jpeg_progressive_dc(
    img: np.ndarray,
    sampling=None,
    q: int = 4,
    al: int = 0,
    restart_interval: int = 0,
    trailing_ac_scan: bool = True,
) -> bytes:
    """Progressive JPEG whose first scan is a full interleaved DC scan at
    successive-approximation low bit `al` (T.81 G.1.2.1: DIFF coding over
    the point-transformed DC values). `trailing_ac_scan` appends a second
    (AC) scan header + junk entropy bytes to prove the preview decoder
    stops after the DC scan."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
    else:
        r, g, b = (img[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        sh, sv = sampling or (1, 1)
        planes, samp = [y, cb, cr], [(sh, sv), (1, 1), (1, 1)]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    sub = []
    for p, (sh, sv) in zip(planes, samp):
        full_h, full_w = mcus_y * 8 * vmax, mcus_x * 8 * hmax
        pp = np.pad(p, ((0, full_h - h), (0, full_w - w)), mode="edge")
        fy, fx = vmax // sv, hmax // sh
        if fy > 1 or fx > 1:
            pp = pp.reshape(full_h // fy, fy, full_w // fx, fx).mean((1, 3))
        sub.append(pp)

    # pass 1: per-MCU interleaved DC symbols (point-transformed diffs)
    blocks = []  # (comp_idx, category, magnitude_bits)
    pred = [0] * len(planes)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            mcu_idx = my * mcus_x + mx
            if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
                pred = [0] * len(planes)
            for ci, (p, (sh, sv)) in enumerate(zip(sub, samp)):
                for by in range(sv):
                    for bx in range(sh):
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        dc = _fdct_quant(p[y0 : y0 + 8, x0 : x0 + 8], q)[0]
                        shifted = dc >> al  # spec: arithmetic shift
                        diff = shifted - pred[ci]
                        pred[ci] = shifted
                        t = _category(diff)
                        blocks.append((ci, t, _mag_bits(diff, t)))
    tcls = lambda ci: 0 if ci == 0 else 1  # noqa: E731
    dc_syms = {0: [], 1: []}
    for ci, t, _ in blocks:
        dc_syms[tcls(ci)].append(t)
    tables = {
        cls: _canonical_table(syms) for cls, syms in dc_syms.items() if syms
    }

    out = bytearray(b"\xff\xd8")
    qtab = bytes([q] * 64)
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + qtab
    if not gray:
        out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x01" + qtab
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for i in range(nc):
        sh, sv = samp[i]
        sof += bytes(
            [i + 1, (sh << 4) | sv, 0 if i == 0 else (0 if gray else 1)]
        )
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof  # SOF2
    for cls, (bits, vals, _) in sorted(tables.items()):
        body = bytes([cls]) + bytes(bits) + vals  # class 0 = DC
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([nc])
    for i in range(nc):
        sos += bytes([i + 1, tcls(i) << 4])  # Ta=0 (no AC table in DC scan)
    sos += bytes([0, 0, al])  # Ss=0 Se=0 Ah=0 Al=al
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    blocks_per_mcu = sum(sh * sv for sh, sv in samp)
    ecs = bytearray()
    bw = _BitWriter()
    rst = 0
    for i in range(0, len(blocks), blocks_per_mcu):
        mcu_idx = i // blocks_per_mcu
        if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
            bw.flush()
            ecs += bw.out + bytes([0xFF, 0xD0 + (rst % 8)])
            rst += 1
            bw = _BitWriter()
        for ci, t, mbits in blocks[i : i + blocks_per_mcu]:
            dl, dc_code = tables[tcls(ci)][2][t]
            bw.put(dc_code, dl)
            if t:
                bw.put(mbits, t)
    bw.flush()
    out += ecs + bw.out
    if trailing_ac_scan:
        # second scan (luma AC 1..5): header + junk entropy bytes the
        # preview decoder must never read
        sos2 = bytes([1, 1, 0, 1, 5, 0])
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos2)) + sos2
        out += b"\x5a\x3c\x00\x7e"
    out += b"\xff\xd9"
    return bytes(out)


def test_jpeg_progressive_dc_preview_gray():
    """Preview of a block-constant gray image == the 8x8 block means
    (each DC-only block IDCTs to its mean), within quantizer rounding."""
    from rkmh_spark.functions.codecs import decode_jpeg_dc_preview

    rng = np.random.default_rng(7)
    means = rng.integers(20, 236, size=(3, 4))
    img = np.repeat(np.repeat(means, 8, axis=0), 8, axis=1).astype(np.uint8)
    prev = decode_jpeg_dc_preview(_encode_jpeg_progressive_dc(img, q=4))
    assert prev.shape == (24, 32, 1)
    got = prev[:, :, 0].reshape(3, 8, 4, 8).mean((1, 3))
    assert np.abs(got - means).max() <= 1.0
    # blocky: constant within every 8x8 block
    assert (prev[:, :, 0].reshape(3, 8, 4, 8).std((1, 3)) == 0).all()


def test_jpeg_progressive_dc_preview_color_420():
    """4:2:0 color progressive: tile-constant color survives the DC
    preview within color-transform + quantizer error; odd dimensions
    crop back to (H, W, 3)."""
    from rkmh_spark.functions.codecs import decode_jpeg_dc_preview

    rng = np.random.default_rng(11)
    tiles = rng.integers(30, 226, size=(2, 2, 3))
    img = np.repeat(np.repeat(tiles, 16, axis=0), 16, axis=1).astype(
        np.uint8
    )[:27, :29]
    prev = decode_jpeg_dc_preview(
        _encode_jpeg_progressive_dc(img, sampling=(2, 2), q=2)
    )
    assert prev.shape == (27, 29, 3)
    for ty in range(2):
        for tx in range(2):
            got = prev[ty * 16 : ty * 16 + 11, tx * 16 : tx * 16 + 11].mean(
                (0, 1)
            )
            assert np.abs(got - tiles[ty, tx]).max() < 3.0


def test_jpeg_progressive_dc_preview_al_and_restarts():
    """Successive approximation (Al=1) and restart markers both follow
    the spec path: preview error bounded by q * 2^Al / 8 per block."""
    from rkmh_spark.functions.codecs import decode_jpeg_dc_preview

    rng = np.random.default_rng(13)
    means = rng.integers(20, 236, size=(2, 3))
    img = np.repeat(np.repeat(means, 8, axis=0), 8, axis=1).astype(np.uint8)
    for al, ri in ((1, 0), (0, 1), (1, 2)):
        prev = decode_jpeg_dc_preview(
            _encode_jpeg_progressive_dc(img, q=4, al=al, restart_interval=ri)
        )
        got = prev[:, :, 0].reshape(2, 8, 3, 8).mean((1, 3))
        assert np.abs(got - means).max() <= 1.0 + (4 * (1 << al)) / 8.0


def test_jpeg_progressive_feature_dispatch():
    """real_decode_features no longer raises on progressive JPEG: it
    features the DC preview (dims/mean are the true image's)."""
    img = np.full((16, 24), 99, dtype=np.uint8)
    feats = real_decode_features(
        _encode_jpeg_progressive_dc(img, q=2), kind="image"
    )
    assert feats[0] == 16.0 and feats[1] == 24.0 and feats[2] == 1.0
    assert abs(feats[3] - 99 / 255) < 0.02


def test_jpeg_progressive_non_dc_first_scan_raises():
    """A progressive stream whose FIRST scan is not a full DC scan stays
    behind the honest boundary (so do baseline/arithmetic SOFs)."""
    from rkmh_spark.functions.codecs import decode_jpeg_dc_preview

    img = np.full((8, 8), 50, dtype=np.uint8)
    good = _encode_jpeg_progressive_dc(img, q=4)
    # patch the first SOS's Ss byte (scan header: ns=1 → Ss at +4+2*ns-3
    # from marker) — find marker, then offset: len 2 + [ns, c, tdta, Ss]
    i = good.index(b"\xff\xda")
    bad = bytearray(good)
    bad[i + 7] = 1  # marker(2)+len(2)+ns(1)+[c,tdta](2) → Ss=1: AC-first
    with pytest.raises(UnsupportedMediaError, match="not a full DC scan"):
        decode_jpeg_dc_preview(bytes(bad))
    # baseline stream through the preview API → clear redirect error
    with pytest.raises(UnsupportedMediaError, match="baseline"):
        decode_jpeg_dc_preview(_encode_jpeg(img, q=4))


def test_mp4_short_sample_table_headers_hit_honest_boundary():
    """stsz/stco whose HEADER fields don't fit inside the box must not
    silently read the sibling box's bytes as counts (review r5)."""
    from rkmh_spark.functions.codecs import parse_mp4_metadata

    ftyp = _mp4_box(b"ftyp", b"mp42\x00\x00\x00\x00mp42")
    mvhd = _mp4_box(
        b"mvhd", bytes(4) + struct.pack(">IIII", 0, 0, 1000, 5000) + bytes(80)
    )
    for short_box in (
        _mp4_box(b"stsz", bytes(6)),   # < 12-byte header
        _mp4_box(b"stco", bytes(5)),   # < 8-byte header
        _mp4_box(b"co64", bytes(4)),
    ):
        # a sibling box follows — without the bound check its bytes
        # would be misread as the table header
        sib = _mp4_box(b"free", bytes(16))
        moov = _mp4_box(b"moov", mvhd + _mp4_box(b"stbl", short_box + sib))
        with pytest.raises(UnsupportedMediaError, match="truncated"):
            parse_mp4_metadata(ftyp + moov)
