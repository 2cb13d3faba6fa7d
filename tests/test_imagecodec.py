"""Pure stdlib+numpy media codecs: exact round trips, independent filter
reconstruction, palette expansion, and the feature extractors."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from nixiesearch_spark.pipeline import imagecodec as ic


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip(channels):
    rng = np.random.default_rng(channels)
    a = rng.integers(0, 256, size=(13, 9, channels), dtype=np.uint8)
    if channels == 1:
        a = a[:, :, 0]
    dec = ic.decode_png(ic.encode_png(a))
    assert dec.shape == a.shape and (dec == a).all()


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def test_png_all_filters_decode():
    # hand-craft a PNG whose rows use filters 0..4 (our encoder only emits
    # filter 0, so this is an independent check of the reconstruction math)
    rng = np.random.default_rng(7)
    a = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    h, w, c = a.shape
    rows, prev = [], np.zeros(w * c, dtype=np.int32)
    for y in range(h):
        line = a[y].ravel().astype(np.int32)
        ft = y % 5
        f = line.copy()
        if ft == 1:
            for x in range(w * c - 1, c - 1, -1):
                f[x] = (f[x] - line[x - c]) % 256
        elif ft == 2:
            f = (line - prev) % 256
        elif ft == 3:
            for x in range(w * c - 1, -1, -1):
                left = line[x - c] if x >= c else 0
                f[x] = (f[x] - ((left + prev[x]) >> 1)) % 256
        elif ft == 4:
            for x in range(w * c - 1, -1, -1):
                left = int(line[x - c]) if x >= c else 0
                upl = int(prev[x - c]) if x >= c else 0
                f[x] = (f[x] - ic._paeth(left, int(prev[x]), upl)) % 256
        rows.append(bytes([ft]) + bytes(f.astype(np.uint8)))
        prev = line
    png = (
        ic._PNG_MAGIC
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + _chunk(b"IEND", b"")
    )
    assert (ic.decode_png(png) == a).all()


def test_png_palette():
    rng = np.random.default_rng(3)
    pal = rng.integers(0, 256, size=(4, 3), dtype=np.uint8)
    idx = rng.integers(0, 4, size=(5, 7), dtype=np.uint8)
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(5))
    png = (
        ic._PNG_MAGIC
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 7, 5, 8, 3, 0, 0, 0))
        + _chunk(b"PLTE", pal.tobytes())
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    assert (ic.decode_png(png) == pal[idx]).all()


def test_png_unsupported_variants():
    a = np.zeros((4, 4, 3), dtype=np.uint8)
    good = ic.encode_png(a)
    # 16-bit depth: patch IHDR depth byte and re-crc
    ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0)
    bad = ic._PNG_MAGIC + _chunk(b"IHDR", ihdr) + good[len(ic._PNG_MAGIC) + 25 :]
    with pytest.raises(ic.UnsupportedMedia):
        ic.decode_png(bad)
    with pytest.raises(ic.UnsupportedMedia):
        ic.decode_png(b"not a png at all")


def test_bmp_ppm_pgm_roundtrip():
    rng = np.random.default_rng(11)
    a = rng.integers(0, 256, size=(11, 6, 3), dtype=np.uint8)
    assert (ic.decode_bmp(ic.encode_bmp(a)) == a).all()
    assert (ic.decode_ppm(ic.encode_ppm(a)) == a).all()
    g = rng.integers(0, 256, size=(4, 9), dtype=np.uint8)
    assert (ic.decode_ppm(ic.encode_ppm(g)) == g).all()


def test_ppm_comment_header():
    a = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    data = b"P6\n# a comment\n2 2\n255\n" + a.tobytes()
    assert (ic.decode_ppm(data) == a).all()


def test_wav_roundtrip_and_features():
    sr = 8000
    t = np.arange(0, 800)
    sig = (np.sin(2 * np.pi * 440 * t / sr) * 20000).astype(np.int16)
    x, got_sr = ic.decode_wav(ic.encode_wav(sig, sr))
    assert got_sr == sr and x.shape == (800, 1) and (x[:, 0] == sig).all()
    f = ic.audio_features(x, sr)
    assert f.shape == (5,)
    assert f[0] == pytest.approx(0.1)  # duration
    assert f[1] == 1.0  # channels
    # a 440 Hz tone: rms ~ A/√2, centroid near 440/4000
    assert f[2] == pytest.approx(20000 / 32768 / np.sqrt(2), rel=0.01)
    assert f[4] == pytest.approx(440 / 4000, rel=0.1)


def test_image_features_shape_and_ahash():
    rng = np.random.default_rng(5)
    a = rng.integers(0, 256, size=(20, 30, 3), dtype=np.uint8)
    f = ic.image_features(a)
    assert f.shape == (69,)
    assert (f[0], f[1], f[2]) == (30, 20, 3)
    bits = f[5:]
    assert set(np.unique(bits)) <= {0.0, 1.0}
    # aHash is stable under re-encode (decode∘encode is identity)
    f2 = ic.image_features(ic.decode_png(ic.encode_png(a)))
    assert (f == f2).all()


def test_corrupt_payloads_fall_back_not_crash():
    # valid magic + garbage body must degrade to the hash feature (one bad
    # blob cannot fail a Spark job), and text-ish blobs starting with the
    # weak 2-byte magics must not even route to a decoder
    from nixiesearch_spark.pipeline.multimodal import media_features

    bad = [
        ic._PNG_MAGIC + b"garbage-idat-not-zlib" * 3,
        b"BM" + b"\x00" * 60,  # bogus header, big enough to sniff as bmp
        b"P6 9999999 9999999 255 ",  # dims exceed payload
        b"RIFF1234WAVEgarbage",
        b"BMW dealers import cars",  # plain text, weak magic, len < 54
        b"P5 is a chess engine",  # 'P5' + space sniffs ppm; header garbage
    ]
    for p in bad:
        decoded, feats = media_features(p)
        assert not decoded, p[:10]
        assert len(feats) == 8 and (0 <= feats).all() and (feats <= 1).all()


def test_sniff():
    a = np.zeros((4, 4, 3), dtype=np.uint8)
    sig = np.zeros(16, dtype=np.int16)
    assert ic.sniff(ic.encode_png(a)) == "png"
    assert ic.sniff(ic.encode_bmp(a)) == "bmp"
    assert ic.sniff(ic.encode_ppm(a)) == "ppm"
    assert ic.sniff(ic.encode_wav(sig, 8000)) == "wav"
    assert ic.sniff(b"\xff\xd8\xff junk") is None  # JPEG → fallback path


def test_png_decompress_bomb_and_dims_guard():
    # ADVICE r5: IHDR dims are attacker-controlled — reject oversized
    # declared dims and cap the inflate at the expected byte count so a
    # zlib bomb cannot exhaust executor memory (BMP had this; PNG lacked it)
    import struct
    import zlib

    import pytest

    from nixiesearch_spark.pipeline.imagecodec import UnsupportedMedia, decode_png

    def chunk(t, b):
        return struct.pack(">I", len(b)) + t + b + struct.pack(">I", zlib.crc32(t + b))

    magic = b"\x89PNG\r\n\x1a\n"
    ihdr = chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
    bomb = magic + ihdr + chunk(b"IDAT", zlib.compress(b"\x00" * 50_000_000)) + chunk(b"IEND", b"")
    with pytest.raises(UnsupportedMedia):
        decode_png(bomb)
    ihdr2 = chunk(b"IHDR", struct.pack(">IIBBBBB", 100000, 100000, 8, 0, 0, 0, 0))
    huge = magic + ihdr2 + chunk(b"IDAT", zlib.compress(b"\x00" * 10)) + chunk(b"IEND", b"")
    with pytest.raises(UnsupportedMedia):
        decode_png(huge)
