"""Pure stdlib+numpy media codecs for the multimodal pipeline — REAL
decode for the formats that need no native codec library:

- PNG  (zlib chunks + the five scanline filters; bit depth 8, color
  types 0/2/3/4/6, non-interlaced — interlace/16-bit raise
  ``UnsupportedMedia``)
- BMP  (BITMAPINFOHEADER, uncompressed 24/32-bit, bottom-up or top-down)
- PPM / PGM (P6/P5 binary)
- WAV  (PCM via the stdlib ``wave`` module)

JPEG and video stay out: both need entropy/transform codecs that only
exist as native libraries (libjpeg/ffmpeg), absent in this container —
``multimodal.extract_features`` routes them to the deterministic hash
fallback with ``decoded=false`` so the pipeline shape still holds.

Encoders for the same formats exist so tests can round-trip REAL bytes:
``decode_png(encode_png(a)) == a`` exactly, etc.

Reference parity note: nixiesearch's image path delegates to the JVM's
ImageIO inside the embedding preprocessors
(``core/nn/model/embedding/*``); this module is the Spark-side analog of
that decode step feeding the feature/embedding UDFs.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

try:  # make the module importable inside pandas-UDF workers by value
    import sys as _sys

    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(_sys.modules[__name__])
except Exception:  # pragma: no cover
    pass


class UnsupportedMedia(ValueError):
    """Payload is a recognized container but an unsupported variant."""


# ---------------------------------------------------------------------- PNG

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel (before palette expansion)
_PNG_SAMPLES = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> np.ndarray:
    """PNG → uint8 array (H, W) for grayscale or (H, W, C) otherwise."""
    if not data.startswith(_PNG_MAGIC):
        raise UnsupportedMedia("not a PNG")
    pos, ihdr, idat, plte = len(_PNG_MAGIC), None, [], None
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos : pos + 4]), data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # len + type + body + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise UnsupportedMedia("PNG missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise UnsupportedMedia(
            f"PNG variant not supported (depth={depth}, interlace={interlace})"
        )
    spp = _PNG_SAMPLES.get(color)
    if spp is None:
        raise UnsupportedMedia(f"PNG color type {color}")
    stride = w * spp
    # size sanity BEFORE any allocation (same guard BMP already had): the
    # IHDR dims are attacker-controlled, and a zlib bomb or huge declared
    # w*h would otherwise allocate/inflate executor memory unboundedly —
    # an OOM kill escapes media_features' per-blob except-Exception
    # fallback. Bounded decompressobj: inflate at most expected+1 bytes
    # and reject any trailing data.
    if w * h > 64_000_000:  # 64 MPix cap, matches the BMP guard's intent
        raise UnsupportedMedia(f"PNG dimensions too large ({w}x{h})")
    expected = h * (stride + 1)
    dec = zlib.decompressobj()
    raw = dec.decompress(b"".join(idat), expected + 1)
    if len(raw) != expected:  # short stream, or a bomb hitting the +1 cap
        raise UnsupportedMedia("PNG data length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    bpp = spp  # bytes per pixel at depth 8
    for y in range(h):
        row = raw[y * (stride + 1) : (y + 1) * (stride + 1)]
        ftype, line = row[0], np.frombuffer(row[1:], dtype=np.uint8).astype(np.int32)
        if ftype == 0:
            cur = line
        elif ftype == 2:  # Up — fully vectorized
            cur = (line + prev) & 0xFF
        elif ftype == 1:  # Sub — left-sequential per pixel column
            cur = line.copy()
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif ftype == 3:  # Average
            cur = line.copy()
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                upl = int(prev[x - bpp]) if x >= bpp else 0
                cur[x] = (cur[x] + _paeth(left, int(prev[x]), upl)) & 0xFF
        else:
            raise UnsupportedMedia(f"PNG filter {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    img = out.reshape(h, w, spp)
    if color == 3:  # palette → RGB (tRNS ignored: alpha-less palette view)
        if plte is None:
            raise UnsupportedMedia("paletted PNG without PLTE")
        img = plte[img[:, :, 0]]
    return img[:, :, 0] if img.shape[2] == 1 else img


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 (H, W) or (H, W, C in {1,2,3,4}) → PNG bytes (filter 0)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------- BMP


def decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BMP → uint8 (H, W, 3) RGB."""
    if data[:2] != b"BM":
        raise UnsupportedMedia("not a BMP")
    off = struct.unpack("<I", data[10:14])[0]
    hsz = struct.unpack("<I", data[14:18])[0]
    w, h = struct.unpack("<ii", data[18:26])
    _planes, bpp = struct.unpack("<HH", data[26:30])
    compression = struct.unpack("<I", data[30:34])[0]
    if hsz < 40 or compression != 0 or bpp not in (24, 32):
        raise UnsupportedMedia(f"BMP variant (header={hsz}, comp={compression}, bpp={bpp})")
    flip = h > 0
    h = abs(h)
    nb = bpp // 8
    stride = (w * nb + 3) & ~3
    # size sanity BEFORE allocation: a corrupt header must not trigger a
    # huge np.zeros or a silent short read
    if w <= 0 or h <= 0 or off + stride * h > len(data):
        raise UnsupportedMedia("BMP dimensions exceed payload")
    img = np.zeros((h, w, 3), dtype=np.uint8)
    for y in range(h):
        row = np.frombuffer(data[off + y * stride : off + y * stride + w * nb], dtype=np.uint8)
        row = row.reshape(w, nb)
        img[h - 1 - y if flip else y] = row[:, [2, 1, 0]]  # BGR(A) → RGB
    return img


def encode_bmp(arr: np.ndarray) -> bytes:
    """uint8 (H, W, 3) RGB → 24-bit bottom-up BMP bytes."""
    a = np.asarray(arr, dtype=np.uint8)
    h, w, _ = a.shape
    stride = (w * 3 + 3) & ~3
    body = bytearray()
    pad = b"\x00" * (stride - w * 3)
    for y in range(h - 1, -1, -1):
        body += a[y][:, [2, 1, 0]].tobytes() + pad
    header = b"BM" + struct.pack("<IHHI", 14 + 40 + len(body), 0, 0, 14 + 40)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + info + bytes(body)


# ------------------------------------------------------------------ PPM/PGM


def decode_ppm(data: bytes) -> np.ndarray:
    """Binary P6 (RGB) / P5 (gray) netpbm → uint8 array."""
    if data[:2] not in (b"P6", b"P5"):
        raise UnsupportedMedia("not a binary netpbm")
    fields, pos = [], 2
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":  # comment to EOL
            while data[pos : pos + 1] not in (b"\n", b""):
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise UnsupportedMedia("16-bit netpbm")
    c = 3 if data[:2] == b"P6" else 1
    img = np.frombuffer(data[pos : pos + w * h * c], dtype=np.uint8).reshape(h, w, c)
    return img[:, :, 0] if c == 1 else img


def encode_ppm(arr: np.ndarray) -> bytes:
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        return b"P5\n%d %d\n255\n" % (a.shape[1], a.shape[0]) + a.tobytes()
    return b"P6\n%d %d\n255\n" % (a.shape[1], a.shape[0]) + a.tobytes()


# ---------------------------------------------------------------------- WAV


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV → (int16 samples shaped (n, channels), sample_rate)."""
    try:
        with wave.open(io.BytesIO(data)) as f:
            n, ch, width, sr = f.getnframes(), f.getnchannels(), f.getsampwidth(), f.getframerate()
            raw = f.readframes(n)
    except (wave.Error, EOFError) as e:
        raise UnsupportedMedia(f"WAV: {e}") from e
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2")
    elif width == 1:  # 8-bit WAV is unsigned
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.int16) - 128) << 8
    else:
        raise UnsupportedMedia(f"WAV sample width {width}")
    return x.reshape(-1, ch), sr


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    x = np.asarray(samples, dtype=np.int16)
    if x.ndim == 1:
        x = x[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(x.shape[1])
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(x.astype("<i2").tobytes())
    return buf.getvalue()


# ------------------------------------------------------------ sniff + feats


def sniff(data: bytes) -> str | None:
    """Container by magic bytes; None = unknown (→ hash fallback)."""
    if data.startswith(_PNG_MAGIC):
        return "png"
    # "BM"/"P5"/"P6" are weak 2-byte magics that PLAIN TEXT can start
    # with — require the next structural byte too (header size / netpbm
    # whitespace) so text blobs keep taking the hash path
    if data[:2] == b"BM" and len(data) >= 54:
        return "bmp"
    if data[:2] in (b"P5", b"P6") and data[2:3].isspace():
        return "ppm"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    return None


_DECODERS = {"png": decode_png, "bmp": decode_bmp, "ppm": decode_ppm}


def decode_image(data: bytes) -> np.ndarray:
    kind = sniff(data)
    if kind not in _DECODERS:
        raise UnsupportedMedia(f"no image decoder for {kind or 'unknown'} payload")
    return _DECODERS[kind](data)


def image_features(img: np.ndarray) -> np.ndarray:
    """Deterministic 69-dim feature: [w, h, channels, mean/255, std/255] +
    the 64 average-hash bits of the 8×8 nearest-neighbor thumbnail (the
    classic near-dup aHash — feeds the embedding near-dup pipeline)."""
    a = np.asarray(img, dtype=np.float32)
    c = 1 if a.ndim == 2 else a.shape[2]
    gray = a if a.ndim == 2 else a[:, :, : min(c, 3)].mean(axis=2)
    h, w = gray.shape
    ri = (np.arange(8) * h) // 8
    ci = (np.arange(8) * w) // 8
    thumb = gray[np.ix_(ri, ci)]
    bits = (thumb > thumb.mean()).astype(np.float32).ravel()
    head = np.array(
        [w, h, c, float(a.mean()) / 255.0, float(a.std()) / 255.0], dtype=np.float32
    )
    return np.concatenate([head, bits]).astype(np.float32)


def audio_features(samples: np.ndarray, sample_rate: int) -> np.ndarray:
    """Deterministic 5-dim audio feature: [duration_sec, channels, rms,
    zero-crossing rate, spectral centroid / nyquist]."""
    x = samples.astype(np.float32) / 32768.0
    mono = x.mean(axis=1)
    n = len(mono)
    rms = float(np.sqrt(np.mean(mono**2))) if n else 0.0
    zcr = float(np.mean(np.abs(np.diff(np.signbit(mono))))) if n > 1 else 0.0
    if n > 1:
        spec = np.abs(np.fft.rfft(mono))
        freqs = np.fft.rfftfreq(n, d=1.0 / sample_rate)
        denom = float(spec.sum())
        centroid = float((freqs * spec).sum() / denom) if denom > 0 else 0.0
        centroid /= sample_rate / 2.0
    else:
        centroid = 0.0
    return np.array(
        [n / sample_rate, samples.shape[1], rms, zcr, centroid], dtype=np.float32
    )
