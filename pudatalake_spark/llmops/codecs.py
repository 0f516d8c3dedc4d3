"""Pure-stdlib media codecs for multimodal decode (SURVEY §2.10/§2.11).

This container has no PIL/torchaudio/pyav, but three real formats are
decodable with nothing beyond the standard library and numpy:

- **WAV** (RIFF PCM): stdlib ``wave`` handles the container; samples
  are fixed-width little-endian ints (``numpy.frombuffer``).
- **netpbm** (P5 PGM / P6 PPM): trivial ASCII header + raw raster.
- **PNG**: chunked container (struct) + zlib-compressed scanlines
  (stdlib ``zlib``) + the five per-row predictors from the PNG spec
  (None/Sub/Up/Average/Paeth), un-applied here in numpy/bytearray.
  8-bit gray / RGB / RGBA, non-interlaced — the shapes every PNG
  encoder emits by default.

Encoders exist for each so tests and operators can do full
encode -> decode roundtrips; the PNG encoder writes filter-0 rows
(decoder handles all five filters; handcrafted streams cover the
rest in tests/test_codecs.py).

These run INSIDE Arrow-batched mapInPandas workers (multimodal.py) —
per-row Python cost is the codec itself, amortized over Arrow batch
transfer, which is the right shape for binary payloads at 100 TB:
decode on executors, shuffle only the extracted features.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

# ---------------------------------------------------------------- WAV

def encode_wav(samples: np.ndarray, rate: int, channels: int = 1) -> bytes:
    """16-bit PCM RIFF/WAVE from an int16 sample array."""
    samples = np.asarray(samples, dtype="<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav(content: bytes) -> dict:
    """-> {format, rate, channels, n_samples, samples: int array}.
    ``n_samples`` counts individual sample values (frames x channels).
    """
    with wave.open(io.BytesIO(content), "rb") as w:
        channels, width, rate = w.getnchannels(), w.getsampwidth(), w.getframerate()
        raw = w.readframes(w.getnframes())
    dt = {1: "i1", 2: "<i2", 4: "<i4"}.get(width)
    if dt is None:
        raise NotImplementedError(f"wav: unsupported sample width {width}")
    samples = np.frombuffer(raw, dtype=dt).astype(np.int64)
    return {
        "format": "wav",
        "rate": rate,
        "channels": channels,
        "n_samples": samples.size,
        "samples": samples,
    }


# ------------------------------------------------------------- netpbm

def encode_ppm(img: np.ndarray) -> bytes:
    """P6 (HxWx3) or P5 (HxW) from a uint8 array."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 3 and img.shape[2] == 3:
        magic = b"P6"
        h, w = img.shape[:2]
    elif img.ndim == 2:
        magic = b"P5"
        h, w = img.shape
    else:
        raise ValueError(f"ppm: expected HxW or HxWx3, got {img.shape}")
    return magic + f"\n{w} {h}\n255\n".encode() + img.tobytes()


def decode_ppm(content: bytes) -> dict:
    """-> {format, width, height, channels, pixels: uint8 array}."""
    magic = content[:2]
    if magic not in (b"P5", b"P6"):
        raise NotImplementedError(f"netpbm: unsupported magic {magic!r}")
    # Header tokens (width, height, maxval) with '#' comments allowed.
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(content) and content[pos : pos + 1].isspace():
            pos += 1
        if content[pos : pos + 1] == b"#":
            pos = content.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(content) and not content[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(content[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval > 255:
        raise NotImplementedError("netpbm: 16-bit rasters not supported")
    ch = 3 if magic == b"P6" else 1
    raster = np.frombuffer(content, dtype=np.uint8, count=w * h * ch, offset=pos)
    shape = (h, w, 3) if ch == 3 else (h, w)
    return {
        "format": "ppm" if ch == 3 else "pgm",
        "width": w,
        "height": h,
        "channels": ch,
        "pixels": raster.reshape(shape).copy(),
    }


# ---------------------------------------------------------------- PNG

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel (8-bit depth only)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """8-bit PNG from HxW (gray), HxWx3 (RGB) or HxWx4 (RGBA) uint8."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color = {1: 0, 3: 2, 4: 6}.get(ch)
    if color is None:
        raise ValueError(f"png: unsupported channel count {ch}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    # Filter byte 0 (None) in front of every scanline.
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(content: bytes) -> dict:
    """-> {format, width, height, channels, pixels: uint8 array}.

    Full five-predictor unfiltering per the PNG spec; 8-bit depth,
    non-interlaced, color types 0/2/4/6.
    """
    if content[:8] != _PNG_SIG:
        raise NotImplementedError("png: bad signature")
    pos, idat, meta = 8, [], None
    while pos + 8 <= len(content):
        (length,) = struct.unpack_from(">I", content, pos)
        tag = content[pos + 4 : pos + 8]
        body = content[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", content, pos + 8 + length)
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"png: CRC mismatch in {tag!r}")
        if tag == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or color not in _PNG_CHANNELS:
                raise NotImplementedError(
                    f"png: depth {depth} / color type {color} not supported"
                )
            if interlace:
                raise NotImplementedError("png: interlaced images not supported")
            meta = (w, h, _PNG_CHANNELS[color])
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if meta is None or not idat:
        raise ValueError("png: missing IHDR or IDAT")
    w, h, ch = meta
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("png: decompressed size mismatch")
    out = bytearray(h * stride)
    prev = bytearray(stride)
    for y in range(h):
        f = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if f == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                c = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        elif f != 0:
            raise ValueError(f"png: unknown filter {f} on row {y}")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    pixels = np.frombuffer(bytes(out), dtype=np.uint8)
    shape = (h, w) if ch == 1 else (h, w, ch)
    return {
        "format": "png",
        "width": w,
        "height": h,
        "channels": ch,
        "pixels": pixels.reshape(shape).copy(),
    }


# ------------------------------------------------------------ dispatch

def sniff(content: bytes) -> str | None:
    """Identify a payload by magic bytes; None if unrecognized."""
    if content[:8] == _PNG_SIG:
        return "png"
    if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
        return "wav"
    if content[:2] in (b"P5", b"P6"):
        return "ppm"
    return None


def decode(content: bytes) -> dict:
    """Decode any supported payload (sniffed by magic). Raises
    NotImplementedError for formats needing absent codec libs — the
    caller decides whether to stub or propagate."""
    kind = sniff(bytes(content))
    if kind == "png":
        return decode_png(bytes(content))
    if kind == "wav":
        return decode_wav(bytes(content))
    if kind == "ppm":
        return decode_ppm(bytes(content))
    raise NotImplementedError(
        "unrecognized payload magic; JPEG/MP3/MP4 etc. need codec libs "
        "not present in this build"
    )
