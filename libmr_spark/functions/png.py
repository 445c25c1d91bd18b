"""Minimal PNG codec on the stdlib (`zlib` + `struct`) — no Pillow.

Exists so the multimodal image operators' ``mode='real'`` path is a
REAL decode even in a container without PIL (the same design as the
``wave``-module fallback in :func:`operators.multimodal.audio_features`).
Scope is deliberately small: 8-bit depth, grayscale (color type 0) and
truecolor RGB (type 2), non-interlaced — the subset a data pipeline's
thumbnail/feature stage actually produces. Anything else raises
``NotImplementedError`` naming the unsupported feature; PIL, when
installed, remains the preferred general decoder.

Implements the PNG spec (RFC 2083 / W3C PNG): chunk framing with CRC32,
IHDR/IDAT/IEND, and all five scanline filters (None/Sub/Up/Average/
Paeth) on decode; the encoder emits filter-0 rows (simplicity over
ratio — these are synthetic test payloads, not archival images).
"""

from __future__ import annotations

import struct
import zlib

SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def png_encode(width: int, height: int, pixels: bytes, channels: int = 1) -> bytes:
    """Encode 8-bit pixels (len == width*height*channels, row-major) as
    a PNG. ``channels``: 1 = grayscale, 3 = RGB."""
    if channels not in (1, 3):
        raise NotImplementedError(f"png_encode supports 1 or 3 channels, got {channels}")
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError(f"expected {stride * height} bytes, got {len(pixels)}")
    color_type = 0 if channels == 1 else 2
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(pixels[y * stride : (y + 1) * stride]) for y in range(height))
    return (
        SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def png_decode(data: bytes) -> tuple[int, int, int, bytearray]:
    """Decode a PNG → (width, height, channels, pixels). 8-bit
    grayscale/RGB, non-interlaced; all five row filters handled."""
    if data[:8] != SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos, idat = 8, bytearray()
    width = height = channels = None
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            width, height, depth, ctype, comp, filt, interlace = struct.unpack(">IIBBBBB", chunk)
            if depth != 8:
                raise NotImplementedError(f"bit depth {depth} (only 8 supported)")
            if ctype not in (0, 2):
                raise NotImplementedError(f"color type {ctype} (only grayscale/RGB supported)")
            if interlace != 0:
                raise NotImplementedError("interlaced PNG not supported")
            channels = 1 if ctype == 0 else 3
        elif typ == b"IDAT":
            idat += chunk
        elif typ == b"IEND":
            break
    if width is None:
        raise ValueError("no IHDR chunk")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    out = bytearray(height * stride)
    prev = bytearray(stride)
    p = 0
    for y in range(height):
        f = raw[p]
        row = bytearray(raw[p + 1 : p + 1 + stride])
        p += 1 + stride
        if f == 0:
            pass
        elif f == 1:  # Sub
            for i in range(channels, stride):
                row[i] = (row[i] + row[i - channels]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                left = row[i - channels] if i >= channels else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = row[i - channels] if i >= channels else 0
                b = prev[i]
                c = prev[i - channels] if i >= channels else 0
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {f}")
        out[y * stride : (y + 1) * stride] = row
        prev = row
    return width, height, channels, out


def to_grayscale(width: int, height: int, channels: int, pixels: bytearray) -> bytearray:
    """RGB → luma via the ITU-R 601 integer approximation
    (L = (299R + 587G + 114B) // 1000, the same formula PIL's
    ``convert('L')`` documents); grayscale passes through."""
    if channels == 1:
        return pixels
    out = bytearray(width * height)
    for i in range(width * height):
        r, g, b = pixels[3 * i], pixels[3 * i + 1], pixels[3 * i + 2]
        out[i] = (299 * r + 587 * g + 114 * b) // 1000
    return out


def resize_nearest(
    width: int, height: int, channels: int, pixels: bytearray, new_w: int, new_h: int
) -> bytearray:
    """Nearest-neighbor resample (deterministic, dependency-free). PIL,
    when present, is preferred and uses its own default resampling —
    the two real sub-paths agree on shape/schema, not on pixel values
    (documented; both are 'real' decodes of the same payload)."""
    out = bytearray(new_w * new_h * channels)
    for y in range(new_h):
        sy = min(y * height // new_h, height - 1)
        for x in range(new_w):
            sx = min(x * width // new_w, width - 1)
            for c in range(channels):
                out[(y * new_w + x) * channels + c] = pixels[(sy * width + sx) * channels + c]
    return out
