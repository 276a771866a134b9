"""Dependency-free image codec for the multimodal decode path.

Pure-Python encoders/decoders for two real container formats:

* **BMP** — 24-bit uncompressed ``BI_RGB`` with the standard 54-byte
  header, 4-byte row padding, bottom-up (default) or top-down rows.
* **PNG** — 8-bit-per-channel gray / RGB / gray+alpha / RGBA,
  non-interlaced, with full support for all five scanline filter types
  (None/Sub/Up/Average/Paeth).  DEFLATE comes from the stdlib ``zlib``
  module, so no third-party dependency is needed.

Both formats are published public specifications (BMP: Windows
BITMAPINFOHEADER layout; PNG: RFC 2083 / ISO 15948); the implementations
here are written from those specs.  The reference pipeline is text-only
(no analog) — this backs the training-data multimodal charter ops in
``kgspark.ops.multimodal``, replacing the round-3 ``NotImplementedError``
stub behind ``decode_image_real``.

Everything is deterministic integer arithmetic over ``bytes`` — decode
results are exactly replayable cross-engine, which the ``mm_decode_real``
driver query exploits (its DuckDB oracle recomputes the expected pixels
from the synthesis formula without decoding anything).

All functions raise ``ValueError`` on malformed input rather than
returning partial data.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# Below this many pixel bytes the scalar path wins: per-call numpy
# overhead (frombuffer/reshape/tobytes) exceeds the loop cost on the
# 8-16 px synthetic assets, while real-sized images (the 100 TB case)
# are decoded wholesale in C.  Tests drive both paths explicitly and
# assert byte-identical output (the scalar path IS the oracle).
_VEC_MIN_BYTES = 2048

# ---------------------------------------------------------------------------
# BMP (24-bit BI_RGB)
# ---------------------------------------------------------------------------

_BMP_HEADER_SIZE = 14
_DIB_MIN_SIZE = 40  # BITMAPINFOHEADER


def encode_bmp(width: int, height: int, rgb: bytes, top_down: bool = False) -> bytes:
    """Encode row-major top-down RGB bytes (3 per pixel) as a 24-bit
    uncompressed BMP.  ``top_down=False`` (the common layout) stores rows
    bottom-up with a positive height; ``True`` stores them as-is with a
    negative height."""
    if len(rgb) != width * height * 3:
        raise ValueError(f"rgb length {len(rgb)} != {width}x{height}x3")
    row_size = (3 * width + 3) & ~3  # pad each row to 4 bytes
    pad = b"\x00" * (row_size - 3 * width)
    rows = []
    order = range(height) if top_down else range(height - 1, -1, -1)
    for y in order:
        row = bytearray()
        base = y * width * 3
        for x in range(width):
            r, g, b = rgb[base + 3 * x: base + 3 * x + 3]
            row += bytes((b, g, r))  # BMP stores BGR
        rows.append(bytes(row) + pad)
    pixel_data = b"".join(rows)
    offset = _BMP_HEADER_SIZE + _DIB_MIN_SIZE
    file_size = offset + len(pixel_data)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, offset)
    dib = struct.pack(
        "<IiiHHIIiiII",
        _DIB_MIN_SIZE, width, -height if top_down else height,
        1, 24, 0, len(pixel_data), 2835, 2835, 0, 0,
    )
    return header + dib + pixel_data


def decode_bmp(data: bytes, vectorized: bool | None = None) -> tuple[int, int, int, bytes]:
    """Decode a 24-bit uncompressed BMP → (width, height, channels=3,
    row-major top-down RGB bytes).

    ``vectorized=None`` auto-picks: numpy strided views for the row
    un-shuffle + BGR→RGB flip when the pixel area clears
    ``_VEC_MIN_BYTES``, the scalar loop (the parity oracle) below it."""
    if len(data) < _BMP_HEADER_SIZE + _DIB_MIN_SIZE or data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", data, 10)[0]
    dib_size = struct.unpack_from("<I", data, 14)[0]
    if dib_size < _DIB_MIN_SIZE:
        raise ValueError(f"unsupported DIB header size {dib_size}")
    width, raw_height = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    compression = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    top_down = raw_height < 0
    height = -raw_height if top_down else raw_height
    if width <= 0 or height <= 0:
        raise ValueError(f"bad dimensions {width}x{raw_height}")
    row_size = (3 * width + 3) & ~3
    if offset + row_size * height > len(data):
        raise ValueError("truncated BMP pixel data")
    if vectorized is None:
        vectorized = 3 * width * height >= _VEC_MIN_BYTES
    if vectorized:
        rows = np.frombuffer(data, np.uint8, row_size * height, offset)
        px = rows.reshape(height, row_size)[:, : 3 * width]
        px = px.reshape(height, width, 3)
        if not top_down:
            px = px[::-1]
        return width, height, 3, px[:, :, ::-1].tobytes()
    out = bytearray(width * height * 3)
    for i in range(height):
        y = i if top_down else height - 1 - i
        src = offset + i * row_size
        dst = y * width * 3
        for x in range(width):
            b, g, r = data[src + 3 * x: src + 3 * x + 3]
            out[dst + 3 * x: dst + 3 * x + 3] = bytes((r, g, b))
    return width, height, 3, bytes(out)


# ---------------------------------------------------------------------------
# PNG (8-bit, non-interlaced)
# ---------------------------------------------------------------------------

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_CHANNELS_BY_COLOR_TYPE = {0: 1, 2: 3, 4: 2, 6: 4}
_COLOR_TYPE_BY_CHANNELS = {1: 0, 2: 4, 3: 2, 4: 6}


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload)) + ctype + payload
        + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png(width: int, height: int, pixels: bytes, channels: int = 3) -> bytes:
    """Encode row-major 8-bit pixel bytes as a non-interlaced PNG.

    The scanline filter type is chosen per row as ``y % 5``, so a
    round-trip exercises ALL five filters (None/Sub/Up/Average/Paeth) —
    deliberate: the decoder's filter coverage is then driven by any
    multi-row image, not just hand-built fixtures."""
    if channels not in _COLOR_TYPE_BY_CHANNELS:
        raise ValueError(f"unsupported channel count {channels}")
    if len(pixels) != width * height * channels:
        raise ValueError(
            f"pixel length {len(pixels)} != {width}x{height}x{channels}")
    stride = width * channels
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        row = pixels[y * stride:(y + 1) * stride]
        ftype = y % 5
        raw.append(ftype)
        for i in range(stride):
            x = row[i]
            a = row[i - channels] if i >= channels else 0
            b = prev[i]
            c = prev[i - channels] if i >= channels else 0
            if ftype == 0:
                f = x
            elif ftype == 1:
                f = (x - a) & 0xFF
            elif ftype == 2:
                f = (x - b) & 0xFF
            elif ftype == 3:
                f = (x - (a + b) // 2) & 0xFF
            else:
                f = (x - _paeth(a, b, c)) & 0xFF
            raw.append(f)
        prev = row
    ihdr = struct.pack(
        ">IIBBBBB", width, height, 8, _COLOR_TYPE_BY_CHANNELS[channels], 0, 0, 0)
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def _unfilter_row_scalar(ftype: int, filt, prev, channels: int):
    """Scalar reconstruction of one scanline (the parity oracle, and the
    live path for Average/Paeth: both reconstruct through the LEFT
    neighbor — ``(a+b)//2`` / the Paeth argmin — a nonlinear recurrence
    in x that no prefix-sum trick linearizes)."""
    stride = len(filt)
    row = bytearray(filt)
    for i in range(stride):
        a = row[i - channels] if i >= channels else 0
        b = prev[i]
        c = prev[i - channels] if i >= channels else 0
        if ftype == 1:
            row[i] = (row[i] + a) & 0xFF
        elif ftype == 2:
            row[i] = (row[i] + b) & 0xFF
        elif ftype == 3:
            row[i] = (row[i] + (a + b) // 2) & 0xFF
        elif ftype == 4:
            row[i] = (row[i] + _paeth(a, b, c)) & 0xFF
    return row


def decode_png(data: bytes, vectorized: bool | None = None) -> tuple[int, int, int, bytes]:
    """Decode an 8-bit non-interlaced PNG → (width, height, channels,
    row-major pixel bytes).  Verifies chunk CRCs; supports color types
    0/2/4/6 and all five scanline filters.

    ``vectorized=None`` auto-picks the numpy unfilter when the pixel
    area clears ``_VEC_MIN_BYTES``: None copies, Up is one wrapping
    uint8 row add, Sub is a per-lane prefix sum mod 256 (the recurrence
    is linear, so ``cumsum & 0xFF`` reconstructs it exactly); Average
    and Paeth stay scalar per row — their left-neighbor recurrence is
    nonlinear (integer halving / argmin), inherently sequential in x."""
    if not data.startswith(PNG_SIGNATURE):
        raise ValueError("not a PNG payload")
    pos = len(PNG_SIGNATURE)
    width = height = channels = -1
    idat = bytearray()
    seen_iend = False
    while pos + 8 <= len(data) and not seen_iend:
        length = struct.unpack_from(">I", data, pos)[0]
        ctype = data[pos + 4: pos + 8]
        if pos + 12 + length > len(data):
            raise ValueError("truncated PNG chunk")
        payload = data[pos + 8: pos + 8 + length]
        crc = struct.unpack_from(">I", data, pos + 8 + length)[0]
        if zlib.crc32(ctype + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", payload)
            if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
                raise ValueError(
                    f"unsupported PNG: depth={depth} interlace={interlace}")
            if color_type not in _CHANNELS_BY_COLOR_TYPE:
                raise ValueError(f"unsupported PNG color type {color_type}")
            channels = _CHANNELS_BY_COLOR_TYPE[color_type]
        elif ctype == b"IDAT":
            idat += payload
        elif ctype == b"IEND":
            seen_iend = True
        pos += 12 + length
    if width < 0 or not seen_iend:
        raise ValueError("missing IHDR/IEND")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG pixel data size mismatch")
    if vectorized is None:
        vectorized = stride * height >= _VEC_MIN_BYTES
    if vectorized:
        arr = np.frombuffer(raw, np.uint8).reshape(height, stride + 1)
        ftypes = arr[:, 0]
        bad = ftypes[ftypes > 4]
        if bad.size:
            raise ValueError(f"bad PNG filter type {int(bad[0])}")
        out_a = np.empty((height, stride), np.uint8)
        prev_a = np.zeros(stride, np.uint8)
        for y in range(height):
            ftype = int(ftypes[y])
            filt = arr[y, 1:]
            if ftype == 0:
                row_a = filt.copy()
            elif ftype == 2:
                row_a = filt + prev_a  # uint8 add wraps mod 256
            elif ftype == 1:
                lanes = filt.reshape(-1, channels).astype(np.int64)
                row_a = (np.cumsum(lanes, axis=0) & 0xFF) \
                    .astype(np.uint8).reshape(-1)
            else:  # 3 / 4: sequential left-neighbor recurrence
                row_a = np.frombuffer(
                    bytes(_unfilter_row_scalar(ftype, filt.tobytes(),
                                               prev_a.tobytes(), channels)),
                    np.uint8)
            out_a[y] = row_a
            prev_a = out_a[y]
        return width, height, channels, out_a.tobytes()
    out = bytearray(stride * height)
    prev = bytes(stride)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        if ftype > 4:
            raise ValueError(f"bad PNG filter type {ftype}")
        row = _unfilter_row_scalar(
            ftype, raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)],
            prev, channels)
        out[y * stride:(y + 1) * stride] = row
        prev = bytes(row)
    return width, height, channels, bytes(out)


# ---------------------------------------------------------------------------
# format sniffing
# ---------------------------------------------------------------------------

def decode_image(data: bytes, vectorized: bool | None = None
                 ) -> tuple[str, int, int, int, bytes]:
    """Sniff the container by magic bytes and decode →
    (format, width, height, channels, row-major pixel bytes).
    ``vectorized`` forwards to the codec (None = size-based auto)."""
    if data[:2] == b"BM":
        return ("bmp", *decode_bmp(data, vectorized=vectorized))
    if data.startswith(PNG_SIGNATURE):
        return ("png", *decode_png(data, vectorized=vectorized))
    raise ValueError(f"unrecognized image container (magic={data[:4]!r})")
