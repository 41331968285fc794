"""Pure-stdlib PNG codec (zlib + struct) — the r4 verdict's stretch
task #8: one REAL image decoder in-container despite the missing
PIL/soundfile wheels, so the multimodal pipeline's ``fake=False`` path
is exercised end-to-end rather than stubbed everywhere.

Scope (documented, checked, loudly rejected otherwise): 8-bit-depth,
non-interlaced, color types 0 (greyscale), 2 (RGB), 4 (grey+alpha) and
6 (RGBA) — the shapes ML ingest actually sees after normalization.
Palette (3), 16-bit and Adler/interlace exotica raise ValueError with
the offending field named. All five scanline filter types (None, Sub,
Up, Average, Paeth) are implemented per the PNG spec (RFC 2083 §6).

This is a driver/executor-side kernel: it runs inside the Arrow-batched
``mapInPandas`` decode stage (operators/multimodal.py), one payload at a
time — Spark parallelism comes from the partitioning, not from here.
"""

from __future__ import annotations

import struct
import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

#: color type → samples per pixel
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}

#: allocation budget: IHDR dims are attacker-controlled u32s and zlib
#: expands ~1000:1, so both the pixel buffer and the inflate output are
#: bounded by the declared dims BEFORE any allocation (mirrors the GIF
#: codec's MAX_PIXELS guard).
MAX_PIXELS = 1 << 24


def is_png(data: bytes) -> bool:
    return data[:8] == _PNG_SIG


def decode_png(data: bytes, max_pixels: int = MAX_PIXELS) -> tuple[int, int, int, bytes]:
    """Decode a PNG → (width, height, channels, raw pixel bytes,
    row-major, channels interleaved). Raises ValueError on anything
    outside the supported profile, including images whose declared
    ``width*height`` exceeds ``max_pixels`` (checked at IHDR parse,
    before the IDAT stream is inflated)."""
    if not is_png(data):
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    channels = 0
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos : pos + 4]), data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            if len(chunk) < 13:
                raise ValueError(f"truncated PNG IHDR ({len(chunk)} bytes)")
            width, height, bit_depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", chunk[:13]
            )
            if bit_depth != 8:
                raise ValueError(f"unsupported PNG bit depth {bit_depth} (only 8)")
            if color_type not in _CHANNELS:
                raise ValueError(
                    f"unsupported PNG color type {color_type} (no palette support)"
                )
            if interlace != 0:
                raise ValueError("unsupported interlaced PNG (Adam7)")
            if width == 0 or height == 0:
                # a 0xN image used to decode to an empty pixel buffer,
                # pushing ZeroDivisionError (aspect math) into callers
                # whose on_error sweeps catch ValueError only — reject
                # like the GIF/JPEG codecs do
                raise ValueError("PNG with zero dimension")
            if width * height > max_pixels:
                raise ValueError(
                    f"PNG {width}x{height} exceeds max_pixels={max_pixels}"
                )
            channels = _CHANNELS[color_type]
        elif ctype == b"IDAT":
            idat.extend(chunk)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    stride = width * channels
    expected = (stride + 1) * height
    try:
        # bounded inflate: output cannot exceed the declared dims even if
        # the stream is a zlib bomb — ask for one extra byte so an
        # overlong stream is detected as a length mismatch, not truncated
        # into a silently-wrong image.
        dec = zlib.decompressobj()
        raw = dec.decompress(bytes(idat), expected + 1)
    except zlib.error as e:
        # keep the documented contract: every rejection is a ValueError
        # naming the offending field (callers skip bad payloads on it)
        raise ValueError(f"corrupt PNG IDAT stream: {e}") from e
    if len(raw) != expected or dec.unconsumed_tail:
        raise ValueError(f"PNG data length {len(raw)} != expected {expected}")
    if not dec.eof:
        # a truncated stream can still yield exactly `expected` bytes
        # while missing its final block / adler32 — zlib only verifies
        # the checksum at end-of-stream, so require it explicitly
        raise ValueError("truncated PNG IDAT stream (no zlib end-of-stream)")
    out = bytearray(stride * height)
    prev_row = bytes(stride)
    bpp = channels  # bytes per pixel at depth 8
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        row = bytearray(raw[off + 1 : off + 1 + stride])
        if ftype == 0:  # None
            pass
        elif ftype == 1:  # Sub
            for i in range(bpp, stride):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev_row[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((left + prev_row[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                b = prev_row[i]
                c = prev_row[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        else:
            raise ValueError(f"invalid PNG filter type {ftype}")
        out[y * stride : (y + 1) * stride] = row
        prev_row = bytes(row)
    return width, height, channels, bytes(out)


def encode_png(width: int, height: int, channels: int, pixels: bytes) -> bytes:
    """Minimal valid PNG writer (filter 0 rows, one IDAT) — exists so
    tests can round-trip the decoder with stdlib only; not a production
    compressor."""
    color_type = {1: 0, 3: 2, 2: 4, 4: 6}.get(channels)
    if color_type is None:
        raise ValueError(f"channels must be 1, 2, 3 or 4, got {channels}")
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError("pixel buffer size does not match dims")

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        body = ctype + payload
        return struct.pack(">I", len(payload)) + body + struct.pack(
            ">I", zlib.crc32(body) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
    )
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
