"""Pure-stdlib GIF codec (LZW + palettes, ``struct`` only) — closes the
last stubbed media family: with PNG (functions/png_codec) covering
images and the stdlib ``wave`` parser covering audio, an animated-GIF
decoder makes the VIDEO frame-sample path (operators/multimodal.py
``sample_video_frames(fake=False)``) a real decode in-container, not a
``NotImplementedError``.

Scope (GIF87a/GIF89a per the W3C spec):

* global + local color tables, any bit depth 1-8
* full LZW decompression (variable code width, clear/EOI codes,
  deferred clear-code handling)
* interlaced frames (the 4-pass row shuffle)
* multi-frame animation with graphic-control disposal methods 0/1
  (keep), 2 (restore to background) and 3 (restore to previous),
  composited onto the logical screen with transparency honored —
  each yielded frame is the full canvas as RGB bytes, which is what a
  frame-dedup / frame-embedding stage wants
* plain-text / comment / application extensions are skipped

Anything structurally broken (bad signature, truncated stream, LZW
code out of range) raises ValueError naming the defect.

A minimal encoder (``encode_gif``) exists for round-trip tests: it
writes uncompressed-style LZW (emit literal codes, inserting clear
codes before width overflow) — valid GIF any decoder accepts, no
compression ratio ambitions.

This is a driver/executor-side kernel: it runs inside the
Arrow-batched ``mapInPandas`` frame-sample stage, one payload at a
time — Spark parallelism comes from the partitioning, not from here.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

_SIGS = (b"GIF87a", b"GIF89a")


def is_gif(data: bytes) -> bool:
    return data[:6] in _SIGS


def _read_color_table(data: bytes, pos: int, size: int) -> tuple[list[tuple[int, int, int]], int]:
    end = pos + 3 * size
    if end > len(data):
        raise ValueError("truncated GIF color table")
    table = [(data[i], data[i + 1], data[i + 2]) for i in range(pos, end, 3)]
    return table, end


def _read_subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a sub-block chain (len byte + payload, 0-terminated)."""
    out = bytearray()
    while True:
        if pos >= len(data):
            raise ValueError("truncated GIF sub-block chain")
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        if pos + n > len(data):
            raise ValueError("truncated GIF sub-block")
        out += data[pos : pos + n]
        pos += n


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> bytearray:
    """GIF-variant LZW → index stream of exactly n_pixels entries."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"bad GIF LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()

    # bit reader state (LSB-first within each byte)
    bitpos = 0
    total_bits = len(data) * 8

    def read_code(width: int) -> int:
        nonlocal bitpos
        if bitpos + width > total_bits:
            raise ValueError("truncated GIF LZW stream")
        byte_i, bit_o = divmod(bitpos, 8)
        val = int.from_bytes(data[byte_i : byte_i + 3], "little")
        bitpos += width
        return (val >> bit_o) & ((1 << width) - 1)

    def reset() -> tuple[list[bytes | None], int]:
        table: list[bytes | None] = [bytes([i]) for i in range(clear)] + [None, None]
        return table, min_code_size + 1

    table, width = reset()
    prev: bytes | None = None
    while len(out) < n_pixels:
        code = read_code(width)
        if code == clear:
            table, width = reset()
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table) and table[code] is not None:
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"GIF LZW code {code} out of range (table {len(table)})")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < n_pixels:
        raise ValueError(f"GIF LZW underrun: {len(out)} of {n_pixels} pixels")
    del out[n_pixels:]
    return out


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(indices: bytearray, w: int, h: int) -> bytearray:
    out = bytearray(len(indices))
    src_row = 0
    for start, step in _INTERLACE_PASSES:
        for y in range(start, h, step):
            out[y * w : (y + 1) * w] = indices[src_row * w : (src_row + 1) * w]
            src_row += 1
    return out


#: default decode budget: canvas pixels (16 MP ≈ 48 MB RGB canvas) and
#: composited output frames — a 40-byte hostile payload can CLAIM a
#: 65535×65535 screen; without these bounds the canvas allocation alone
#: would be ~12.9 GB before any frame data is validated
MAX_PIXELS = 1 << 24
MAX_FRAMES = 4096
#: joint budget: each yielded frame is a FULL canvas copy, so the cost
#: is frames x canvas — 16 MP and 4096 frames are each individually
#: legal, but together they'd composite ~196 GB from a ~40 KB payload.
#: 2^27 total pixels ≈ 384 MB of RGB output across all frames.
MAX_TOTAL_PIXELS = 1 << 27


def decode_gif(
    data: bytes,
    max_pixels: int = MAX_PIXELS,
    max_frames: int = MAX_FRAMES,
    max_total_pixels: int = MAX_TOTAL_PIXELS,
) -> tuple[int, int, list[bytes]]:
    """Decode a GIF → (width, height, frames) where each frame is the
    full logical-screen canvas as row-major RGB bytes (3·w·h), disposal
    and transparency already composited. ``max_pixels``/``max_frames``
    bound the decoded allocation (the header is attacker-controlled;
    the budget is checked BEFORE the canvas is allocated)."""
    if not is_gif(data):
        raise ValueError("not a GIF (bad signature)")
    if len(data) < 13:
        raise ValueError("truncated GIF header")
    w, h, packed, bg_index, _ratio = struct.unpack("<HHBBB", data[6:13])
    if w < 1 or h < 1:
        raise ValueError(f"bad GIF screen {w}x{h}")
    if w * h > max_pixels:
        raise ValueError(f"GIF screen {w}x{h} exceeds max_pixels={max_pixels}")
    pos = 13
    global_table: list[tuple[int, int, int]] = []
    if packed & 0x80:
        global_table, pos = _read_color_table(data, pos, 2 << (packed & 0x07))

    bg_rgb = global_table[bg_index] if bg_index < len(global_table) else (0, 0, 0)
    canvas = bytearray(bytes(bg_rgb) * (w * h))
    frames: list[bytes] = []
    transparent: int | None = None
    disposal = 0

    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(data):
                raise ValueError("truncated GIF extension")
            label = data[pos]
            pos += 1
            payload, pos = _read_subblocks(data, pos)
            if label == 0xF9 and len(payload) >= 4:  # graphic control
                flags = payload[0]
                disposal = (flags >> 2) & 0x07
                transparent = payload[3] if flags & 0x01 else None
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x} at offset {pos - 1}")
        if len(frames) >= max_frames:
            raise ValueError(f"GIF exceeds max_frames={max_frames}")
        if (len(frames) + 1) * w * h > max_total_pixels:
            raise ValueError(
                f"GIF composited output exceeds max_total_pixels="
                f"{max_total_pixels} ({len(frames) + 1} frames x {w}x{h} canvas)"
            )

        # image descriptor
        if pos + 9 > len(data):
            raise ValueError("truncated GIF image descriptor")
        fx, fy, fw, fh, fpacked = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        if fx + fw > w or fy + fh > h:
            raise ValueError(f"GIF frame rect ({fx},{fy},{fw},{fh}) exceeds screen {w}x{h}")
        table = global_table
        if fpacked & 0x80:
            table, pos = _read_color_table(data, pos, 2 << (fpacked & 0x07))
        if not table:
            raise ValueError("GIF frame with no color table")
        if pos >= len(data):
            raise ValueError("truncated GIF image data")
        min_code_size = data[pos]
        lzw, pos = _read_subblocks(data, pos + 1)
        indices = _lzw_decode(min_code_size, lzw, fw * fh)
        if fpacked & 0x40:
            indices = _deinterlace(indices, fw, fh)

        saved = bytes(canvas) if disposal == 3 else None
        for row in range(fh):
            base = ((fy + row) * w + fx) * 3
            line = indices[row * fw : (row + 1) * fw]
            for col, idx in enumerate(line):
                if idx == transparent:
                    continue
                if idx >= len(table):
                    raise ValueError(f"GIF pixel index {idx} outside color table ({len(table)})")
                canvas[base + col * 3 : base + col * 3 + 3] = bytes(table[idx])
        frames.append(bytes(canvas))

        if disposal == 2:  # restore to background over the frame rect
            for row in range(fh):
                base = ((fy + row) * w + fx) * 3
                canvas[base : base + fw * 3] = bytes(bg_rgb) * fw
        elif disposal == 3 and saved is not None:
            canvas = bytearray(saved)
        disposal = 0
        transparent = None

    if not frames:
        raise ValueError("GIF contains no image frames")
    return w, h, frames


def _lzw_encode_literals(indices: bytes, min_code_size: int) -> bytes:
    """Literal-codes-only LZW: every pixel is emitted as its own code,
    with a clear code re-sent whenever the (never-used) table would
    force a width bump. Spec-valid output any decoder accepts."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    # a decoder appends one table entry per code after the first; its
    # table starts at clear+2 and bumps the code width on reaching
    # 2*clear. n codes ⇒ clear+2+(n-1) entries, so n <= clear-2 keeps
    # the table strictly below the bump and our fixed width valid.
    budget = clear - 2
    since_clear = 0
    for idx in indices:
        if since_clear >= budget:
            emit(clear)
            since_clear = 0
        emit(idx)
        since_clear += 1
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def gif_metadata(
    data: bytes, max_frames: int = MAX_FRAMES
) -> tuple[int, int, int, float]:
    """Header-only (width, height, n_frames, duration_s) — walks the
    block structure skipping LZW image data by sub-block LENGTH only
    (no decompression, no canvas allocation), so a metadata sweep pays
    bytes-proportional IO and near-zero CPU. Duration is the sum of the
    graphic-control delays (centiseconds; frames without a GCE
    contribute 0, so a single-frame still reports 0.0)."""
    if not is_gif(data):
        raise ValueError("not a GIF (bad signature)")
    if len(data) < 13:
        raise ValueError("truncated GIF header")
    w, h, packed, _bg, _ratio = struct.unpack("<HHBBB", data[6:13])
    if w < 1 or h < 1:
        raise ValueError(f"bad GIF screen {w}x{h}")
    pos = 13
    if packed & 0x80:
        pos += 3 * (2 << (packed & 0x07))
        if pos > len(data):
            raise ValueError("truncated GIF global color table")
    n_frames = 0
    total_cs = 0
    pending_delay = 0
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(data):
                raise ValueError("truncated GIF extension")
            label = data[pos]
            pos += 1
            if label == 0xF9:
                payload, pos = _read_subblocks(data, pos)
                if len(payload) >= 4:
                    pending_delay = payload[1] | (payload[2] << 8)
            else:
                # comments / application blocks can be arbitrarily large:
                # skip by length, never materialize (the walk's promise)
                _n, pos = _skip_subblocks(data, pos)
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x} at offset {pos - 1}")
        if pos + 9 > len(data):
            raise ValueError("truncated GIF image descriptor")
        fpacked = data[pos + 8]
        pos += 9
        if fpacked & 0x80:
            pos += 3 * (2 << (fpacked & 0x07))
            if pos > len(data):
                raise ValueError("truncated GIF local color table")
        if pos >= len(data):
            raise ValueError("truncated GIF image data")
        pos += 1  # LZW min code size
        _payload, pos = _skip_subblocks(data, pos)
        n_frames += 1
        if n_frames > max_frames:
            raise ValueError(f"GIF exceeds max_frames={max_frames}")
        total_cs += pending_delay
        pending_delay = 0
    if n_frames == 0:
        raise ValueError("GIF contains no image frames")
    return w, h, n_frames, total_cs / 100.0


def _skip_subblocks(data: bytes, pos: int) -> tuple[None, int]:
    """Advance past a sub-block chain WITHOUT materializing the payload
    (the metadata walk's whole point — image data is skipped by length)."""
    while True:
        if pos >= len(data):
            raise ValueError("truncated GIF sub-blocks")
        n = data[pos]
        pos += 1
        if n == 0:
            return None, pos
        if pos + n > len(data):
            raise ValueError("truncated GIF sub-block")
        pos += n


def encode_gif(
    width: int,
    height: int,
    frames: list[bytes],
    palette: list[tuple[int, int, int]],
    interlace_first: bool = False,
) -> bytes:
    """Encode full-canvas palette-index frames (one ``bytes`` of w·h
    indices per frame) into a GIF89a. Palette is padded to a power of
    two (2..256). ``interlace_first`` writes frame 0 interlaced to
    exercise the decoder's 4-pass path."""
    if not frames:
        raise ValueError("need at least one frame")
    if not 1 <= len(palette) <= 256:
        raise ValueError(f"palette size {len(palette)} outside 1..256")
    for i, fr in enumerate(frames):
        if len(fr) != width * height:
            raise ValueError(f"frame {i} has {len(fr)} indices, want {width * height}")
        if max(fr) >= len(palette):
            raise ValueError(f"frame {i} indexes past the palette")
    size_pow = 1
    while (2 << (size_pow - 1)) < len(palette):
        size_pow += 1
    n_colors = 2 << (size_pow - 1)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0x80 | (size_pow - 1), 0, 0)
    for r, g, b in palette:
        out += bytes((r, g, b))
    out += b"\x00\x00\x00" * (n_colors - len(palette))
    min_code_size = max(2, size_pow)
    for i, fr in enumerate(frames):
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # GCE: disposal 0, no transparency
        ilace = interlace_first and i == 0
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0x40 if ilace else 0)
        indices = fr
        if ilace:
            shuffled = bytearray()
            for start, step in _INTERLACE_PASSES:
                for y in range(start, height, step):
                    shuffled += fr[y * width : (y + 1) * width]
            indices = bytes(shuffled)
        out.append(min_code_size)
        lzw = _lzw_encode_literals(indices, min_code_size)
        for off in range(0, len(lzw), 255):
            chunk = lzw[off : off + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += b"\x3b"
    return bytes(out)


def iter_frame_rgb(data: bytes) -> Iterator[tuple[int, bytes]]:
    """(frame_idx, rgb_bytes) pairs — the shape the frame-sample
    mapInPandas stage consumes."""
    _w, _h, frames = decode_gif(data)
    for i, fr in enumerate(frames):
        yield i, fr
