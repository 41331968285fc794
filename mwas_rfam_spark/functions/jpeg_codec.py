"""Baseline + progressive JPEG codec (stdlib + numpy) — the r5
verdict's stretch task #8 plus the r9 closure of the last named codec
gap: a real in-container JPEG decoder so the third still-image format
joins PNG/GIF on the ``fake=False`` path despite the missing PIL
wheel.

Scope (documented, checked, loudly rejected otherwise): Huffman-coded
sequential DCT (SOF0) AND progressive DCT (SOF2 — spectral selection
and successive approximation, DC and AC first+refinement scans, EOB
runs, per T.81 annexes F/G; the refinement control flow follows the
spec's G.1.2.3 procedure, the same one libjpeg implements), 8-bit
precision, 1 (grayscale) or 3 (YCbCr) components, any integer
sampling factors (4:4:4, 4:2:2, 4:2:0, ...), restart intervals.
Arithmetic coding (SOF9+), hierarchical, lossless, 12-bit and CMYK
exotica raise ValueError naming the offending field — the same
contract as the PNG/GIF codecs (ITU-T T.81 is the spec; the
quantization tables in the encoder are Annex K's examples).

The encoder exists so tests can round-trip the decoder in-container:
baseline or progressive (``progressive=True`` emits a
libjpeg-style scan script — DC first at Al=1, DC refinement, and
per-component AC band scans at Al=1 with their Al=0 refinements — so
every progressive decode path is exercised, including EOB runs via
the encoder's EOBn accumulation), 4:4:4 or 4:2:0, fixed-structure
canonical Huffman tables (all 12 DC symbols at 4 bits, the AC symbols
at 8 bits — valid, deliberately simple rather than optimal; the
decoder reads the tables from the stream). Lossy by nature:
round-trip asserts bounded per-pixel error, not equality — but
progressive and baseline encodes of the SAME pixels quantize to the
SAME coefficients, so their decodes are asserted bit-identical.

This is a driver/executor-side kernel: it runs inside the Arrow-batched
``mapInPandas`` decode stage (operators/multimodal.py), one payload at
a time — Spark parallelism comes from the partitioning, not from here.
"""

from __future__ import annotations

import struct

import numpy as np

#: allocation budget, mirrors png_codec/gif_codec: SOF dims are
#: attacker-controlled; nothing is allocated before this check.
MAX_PIXELS = 1 << 24

_SOF_NAMES = {
    0xC1: "extended sequential (SOF1)",
    0xC3: "lossless (SOF3)",
    0xC5: "differential sequential (SOF5)",
    0xC6: "differential progressive (SOF6)",
    0xC7: "differential lossless (SOF7)",
    0xC9: "arithmetic sequential (SOF9)",
    0xCA: "arithmetic progressive (SOF10)",
    0xCB: "arithmetic lossless (SOF11)",
    0xCD: "differential arithmetic sequential (SOF13)",
    0xCE: "differential arithmetic progressive (SOF14)",
    0xCF: "differential arithmetic lossless (SOF15)",
}


def _zigzag_order() -> list[tuple[int, int]]:
    """The 64 (row, col) positions in JPEG zigzag order, generated from
    the traversal rule (anti-diagonal s: odd runs row 0..s, even runs
    row s..0) instead of a typed-in table."""
    out = []
    for s in range(15):
        rows = range(0, s + 1) if s % 2 else range(s, -1, -1)
        for r in rows:
            c = s - r
            if r < 8 and c < 8:
                out.append((r, c))
    return out


_ZIGZAG = _zigzag_order()

#: zigzag positions as index arrays — shared by the decoder's IDCT
#: stage and the encoder's quantization stage instead of being rebuilt
#: from the tuple list on every call.
_ZZ_ROWS = np.array([p[0] for p in _ZIGZAG])
_ZZ_COLS = np.array([p[1] for p in _ZIGZAG])

#: IDCT basis: A[u, x] = c(u) * cos((2x+1) u pi / 16), orthonormal.
_DCT_A = np.array(
    [
        [
            (np.sqrt(1.0 / 8.0) if u == 0 else np.sqrt(2.0 / 8.0))
            * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def is_jpeg(data: bytes) -> bool:
    return data[:3] == b"\xff\xd8\xff"


def _parse_sof0(seg: bytes, max_pixels: int) -> tuple[int, int, list[dict]]:
    """THE single SOF0 profile gate — decode_jpeg and jpeg_dims both
    parse through here, so the dims-only and pixel paths can never
    disagree about what decodes (8-bit, 1/3 components, dims budget,
    1..4 sampling factors that divide the frame maxima — non-divisor
    ratios would need fractional upsampling and are rejected, not
    mis-sized)."""
    if len(seg) < 6:
        raise ValueError(f"truncated JPEG SOF segment ({len(seg)} bytes)")
    prec, h, w, ncomp = struct.unpack(">BHHB", seg[:6])
    if len(seg) < 6 + 3 * ncomp:
        raise ValueError(
            f"truncated JPEG SOF segment ({len(seg)} bytes for {ncomp} components)"
        )
    if prec != 8:
        raise ValueError(f"unsupported JPEG precision {prec} (only 8-bit)")
    if ncomp not in (1, 3):
        raise ValueError(f"unsupported JPEG component count {ncomp} (1 or 3)")
    if w == 0 or h == 0:
        raise ValueError("JPEG with zero dimension")
    if w * h > max_pixels:
        raise ValueError(f"JPEG {w}x{h} exceeds max_pixels={max_pixels}")
    comps = []
    for i in range(ncomp):
        cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
        comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
    for c in comps:
        if not (1 <= c["h"] <= 4 and 1 <= c["v"] <= 4):
            raise ValueError(f"invalid JPEG sampling factors {c['h']}x{c['v']}")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    for c in comps:
        if hmax % c["h"] or vmax % c["v"]:
            raise ValueError(
                f"unsupported JPEG sampling ratio {c['h']}x{c['v']} vs "
                f"max {hmax}x{vmax} (non-integer upsampling factor)"
            )
    return h, w, comps


def jpeg_dims(data: bytes, max_pixels: int = MAX_PIXELS) -> tuple[int, int, int]:
    """Header-only (width, height, channels) from the SOF0/SOF2 segment
    — stops before any entropy decoding, so dims-only pipelines don't
    pay the Huffman + IDCT cost of a full decode. Applies the SAME
    profile checks as :func:`decode_jpeg` (shared :func:`_parse_sof0`)."""
    if not is_jpeg(data):
        raise ValueError("not a JPEG (bad SOI signature)")
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected JPEG marker at byte {pos}")
        marker = data[pos + 1]
        if marker == 0xFF:  # T.81 B.1.1.2 fill byte before a marker id
            pos += 1
            continue
        if marker == 0xD8 or marker == 0x01 or 0xD0 <= marker <= 0xD7:
            pos += 2  # standalone markers (SOI/TEM/RSTn) carry no length
            continue
        if marker == 0xD9:
            break
        (seg_len,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        seg = data[pos + 4 : pos + 2 + seg_len]
        if marker in _SOF_NAMES:
            raise ValueError(
                f"unsupported JPEG coding: {_SOF_NAMES[marker]} "
                "(baseline SOF0 / progressive SOF2 only)"
            )
        if marker in (0xC0, 0xC2):
            h, w, comps = _parse_sof0(seg, max_pixels)
            return w, h, len(comps)
        pos += 2 + seg_len
    raise ValueError("JPEG missing SOF0/SOF2 header")


# --------------------------------------------------------------- decode


class _BitReader:
    """MSB-first bit reader over entropy-coded JPEG data: 0xFF00 is a
    stuffed data byte; RSTn markers are consumed only via
    :meth:`restart`; any other marker mid-stream is corruption."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated JPEG entropy stream")
        b = d[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(d):
                raise ValueError("truncated JPEG entropy stream at 0xFF")
            nxt = d[self.pos]
            if nxt == 0x00:
                self.pos += 1
            else:
                # a real marker: unread it and fail the bit request —
                # callers hit this only on corrupt streams, because MCU
                # boundaries consume RSTn via restart()
                self.pos -= 1
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} inside JPEG scan")
        self.buf = (self.buf << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self, expected: int) -> None:
        """Byte-align and consume the RSTn marker at a restart boundary.
        T.81 B.1.1.2 allows any number of 0xFF fill bytes before the
        marker id — skip them (a marker is 0xFF followed by non-0xFF)."""
        self.buf = 0
        self.nbits = 0
        d = self.data
        self.pos = _next_marker_pos(d, self.pos)
        m = d[self.pos + 1]
        if m != 0xD0 + expected:
            raise ValueError(
                f"JPEG restart marker out of order: got 0xFF{m:02X}, "
                f"expected 0xFF{0xD0 + expected:02X}"
            )
        self.pos += 2


def _build_huffman(bits: list[int], vals: bytes) -> dict[tuple[int, int], int]:
    """Canonical JPEG Huffman table → {(code_length, code): symbol}."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _decode_huff(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code (no symbol within 16 bits)")


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map ``size``-bit magnitude to signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(data: bytes, max_pixels: int = MAX_PIXELS) -> tuple[int, int, int, bytes]:
    """Decode a baseline (SOF0) or progressive (SOF2) JPEG → (width,
    height, channels, raw pixel bytes, row-major, channels interleaved;
    3-channel output is RGB via BT.601 from YCbCr). Raises ValueError
    on anything outside the supported profile, including images whose
    declared dims exceed ``max_pixels`` (checked at SOF parse, before
    any allocation). A progressive stream accumulates coefficients
    across its scans and renders once at EOI — successive-approximation
    completeness is the stream author's contract (T.81 allows truncated
    progressions; whatever precision the scans delivered is rendered)."""
    if not is_jpeg(data):
        raise ValueError("not a JPEG (bad SOI signature)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> table
    restart_interval = 0
    frame = None  # (h, w, comps) from SOF0/SOF2
    progressive = False
    prog: dict | None = None  # progressive state (allocated at first SOS)
    base: dict | None = None  # baseline state (allocated at first SOS)
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected JPEG marker at byte {pos}")
        marker = data[pos + 1]
        if marker == 0xFF:  # T.81 B.1.1.2 fill byte before a marker id
            pos += 1
            continue
        if marker == 0xD8 or marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # standalone markers (stray SOI / TEM / RSTn): no length word
            pos += 2
            continue
        if marker == 0xD9:  # EOI: renders the accumulated progressive scans
            break
        (seg_len,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        seg = data[pos + 4 : pos + 2 + seg_len]
        if marker in _SOF_NAMES:
            raise ValueError(
                f"unsupported JPEG coding: {_SOF_NAMES[marker]} "
                "(baseline SOF0 / progressive SOF2 only)"
            )
        if marker == 0xDB:  # DQT
            s = 0
            while s < len(seg):
                pq, tq = seg[s] >> 4, seg[s] & 0x0F
                s += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[s : s + 64], dtype=np.uint8).astype(np.int32)
                    s += 64
                elif pq == 1:
                    tbl = np.frombuffer(seg[s : s + 128], dtype=">u2").astype(np.int32)
                    s += 128
                else:
                    raise ValueError(f"invalid JPEG DQT precision {pq}")
                if len(tbl) != 64:
                    raise ValueError("truncated JPEG DQT table")
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT
            s = 0
            while s + 17 <= len(seg):
                tc, th = seg[s] >> 4, seg[s] & 0x0F
                bits = list(seg[s + 1 : s + 17])
                n = sum(bits)
                vals = seg[s + 17 : s + 17 + n]
                if len(vals) != n:
                    raise ValueError("truncated JPEG DHT table")
                huff[(tc, th)] = _build_huffman(bits, vals)
                s += 17 + n
        elif marker == 0xDD:  # DRI
            if len(seg) < 2:
                raise ValueError(f"truncated JPEG DRI segment ({len(seg)} bytes)")
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker in (0xC0, 0xC2):  # SOF0/SOF2 — shared profile gate
            if frame is not None:
                raise ValueError("multiple JPEG frame headers")
            frame = _parse_sof0(seg, max_pixels)
            progressive = marker == 0xC2
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF0/SOF2")
            if len(seg) < 1 or len(seg) < 1 + 2 * seg[0] + 3:
                raise ValueError(
                    f"truncated JPEG SOS header ({len(seg)} bytes)"
                )
            h, w, comps = frame
            if progressive:
                if prog is None:
                    prog = _alloc_progressive(h, w, comps, max_pixels)
                pos = _decode_progressive_scan(
                    data, pos + 2 + seg_len, seg, prog, huff, restart_interval
                )
                continue  # pos now points at the next marker
            if base is None:
                base = _alloc_coef_state(h, w, comps, max_pixels, np.float64)
            pos = _decode_baseline_scan(
                data, pos + 2 + seg_len, seg, base, huff, restart_interval
            )
            continue  # pos now points at the next marker (or EOF)
        # APPn / COM / anything else: skip
        pos += 2 + seg_len
    if prog is not None or base is not None:
        h, w, comps = frame
        for c in comps:
            if c["tq"] not in qt:
                raise ValueError(
                    f"JPEG component references missing quant table {c['tq']}"
                )
            if prog is not None:
                c["coef"] = c["coef"].astype(np.float64)
        if base is not None:
            # baseline is sequential, not successive: unlike a truncated
            # progression (legal per T.81), a component that never got a
            # scan has NO data at any precision — refuse, don't render gray
            missing = [c["id"] for c in comps if c["id"] not in base["scanned"]]
            if missing:
                raise ValueError(
                    f"JPEG baseline stream ended before scanning component(s) {missing}"
                )
        return _idct_planes(comps, qt, h, w)
    raise ValueError("JPEG missing SOS (no scan data)")


def _mcu_grid(h, w, comps, max_pixels):
    """(hmax, vmax, mcus_x, mcus_y) + the allocation-budget guard — THE
    one MCU-geometry computation the baseline and progressive paths
    share (sampling-ratio divisibility already enforced by
    _parse_sof0)."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    if mcus_x * mcus_y * 64 * hmax * vmax > 4 * max_pixels:
        raise ValueError("JPEG MCU grid exceeds the allocation budget")
    return hmax, vmax, mcus_x, mcus_y


def _alloc_coef_state(h, w, comps, max_pixels, dtype):
    """Allocate the cross-scan coefficient state for a frame: one
    (n_blocks, 64) array per component over the MCU-padded grid
    (interleaved scans cover padding blocks; non-interleaved scans
    iterate only the true block grid and leave padding zero), plus the
    per-component true block dims and DC predictors. Shared by the
    progressive (int32) and baseline (float64) paths — both accumulate
    coefficients across scans and render at EOI, because T.81 allows a
    baseline frame to deliver its components in separate
    non-interleaved scans just like a progressive one."""
    hmax, vmax, mcus_x, mcus_y = _mcu_grid(h, w, comps, max_pixels)
    for c in comps:
        c["blocks_w"] = mcus_x * c["h"]
        c["blocks_h"] = mcus_y * c["v"]
        # true (unpadded) block grid for non-interleaved scans —
        # T.81 A.2.2: ceil(component dim / 8), NOT the MCU-padded grid
        c["tb_w"] = -(-(-(-w * c["h"] // hmax)) // 8)
        c["tb_h"] = -(-(-(-h * c["v"] // vmax)) // 8)
        c["coef"] = np.zeros((c["blocks_h"] * c["blocks_w"], 64), dtype=dtype)
        c["pred"] = 0
    return {
        "comps": comps,
        "by_id": {c["id"]: c for c in comps},
        "mcus_x": mcus_x,
        "mcus_y": mcus_y,
        "scanned": set(),
    }


def _alloc_progressive(h, w, comps, max_pixels):
    return _alloc_coef_state(h, w, comps, max_pixels, np.int32)


def _decode_baseline_block(r, blk, c, dc_tbl, ac_tbl):
    """Full baseline block (T.81 F.2.2): DC diff + AC runs into ``blk``
    (a zero row of the component's coef array)."""
    t = _decode_huff(r, dc_tbl)
    if t > 11:
        raise ValueError(f"invalid JPEG DC category {t}")
    c["pred"] += _extend(r.read_bits(t), t)
    blk[0] = c["pred"]
    k = 1
    while k < 64:
        rs = _decode_huff(r, ac_tbl)
        rr, ss = rs >> 4, rs & 0x0F
        if ss == 0:
            if rr == 15:
                k += 16  # ZRL
                continue
            break  # EOB
        k += rr
        if k > 63:
            raise ValueError("JPEG AC run past end of block")
        blk[k] = _extend(r.read_bits(ss), ss)
        k += 1


def _decode_baseline_scan(data, pos, seg, state, huff, restart_interval):
    """One SOF0 scan. ``ns == 1`` is non-interleaved per T.81 A.2:
    the MCU is a single data unit and the walk covers the component's
    TRUE block grid in raster order (NOT the MCU-padded grid — an
    interleaved walk mis-places every block of a grayscale frame with
    H or V > 1, and decodes padding blocks the stream never coded);
    restart intervals then count data units. ``ns == Nf`` is the
    interleaved MCU walk. A multi-component subset (1 < ns < Nf) is
    rejected by name. Returns the position of the marker following the
    entropy data, or EOF for legacy streams that end without EOI."""
    comps = state["comps"]
    ns = seg[0]
    scan = []
    for i in range(ns):
        cid, tt = seg[1 + 2 * i : 3 + 2 * i]
        c = state["by_id"].get(cid)
        if c is None:
            raise ValueError(f"JPEG scan references unknown component {cid}")
        c["dc"] = tt >> 4
        c["ac"] = tt & 0x0F
        c["pred"] = 0  # DC prediction resets at every scan start
        scan.append(c)
    if ns != 1 and ns != len(comps):
        raise ValueError(
            f"partially interleaved JPEG baseline scan ({ns} of "
            f"{len(comps)} components) unsupported"
        )
    for c in scan:
        if (0, c["dc"]) not in huff or (1, c["ac"]) not in huff:
            raise ValueError("JPEG scan references missing Huffman table")
        state["scanned"].add(c["id"])
    r = _BitReader(data, pos)
    rst = 0
    if ns == 1:
        c = scan[0]
        dc_tbl, ac_tbl = huff[(0, c["dc"])], huff[(1, c["ac"])]
        for m in range(c["tb_w"] * c["tb_h"]):
            if restart_interval and m and m % restart_interval == 0:
                r.restart(rst)
                rst = (rst + 1) & 7
                c["pred"] = 0
            row, col = divmod(m, c["tb_w"])
            _decode_baseline_block(
                r, c["coef"][row * c["blocks_w"] + col], c, dc_tbl, ac_tbl
            )
    else:
        mcus_x = state["mcus_x"]
        for m in range(mcus_x * state["mcus_y"]):
            if restart_interval and m and m % restart_interval == 0:
                r.restart(rst)
                rst = (rst + 1) & 7
                for c in scan:
                    c["pred"] = 0
            my, mx = divmod(m, mcus_x)
            for c in scan:
                dc_tbl, ac_tbl = huff[(0, c["dc"])], huff[(1, c["ac"])]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        row = my * c["v"] + by
                        col = mx * c["h"] + bx
                        _decode_baseline_block(
                            r, c["coef"][row * c["blocks_w"] + col], c, dc_tbl, ac_tbl
                        )
    try:
        return _next_marker_pos(data, r.pos)
    except ValueError:
        # entropy data ran to EOF with no trailing marker: streams that
        # omit EOI (or carry trailing junk) decoded under the old
        # single-scan path, which never looked past the scan — keep
        # accepting them and render what was delivered
        return len(data)


def _next_marker_pos(data: bytes, pos: int) -> int:
    """Position of the next real marker at/after ``pos``. Used where
    the entropy stream has ENDED (a progressive scan decoded its full
    block count; a restart boundary): any 0xFF fill bytes are skipped
    (T.81 B.1.1.2 — a marker is 0xFF followed by a non-0xFF id) and the
    next bytes must then be a marker, not stuffed data."""
    d = data
    while pos + 1 < len(d) and d[pos] == 0xFF and d[pos + 1] == 0xFF:
        pos += 1  # fill bytes before a marker id
    if pos + 1 >= len(d) or d[pos] != 0xFF or d[pos + 1] == 0x00:
        raise ValueError("expected JPEG marker at end of entropy data")
    return pos


def _decode_progressive_scan(data, pos, seg, prog, huff, restart_interval):
    """One SOF2 scan (T.81 G.2): parse the scan header (Ss/Se/Ah/Al +
    per-component entropy table ids), route each block through the
    right procedure (DC first / DC refine / AC first / AC refine), and
    return the stream position of the marker that follows the scan's
    entropy data. Interleaved (ns>1, DC only) scans walk the frame MCU
    grid; single-component scans walk that component's true block grid.
    Restart intervals reset DC predictors and the EOB run."""
    ns = seg[0]
    if not 1 <= ns <= len(prog["comps"]):
        raise ValueError(f"invalid JPEG scan component count {ns}")
    scan = []
    for i in range(ns):
        cid, tt = seg[1 + 2 * i : 3 + 2 * i]
        c = prog["by_id"].get(cid)
        if c is None:
            raise ValueError(f"JPEG scan references unknown component {cid}")
        c["dc"] = tt >> 4
        c["ac"] = tt & 0x0F
        scan.append(c)
    ss, se, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
    ah, al = ahal >> 4, ahal & 0x0F
    if not (0 <= ss <= se <= 63) or al > 13:
        raise ValueError(f"invalid JPEG progressive band Ss={ss} Se={se} Al={al}")
    if ss == 0 and se != 0:
        raise ValueError(
            "progressive JPEG scan with Ss=0 must have Se=0 "
            "(DC and AC may not share a scan)"
        )
    if ss > 0 and ns != 1:
        raise ValueError("progressive JPEG AC scans must be single-component")
    if ah != 0 and ah != al + 1:
        raise ValueError(
            f"invalid JPEG successive approximation Ah={ah} Al={al}"
        )
    r = _BitReader(data, pos)
    if ss == 0:
        _decode_dc_scan(r, prog, scan, ah, al, huff, restart_interval)
    else:
        _decode_ac_scan(r, scan[0], ss, se, ah, al, huff, restart_interval)
    return _next_marker_pos(data, r.pos)


def _decode_dc_scan(r, prog, scan, ah, al, huff, restart_interval):
    first = ah == 0
    if first:
        for c in scan:
            if (0, c["dc"]) not in huff:
                raise ValueError("JPEG scan references missing Huffman table")
            c["pred"] = 0
    interleaved = len(scan) > 1
    if interleaved:
        units = prog["mcus_x"] * prog["mcus_y"]
    else:
        units = scan[0]["tb_w"] * scan[0]["tb_h"]

    def dc_block(c, n):
        if first:
            t = _decode_huff(r, huff[(0, c["dc"])])
            if t > 11:
                raise ValueError(f"invalid JPEG DC category {t}")
            c["pred"] += _extend(r.read_bits(t), t)
            v = c["pred"] << al
            # the predictor accumulates diffs with no spec ceiling on a
            # hostile stream; shifted past int32 it would wrap (or raise
            # numpy's own OverflowError) in the coef store — fail as the
            # documented corruption contract instead
            if not -(1 << 31) <= v < (1 << 31):
                raise ValueError("JPEG DC coefficient overflow (corrupt stream)")
            c["coef"][n, 0] = v
        else:
            if r.read_bit():
                c["coef"][n, 0] = int(c["coef"][n, 0]) | (1 << al)

    rst = 0
    for m in range(units):
        if restart_interval and m and m % restart_interval == 0:
            r.restart(rst)
            rst = (rst + 1) & 7
            for c in scan:
                c["pred"] = 0
        if interleaved:
            my, mx = divmod(m, prog["mcus_x"])
            for c in scan:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        row = my * c["v"] + by
                        col = mx * c["h"] + bx
                        dc_block(c, row * c["blocks_w"] + col)
        else:
            c = scan[0]
            row, col = divmod(m, c["tb_w"])
            dc_block(c, row * c["blocks_w"] + col)


def _decode_ac_scan(r, c, ss, se, ah, al, huff, restart_interval):
    if (1, c["ac"]) not in huff:
        raise ValueError("JPEG scan references missing Huffman table")
    ac_tbl = huff[(1, c["ac"])]
    units = c["tb_w"] * c["tb_h"]
    eobrun = 0
    p1, m1 = 1 << al, -(1 << al)
    rst = 0
    for m in range(units):
        if restart_interval and m and m % restart_interval == 0:
            r.restart(rst)
            rst = (rst + 1) & 7
            eobrun = 0
        row, col = divmod(m, c["tb_w"])
        blk = c["coef"][row * c["blocks_w"] + col]
        if ah == 0:
            # AC first scan (T.81 G.1.2.2): EOBn runs skip whole blocks
            if eobrun > 0:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                rs = _decode_huff(r, ac_tbl)
                rr, sz = rs >> 4, rs & 0x0F
                if sz == 0:
                    if rr != 15:
                        eobrun = (1 << rr) - 1
                        if rr:
                            eobrun += r.read_bits(rr)
                        break
                    k += 16  # ZRL
                    continue
                k += rr
                if k > se:
                    raise ValueError("JPEG AC run past end of band")
                blk[k] = _extend(r.read_bits(sz), sz) << al
                k += 1
        else:
            # AC refinement scan (T.81 G.1.2.3): correction bits for
            # already-nonzero coefficients, +-1<<Al for newly-nonzero
            # ones, EOB runs carrying correction bits
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = _decode_huff(r, ac_tbl)
                    rr, sz = rs >> 4, rs & 0x0F
                    newval = 0
                    if sz == 0:
                        if rr != 15:
                            eobrun = 1 << rr
                            if rr:
                                eobrun += r.read_bits(rr)
                            break  # EOB tail below handles this block
                        # rr == 15: ZRL — skip 16 zero-history coefs
                    else:
                        if sz != 1:
                            raise ValueError(
                                "invalid JPEG AC refinement symbol (size != 1)"
                            )
                        newval = p1 if r.read_bit() else m1
                    while k <= se:
                        v = int(blk[k])
                        if v != 0:
                            if r.read_bit() and not (v & p1):
                                blk[k] = v + (p1 if v >= 0 else m1)
                        else:
                            if rr == 0:
                                break
                            rr -= 1
                        k += 1
                    if newval:
                        if k > se:
                            raise ValueError("JPEG AC refinement run past band")
                        blk[k] = newval
                    k += 1
            if eobrun > 0:
                while k <= se:
                    v = int(blk[k])
                    if v != 0:
                        if r.read_bit() and not (v & p1):
                            blk[k] = v + (p1 if v >= 0 else m1)
                    k += 1
                eobrun -= 1


def _idct_planes(comps, qt, h, w):
    """Dequantize + IDCT + upsample + color-convert the accumulated
    per-component coefficient arrays — the SHARED finishing stage of
    the baseline single-scan path and the progressive multi-scan path
    (each comp carries coef (n_blocks, 64, zigzag order), blocks_w/h,
    tq, h, v)."""
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    planes = []
    for c in comps:
        q = qt[c["tq"]].astype(np.float64)
        coef = c["coef"] * q  # both in zigzag order
        grid = np.zeros((len(coef), 8, 8))
        grid[:, _ZZ_ROWS, _ZZ_COLS] = coef
        spatial = np.einsum("ux,nuv,vy->nxy", _DCT_A, grid, _DCT_A)
        plane = (
            spatial.reshape(c["blocks_h"], c["blocks_w"], 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c["blocks_h"] * 8, c["blocks_w"] * 8)
        )
        plane = np.clip(np.round(plane + 128.0), 0, 255)
        # crop to the component's true size, then upsample to full res
        cw = -(-w * c["h"] // hmax)
        ch = -(-h * c["v"] // vmax)
        plane = plane[:ch, :cw]
        plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return w, h, 1, planes[0].astype(np.uint8).tobytes()
    y, cb, cr = planes
    r_ = y + 1.402 * (cr - 128.0)
    g_ = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b_ = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r_, g_, b_], axis=-1)
    return w, h, 3, np.clip(np.round(rgb), 0, 255).astype(np.uint8).tobytes()


# --------------------------------------------------------------- encode

#: Annex K example quantization tables (T.81 K.1/K.2), row-major.
_Q_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
])
_Q_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
])

#: fixed-structure canonical Huffman tables for the encoder: every DC
#: category (0..11) is a 4-bit code, every AC symbol an 8-bit code.
#: Valid by construction (12 <= 2^4 with no all-ones code; 162 <= 2^8
#: with top code 161 != 255) — simplicity over optimality.
_DC_SYMS = list(range(12))
_AC_SYMS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_DC_BITS = [0, 0, 0, 12] + [0] * 12
_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 162] + [0] * 8


def _canonical_codes(bits: list[int], syms: list[int]) -> dict[int, tuple[int, int]]:
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[syms[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_CODES = _canonical_codes(_DC_BITS, _DC_SYMS)
_AC_CODES = _canonical_codes(_AC_BITS, sorted(_AC_SYMS))

#: progressive AC table: the baseline 162 symbols PLUS the EOBn
#: symbols (r<<4 for r=1..14) progressive scans use to code EOB runs
#: of up to 2^15-1 blocks (T.81 G.1.2.2) — 176 symbols, all at 8 bits,
#: canonical-valid (top code 175 != 255).
_AC_SYMS_PROG = sorted(
    {r << 4 for r in range(15)}
    | {0xF0}
    | {(r << 4) | s for r in range(16) for s in range(1, 11)}
)
_AC_BITS_PROG = [0, 0, 0, 0, 0, 0, 0, len(_AC_SYMS_PROG)] + [0] * 8
_AC_CODES_PROG = _canonical_codes(_AC_BITS_PROG, _AC_SYMS_PROG)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self.acc &= (1 << self.n) - 1

    def pad_to_byte(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits (T.81 F.1.2.3)

    def marker(self, m: int) -> None:
        """Emit a marker into the entropy stream (byte-aligned, never
        stuffed) — used for RSTn."""
        self.pad_to_byte()
        self.out += bytes([0xFF, m])

    def flush(self) -> bytes:
        self.pad_to_byte()
        return bytes(self.out)


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_block(wtr: _BitWriter, blk_zz: np.ndarray, pred: int) -> int:
    dc = int(blk_zz[0])
    diff = dc - pred
    t = _category(diff)
    ln, code = _DC_CODES[t]
    wtr.write(code, ln)
    if t:
        wtr.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if blk_zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(blk_zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = _AC_CODES[0xF0]
            wtr.write(code, ln)
            run -= 16
        s = _category(v)
        ln, code = _AC_CODES[(run << 4) | s]
        wtr.write(code, ln)
        wtr.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        ln, code = _AC_CODES[0x00]
        wtr.write(code, ln)
    return dc


def encode_jpeg(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """Minimal valid JPEG writer (fixed-structure Huffman tables,
    Annex K quant tables scaled by ``quality``; ``subsampling`` is
    ``"444"`` or ``"420"`` for 3-channel input; ``restart_interval``
    emits DRI + RSTn markers every N MCUs, baseline only) — exists so
    tests can round-trip the decoder with stdlib+numpy only, including
    its chroma-upsampling, restart, and progressive paths; not a
    production compressor.

    ``progressive=True`` emits SOF2 with a libjpeg-style scan script —
    interleaved DC first at Al=1, DC refinement, then per component the
    AC bands 1-5 and 6-63 each as an Al=1 first scan plus its Al=0
    refinement — so a round-trip exercises spectral selection,
    successive approximation (DC and AC), EOB-run accumulation (the
    progressive AC table carries the EOBn symbols), and the refinement
    correction-bit buffering. The quantized coefficients are IDENTICAL
    to the baseline encode of the same pixels (same quant step, same
    clamping), so progressive and baseline decodes agree bit-for-bit
    once all scans are applied — pytest-pinned."""
    if channels not in (1, 3):
        raise ValueError(f"channels must be 1 or 3, got {channels}")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer size does not match dims")
    if not 1 <= quality <= 100:
        raise ValueError(f"quality must be in [1, 100], got {quality}")
    if subsampling not in ("444", "420"):
        raise ValueError(f"subsampling must be '444' or '420', got {subsampling!r}")
    if restart_interval < 0 or restart_interval > 0xFFFF:
        raise ValueError(f"restart_interval out of range: {restart_interval}")
    if progressive and restart_interval:
        raise ValueError(
            "progressive encode does not support restart_interval "
            "(decoder handles progressive restarts; the test encoder "
            "keeps its scan emitters restart-free)"
        )
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q_lum = np.clip((_Q_LUM * scale + 50) // 100, 1, 255).astype(np.int32)
    q_chrom = np.clip((_Q_CHROM * scale + 50) // 100, 1, 255).astype(np.int32)

    img = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, channels).astype(np.float64)
    sub = subsampling if channels == 3 else "444"
    if channels == 3:
        r_, g_, b_ = img[..., 0], img[..., 1], img[..., 2]
        y = 0.299 * r_ + 0.587 * g_ + 0.114 * b_
        cb = 128.0 - 0.168736 * r_ - 0.331264 * g_ + 0.5 * b_
        cr = 128.0 + 0.5 * r_ - 0.418688 * g_ - 0.081312 * b_
        if sub == "420":

            def down2(p: np.ndarray) -> np.ndarray:
                ph = np.pad(p, ((0, p.shape[0] % 2), (0, p.shape[1] % 2)), mode="edge")
                return ph.reshape(ph.shape[0] // 2, 2, ph.shape[1] // 2, 2).mean(axis=(1, 3))

            comps = [
                {"plane": y, "q": q_lum, "tq": 0, "h": 2, "v": 2},
                {"plane": down2(cb), "q": q_chrom, "tq": 1, "h": 1, "v": 1},
                {"plane": down2(cr), "q": q_chrom, "tq": 1, "h": 1, "v": 1},
            ]
        else:
            comps = [
                {"plane": y, "q": q_lum, "tq": 0, "h": 1, "v": 1},
                {"plane": cb, "q": q_chrom, "tq": 1, "h": 1, "v": 1},
                {"plane": cr, "q": q_chrom, "tq": 1, "h": 1, "v": 1},
            ]
    else:
        comps = [{"plane": img[..., 0], "q": q_lum, "tq": 0, "h": 1, "v": 1}]

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))

    for c in comps:
        bw_c, bh_c = mcus_x * c["h"], mcus_y * c["v"]
        p = c["plane"]
        padded = np.pad(
            p,
            ((0, bh_c * 8 - p.shape[0]), (0, bw_c * 8 - p.shape[1])),
            mode="edge",
        ) - 128.0
        grid = padded.reshape(bh_c, 8, bw_c, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        coef = np.einsum("ux,nxy,vy->nuv", _DCT_A, grid, _DCT_A)
        zz_q = c["q"].reshape(8, 8)[_ZZ_ROWS, _ZZ_COLS].astype(np.float64)
        # clamp to the 10-bit magnitude the fixed AC table (and baseline
        # JPEG's size<=10 convention) encodes: at quality >= ~97 quant
        # values clamp to 1 and an extreme block can quantize to |1024|,
        # which would need a size-11 symbol — bounded error instead
        c["zz"] = np.clip(
            np.round(coef[:, _ZZ_ROWS, _ZZ_COLS] / zz_q), -1023, 1023
        ).astype(np.int64)
        c["bw"] = bw_c
        # true (unpadded) block grid — non-interleaved progressive
        # scans iterate these blocks only (T.81 A.2.2)
        c["tb_w"] = -(-p.shape[1] // 8)
        c["tb_h"] = -(-p.shape[0] // 8)

    # ---- headers ------------------------------------------------------
    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    zz_q_lum = q_lum.reshape(8, 8)[_ZZ_ROWS, _ZZ_COLS].astype(np.uint8)
    out += seg(0xDB, b"\x00" + zz_q_lum.tobytes())
    if channels == 3:
        zz_q_chrom = q_chrom.reshape(8, 8)[_ZZ_ROWS, _ZZ_COLS].astype(np.uint8)
        out += seg(0xDB, b"\x01" + zz_q_chrom.tobytes())
    sof = struct.pack(">BHHB", 8, height, width, channels)
    for i, c in enumerate(comps):
        sof += bytes([i + 1, (c["h"] << 4) | c["v"], c["tq"]])
    out += seg(0xC2 if progressive else 0xC0, sof)
    ac_bits, ac_syms = (
        (_AC_BITS_PROG, _AC_SYMS_PROG) if progressive else (_AC_BITS, sorted(_AC_SYMS))
    )
    out += seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_SYMS))
    out += seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_syms))
    if channels == 3:
        out += seg(0xC4, bytes([0x01]) + bytes(_DC_BITS) + bytes(_DC_SYMS))
        out += seg(0xC4, bytes([0x11]) + bytes(ac_bits) + bytes(ac_syms))
    if progressive:
        out += _encode_progressive_scans(comps, mcus_x, mcus_y, seg)
        out += b"\xff\xd9"
        return bytes(out)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([channels])
    for i in range(channels):
        sos += bytes([i + 1, 0x00 if i == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)

    # ---- entropy-coded data -------------------------------------------
    wtr = _BitWriter()
    preds = [0] * len(comps)
    rst = 0
    for m in range(mcus_x * mcus_y):
        if restart_interval and m and m % restart_interval == 0:
            wtr.marker(0xD0 + rst)
            rst = (rst + 1) & 7
            preds = [0] * len(comps)
        my, mx = divmod(m, mcus_x)
        for ci, c in enumerate(comps):
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    n = (my * c["v"] + by) * c["bw"] + (mx * c["h"] + bx)
                    preds[ci] = _encode_block(wtr, c["zz"][n], preds[ci])
    out += wtr.flush()
    out += b"\xff\xd9"
    return bytes(out)


# ------------------------------------------------- progressive encode


def _encode_progressive_scans(comps, mcus_x, mcus_y, seg) -> bytes:
    """Emit the SOS segments + entropy data for the fixed progressive
    scan script (see :func:`encode_jpeg`). DC scans interleave every
    component over the MCU grid; AC scans are single-component over the
    true block grid, per band, first pass at Al=1 then the Al=0
    refinement — the script touches every decoder code path."""
    ncomp = len(comps)
    allc = list(range(ncomp))
    scans = [(allc, 0, 0, 0, 1), (allc, 0, 0, 1, 0)]
    for ci in range(ncomp):
        scans += [
            ([ci], 1, 5, 0, 1),
            ([ci], 6, 63, 0, 1),
            ([ci], 1, 5, 1, 0),
            ([ci], 6, 63, 1, 0),
        ]
    out = bytearray()
    for cis, ss, se, ah, al in scans:
        sos = bytes([len(cis)])
        for ci in cis:
            tbl = 0 if ci == 0 else 1
            # DC scans use Td (high nibble), AC scans Ta (low nibble);
            # the unused nibble is 0 per T.81 B.2.3
            sos += bytes([ci + 1, (tbl << 4) if ss == 0 else tbl])
        sos += bytes([ss, se, (ah << 4) | al])
        out += seg(0xDA, sos)
        if ss == 0:
            out += _emit_dc_scan(comps, cis, ah, al, mcus_x, mcus_y)
        elif ah == 0:
            out += _emit_ac_first_scan(comps[cis[0]], ss, se, al)
        else:
            out += _emit_ac_refine_scan(comps[cis[0]], ss, se, al)
    return bytes(out)


def _emit_dc_scan(comps, cis, ah, al, mcus_x, mcus_y) -> bytes:
    wtr = _BitWriter()
    preds = {ci: 0 for ci in cis}
    for m in range(mcus_x * mcus_y):
        my, mx = divmod(m, mcus_x)
        for ci in cis:
            c = comps[ci]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    n = (my * c["v"] + by) * c["bw"] + (mx * c["h"] + bx)
                    dc = int(c["zz"][n][0])
                    if ah == 0:
                        # point transform: arithmetic shift (T.81 G.1.2.1)
                        v = dc >> al
                        diff = v - preds[ci]
                        preds[ci] = v
                        t = _category(diff)
                        ln, code = _DC_CODES[t]
                        wtr.write(code, ln)
                        if t:
                            wtr.write(
                                diff if diff >= 0 else diff + (1 << t) - 1, t
                            )
                    else:
                        wtr.write((dc >> al) & 1, 1)
    return wtr.flush()


def _emit_eobrun(wtr, eobrun: int, pending_bits: list[int]) -> None:
    """EOBn symbol (T.81 G.1.2.2): n = floor(log2(EOBRUN)), followed by
    the n low bits of EOBRUN, then any correction bits the run buffered
    (refinement scans only)."""
    if eobrun:
        nb = eobrun.bit_length() - 1
        ln, code = _AC_CODES_PROG[nb << 4]
        wtr.write(code, ln)
        if nb:
            wtr.write(eobrun - (1 << nb), nb)
    for b in pending_bits:
        wtr.write(b, 1)


def _emit_ac_first_scan(c, ss, se, al) -> bytes:
    wtr = _BitWriter()
    eobrun = 0
    for m in range(c["tb_w"] * c["tb_h"]):
        row, col = divmod(m, c["tb_w"])
        blk = c["zz"][row * c["bw"] + col]
        # point transform on AC: sign-magnitude shift (T.81 G.1.2.2)
        vals = [
            (int(v) >> al) if v >= 0 else -((-int(v)) >> al)
            for v in blk[ss : se + 1]
        ]
        last = -1
        for i in range(len(vals) - 1, -1, -1):
            if vals[i]:
                last = i
                break
        if last < 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                _emit_eobrun(wtr, eobrun, [])
                eobrun = 0
            continue
        _emit_eobrun(wtr, eobrun, [])
        eobrun = 0
        run = 0
        for i in range(last + 1):
            v = vals[i]
            if v == 0:
                run += 1
                continue
            while run > 15:
                ln, code = _AC_CODES_PROG[0xF0]
                wtr.write(code, ln)
                run -= 16
            s = _category(v)
            ln, code = _AC_CODES_PROG[(run << 4) | s]
            wtr.write(code, ln)
            wtr.write(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if last < se - ss:
            eobrun += 1
            if eobrun == 0x7FFF:
                _emit_eobrun(wtr, eobrun, [])
                eobrun = 0
    _emit_eobrun(wtr, eobrun, [])
    return wtr.flush()


def _emit_ac_refine_scan(c, ss, se, al) -> bytes:
    """AC successive-approximation refinement (T.81 G.1.2.3, the
    libjpeg encode_mcu_AC_refine control flow): newly-significant
    coefficients emit (run<<4)|1 + a sign bit, previously-significant
    ones ride as buffered correction bits after the next emitted
    symbol, and all-EOB tails fold into an EOB run that carries its
    blocks' correction bits."""
    wtr = _BitWriter()
    eobrun = 0
    pending: list[int] = []  # correction bits owed to the pending EOB run
    for m in range(c["tb_w"] * c["tb_h"]):
        row, col = divmod(m, c["tb_w"])
        blk = c["zz"][row * c["bw"] + col]
        band = [int(v) for v in blk[ss : se + 1]]
        mags = [(abs(v) >> al) for v in band]
        eob = -1  # index of the LAST newly-significant coefficient
        for i, t in enumerate(mags):
            if t == 1:
                eob = i
        run = 0
        br: list[int] = []  # correction bits since the last symbol
        for i, t in enumerate(mags):
            if t == 0:
                run += 1
                continue
            while run > 15 and i <= eob:
                _emit_eobrun(wtr, eobrun, pending)
                eobrun = 0
                pending = []
                ln, code = _AC_CODES_PROG[0xF0]
                wtr.write(code, ln)
                run -= 16
                for b in br:
                    wtr.write(b, 1)
                br = []
            if t > 1:
                br.append(t & 1)
                continue
            # t == 1: newly significant
            _emit_eobrun(wtr, eobrun, pending)
            eobrun = 0
            pending = []
            ln, code = _AC_CODES_PROG[(run << 4) | 1]
            wtr.write(code, ln)
            wtr.write(1 if band[i] >= 0 else 0, 1)
            for b in br:
                wtr.write(b, 1)
            br = []
            run = 0
        if run > 0 or br:
            eobrun += 1
            pending += br
            if eobrun == 0x7FFF or len(pending) > 900:
                _emit_eobrun(wtr, eobrun, pending)
                eobrun = 0
                pending = []
    _emit_eobrun(wtr, eobrun, pending)
    return wtr.flush()
