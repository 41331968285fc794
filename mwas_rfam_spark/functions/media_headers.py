"""Header-only MP3 / MP4 metadata from stdlib primitives.

The container ships no audio/video wheels (no soundfile/PyAV), but both
formats expose duration / bitrate / sample-rate / dimensions in plain
framed headers that need NO entropy decoding:

- MP3 (MPEG-1/2/2.5 audio, layers I-III): metadata lives in every
  frame's fixed 4-byte header (ISO 11172-3 / 13818-3). Walking the
  frame chain — each header gives the exact byte length of its frame,
  so the walk skips payloads untouched — yields the exact sample count
  and the true average bitrate even for VBR files (where the first
  frame's bitrate field, which naive parsers report, is wrong).
- MP4 (ISO BMFF, 14496-12): metadata lives in the `moov` box tree —
  `mvhd` (movie timescale + duration), per-`trak` `tkhd` (16.16
  fixed-point width/height) / `hdlr` (vide vs soun) / `mdhd` (media
  timescale, which for audio tracks is the sample rate).

These are the "degrade to real metadata" backends for
`operators.multimodal.extract_audio_features` (MP3 branch) and
`video_metadata` (MP4 branch) — full sample/frame DECODE of these
formats still requires the missing wheels and still raises a named
NotImplementedError (reference for the media family:
mwas_rfam main repo has no media layer at all; this extends the
engine's training-data surface).
"""

from __future__ import annotations

import struct

# bitrate tables in kbps, indexed [version_group][layer][bitrate_index]
# version_group: 0 = MPEG-1, 1 = MPEG-2/2.5
_BITRATES = {
    (0, 1): [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    (0, 2): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    (0, 3): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    (1, 1): [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    (1, 2): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    (1, 3): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
# sample rates in Hz, indexed [version_bits][rate_index]
_RATES = {
    3: [44100, 48000, 32000],  # MPEG-1
    2: [22050, 24000, 16000],  # MPEG-2
    0: [11025, 12000, 8000],   # MPEG-2.5
}


def _id3v2_size(data: bytes) -> int:
    """Bytes occupied by a leading ID3v2 tag (0 when absent). The size
    field is syncsafe (7 bits per byte); the footer flag adds 10."""
    if data[:3] != b"ID3" or len(data) < 10:
        return 0
    sz = (
        (data[6] & 0x7F) << 21
        | (data[7] & 0x7F) << 14
        | (data[8] & 0x7F) << 7
        | (data[9] & 0x7F)
    )
    return 10 + sz + (10 if data[5] & 0x10 else 0)


def _parse_frame_header(data: bytes, pos: int):
    """(frame_bytes, samples, rate_hz, bitrate_kbps, channels) for the
    MPEG audio frame at ``pos``, or None if the 4 bytes there are not a
    valid frame header."""
    if pos + 4 > len(data):
        return None
    b1, b2, b3, _b4 = data[pos : pos + 4]
    if b1 != 0xFF or (b2 & 0xE0) != 0xE0:
        return None
    version_bits = (b2 >> 3) & 0x03  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
    layer_bits = (b2 >> 1) & 0x03  # 3=I, 2=II, 1=III
    if version_bits == 1 or layer_bits == 0:
        return None  # reserved
    layer = 4 - layer_bits  # 1..3
    vgroup = 0 if version_bits == 3 else 1
    bidx = (b3 >> 4) & 0x0F
    ridx = (b3 >> 2) & 0x03
    if bidx in (0, 15) or ridx == 3:
        return None  # free-format / reserved
    bitrate = _BITRATES[(vgroup, layer)][bidx]  # kbps
    rate = _RATES[version_bits][ridx]
    padding = (b3 >> 1) & 0x01
    channels = 1 if ((_b4 >> 6) & 0x03) == 3 else 2
    if layer == 1:
        samples = 384
        frame_bytes = (12 * bitrate * 1000 // rate + padding) * 4
    else:
        samples = 1152 if (layer == 2 or vgroup == 0) else 576
        frame_bytes = samples // 8 * bitrate * 1000 // rate + padding
    if frame_bytes <= 4:
        return None
    return frame_bytes, samples, rate, bitrate, channels


def is_mp3(data: bytes) -> bool:
    """True when the payload starts with an ID3v2 tag or a valid MPEG
    audio frame header."""
    if data[:3] == b"ID3":
        return True
    return _parse_frame_header(data, 0) is not None


def mp3_metadata(data: bytes) -> dict:
    """Header-only MP3 metadata by walking the frame chain:
    {sample_rate, n_samples, duration_s, bitrate_kbps, channels,
    n_frames}. Exact for CBR and VBR alike (every frame's own header is
    read; payloads are skipped by length). Raises ValueError when no
    valid frame chain exists."""
    pos = _id3v2_size(data)
    # tolerate junk/silence before the first sync, bounded
    first = None
    for p in range(pos, min(len(data), pos + 65536)):
        if data[p] == 0xFF and _parse_frame_header(data, p) is not None:
            first = p
            break
    if first is None:
        raise ValueError("no MPEG audio frame sync found (not an MP3?)")
    pos = first
    n_frames = 0
    n_samples = 0
    audio_bytes = 0
    rate = None
    channels = None
    while pos + 4 <= len(data):
        hdr = _parse_frame_header(data, pos)
        if hdr is None:
            # trailing tags (ID3v1 'TAG', APE) or truncation: stop at the
            # first non-frame — everything before it was a valid chain
            break
        frame_bytes, samples, r, _kbps, ch = hdr
        if pos + frame_bytes > len(data):
            break  # truncated final frame: exclude it
        if rate is None:
            rate, channels = r, ch
        elif r != rate:
            break  # rate change mid-stream = corrupt chain; keep the prefix
        n_frames += 1
        n_samples += samples
        audio_bytes += frame_bytes
        pos += frame_bytes
    if n_frames == 0:
        raise ValueError("no complete MPEG audio frame (truncated MP3?)")
    duration = n_samples / rate
    return {
        "sample_rate": rate,
        "n_samples": n_samples,
        "duration_s": duration,
        "bitrate_kbps": audio_bytes * 8 / duration / 1000.0,
        "channels": channels,
        "n_frames": n_frames,
    }


# ---------------------------------------------------------------- MP4


def is_mp4(data: bytes) -> bool:
    """True for an ISO BMFF container (`ftyp` as the first box)."""
    return len(data) >= 12 and data[4:8] == b"ftyp"


def _boxes(data: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for the box sequence in
    data[start:end]. Handles 64-bit largesize and size==0 (to end)."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        btype = data[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated MP4 box (largesize)")
            (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError(f"corrupt MP4 box {btype!r}: size {size}")
        yield btype, pos + hdr, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, btype: bytes):
    for t, s, e in _boxes(data, start, end):
        if t == btype:
            return s, e
    return None


def mp4_metadata(data: bytes) -> dict:
    """Header-only MP4 metadata from the moov tree: {duration_s, width,
    height, n_video_tracks, n_audio_tracks, audio_sample_rate,
    bitrate_kbps}. width/height come from the first video track's tkhd
    (16.16 fixed point); audio_sample_rate from the first audio track's
    mdhd timescale (the BMFF convention). Raises ValueError when moov
    or mvhd is missing."""
    if not is_mp4(data):
        raise ValueError("not an ISO BMFF container (no ftyp)")
    moov = _find(data, 0, len(data), b"moov")
    if moov is None:
        raise ValueError("MP4 missing moov box (streaming-only fragment?)")
    ms, me = moov
    mvhd = _find(data, ms, me, b"mvhd")
    if mvhd is None:
        raise ValueError("MP4 moov missing mvhd")
    vs, ve = mvhd
    if ve - vs < 20:
        raise ValueError(f"truncated MP4 mvhd box ({ve - vs} bytes)")
    version = data[vs]
    if version == 1 and ve - vs < 32:
        raise ValueError(f"truncated MP4 mvhd box ({ve - vs} bytes)")
    if version == 1:
        timescale, duration = struct.unpack(">IQ", data[vs + 20 : vs + 32])
    else:
        timescale, duration = struct.unpack(">II", data[vs + 12 : vs + 20])
    if timescale == 0:
        raise ValueError("MP4 mvhd timescale is 0")
    duration_s = duration / timescale

    width = height = None
    audio_rate = None
    n_video = n_audio = 0
    for t, s, e in _boxes(data, ms, me):
        if t != b"trak":
            continue
        mdia = _find(data, s, e, b"mdia")
        handler = None
        if mdia is not None:
            hdlr = _find(data, mdia[0], mdia[1], b"hdlr")
            if hdlr is not None:
                handler = data[hdlr[0] + 8 : hdlr[0] + 12]
        if handler == b"vide":
            n_video += 1
            if width is None:
                tkhd = _find(data, s, e, b"tkhd")
                if tkhd is not None:
                    ts, te = tkhd
                    if te - ts < 1:
                        raise ValueError("truncated MP4 tkhd box (empty)")
                    # width/height sit after FullBox + times + track_ID +
                    # reserved + duration + reserved[2] + layer/alt/vol/
                    # reserved + matrix: payload offset 76 (v0) / 88 (v1,
                    # 64-bit times+duration)
                    rel = 88 if data[ts] == 1 else 76
                    if te - ts < rel + 8:
                        raise ValueError(
                            f"truncated MP4 tkhd box ({te - ts} bytes)"
                        )
                    off = ts + rel
                    w_fp, h_fp = struct.unpack(">II", data[off : off + 8])
                    width, height = w_fp >> 16, h_fp >> 16
        elif handler == b"soun":
            n_audio += 1
            if audio_rate is None and mdia is not None:
                mdhd = _find(data, mdia[0], mdia[1], b"mdhd")
                if mdhd is not None:
                    ds, de = mdhd
                    if de - ds < 1:
                        raise ValueError("truncated MP4 mdhd box (empty)")
                    rel = 20 if data[ds] == 1 else 12
                    if de - ds < rel + 4:
                        raise ValueError(
                            f"truncated MP4 mdhd box ({de - ds} bytes)"
                        )
                    (audio_rate,) = struct.unpack(">I", data[ds + rel : ds + rel + 4])
    return {
        "duration_s": duration_s,
        "width": width,
        "height": height,
        "n_video_tracks": n_video,
        "n_audio_tracks": n_audio,
        "audio_sample_rate": audio_rate,
        "bitrate_kbps": (len(data) * 8 / duration_s / 1000.0) if duration_s > 0 else None,
    }
