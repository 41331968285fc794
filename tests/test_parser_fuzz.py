"""Sampled byte-mutation fuzz over EVERY stateless binary parser with a
ValueError corruption contract (r13: the JPEG sweep in
test_multimodal.py::test_jpeg_noninterleaved_stream_corruption_contract
found real escapes; this extends the same harness family-wide — GIF,
PNG, MP3, MP4, AVI, MKV, WAV). Hostile-field parsing is these modules'
whole job; the contract under corruption is "ValueError or a correct
decode, never an uncontrolled exception type".

Each case takes a known-good fixture, mutates sampled single bytes
(several replacement values each) and truncates at sampled offsets, and
asserts nothing but the allowed exception set escapes. Successful
decodes of mutated bytes are fine (don't-care bytes exist); what must
never happen is an IndexError / struct.error / zlib.error / KeyError /
OverflowError leaking through a Spark task as an opaque crash.

Pure-Python: no SparkSession.
"""

from __future__ import annotations

import numpy as np
import pytest

# sibling test modules are importable under pytest's rootdir insertion;
# the fixture builders stay single-sourced in test_multimodal
from test_multimodal import _avi_fixture, _mkv_fixture, _mp3_frame, _mp4_fixture

N_MUT_POS = 80          # sampled mutation positions per fixture
MUT_VALUES = (0x00, 0xFF, 0x80)  # plus a single-bit flip of the original
N_TRUNC = 40            # sampled truncation lengths per fixture


def _fuzz(data: bytes, fn, allowed: tuple[type, ...], seed: int):
    """Mutate + truncate `data`, calling fn on each variant; re-raise
    anything outside `allowed` with the offending offset named."""
    rng = np.random.default_rng(seed)
    n = len(data)
    positions = rng.choice(np.arange(n), size=min(N_MUT_POS, n), replace=False)
    for pos in positions:
        pos = int(pos)
        for val in (*MUT_VALUES, data[pos] ^ 0x04):
            if val == data[pos]:
                continue
            m = bytearray(data)
            m[pos] = val
            try:
                fn(bytes(m))
            except allowed:
                pass
            except Exception as e:  # noqa: BLE001 - the assertion itself
                raise AssertionError(
                    f"{fn.__name__}: byte {pos} -> {val:#04x} escaped the "
                    f"contract with {type(e).__name__}: {e}"
                ) from e
    for cut in rng.choice(np.arange(n), size=min(N_TRUNC, n), replace=False):
        try:
            fn(data[: int(cut)])
        except allowed:
            pass
        except Exception as e:  # noqa: BLE001
            raise AssertionError(
                f"{fn.__name__}: truncation at {cut} escaped the contract "
                f"with {type(e).__name__}: {e}"
            ) from e


def _gif_fixture() -> bytes:
    from mwas_rfam_spark.functions.gif_codec import encode_gif

    # 2 frames, 6x4, distinct palettes — exercises LCT, GCE, disposal
    f0 = bytes([(x + y) % 4 for y in range(4) for x in range(6)])
    f1 = bytes([(x * y) % 4 for y in range(4) for x in range(6)])
    return encode_gif(6, 4, [f0, f1],
                      palette=[(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)])


def _png_fixture() -> bytes:
    from mwas_rfam_spark.functions.png_codec import encode_png

    px = bytes((x * 7 + y * 13 + c) % 256
               for y in range(5) for x in range(4) for c in range(3))
    return encode_png(4, 5, 3, px)


def _wav_fixture() -> bytes:
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(bytes(320))
    return buf.getvalue()


def test_fuzz_gif_decode_and_metadata():
    from mwas_rfam_spark.functions.gif_codec import (
        decode_gif,
        gif_metadata,
        iter_frame_rgb,
    )

    data = _gif_fixture()
    decode_gif(data)  # the uncorrupted fixture decodes
    _fuzz(data, decode_gif, (ValueError,), seed=7)
    _fuzz(data, gif_metadata, (ValueError,), seed=11)
    _fuzz(data, lambda b: list(iter_frame_rgb(b)), (ValueError,), seed=13)


def test_fuzz_png_decode():
    from mwas_rfam_spark.functions.png_codec import decode_png

    data = _png_fixture()
    decode_png(data)
    _fuzz(data, decode_png, (ValueError,), seed=17)


def test_fuzz_mp3_metadata():
    from mwas_rfam_spark.functions.media_headers import mp3_metadata

    data = _mp3_frame() * 3
    mp3_metadata(data)
    _fuzz(data, mp3_metadata, (ValueError,), seed=19)


def test_fuzz_mp4_metadata():
    from mwas_rfam_spark.functions.media_headers import mp4_metadata

    for v1 in (False, True):
        data = _mp4_fixture(v1=v1)
        mp4_metadata(data)
        _fuzz(data, mp4_metadata, (ValueError,), seed=23 + v1)


def test_fuzz_avi_metadata_and_frames():
    from mwas_rfam_spark.functions.media_headers import (
        avi_metadata,
        avi_video_frames_raw,
        avi_video_stream_format,
    )

    data = _avi_fixture()
    avi_metadata(data)
    _fuzz(data, avi_metadata, (ValueError,), seed=29)
    _fuzz(data, avi_video_frames_raw, (ValueError,), seed=31)
    _fuzz(data, avi_video_stream_format, (ValueError,), seed=37)


def test_fuzz_mkv_metadata():
    from mwas_rfam_spark.functions.media_headers import mkv_metadata

    data = _mkv_fixture()
    mkv_metadata(data)
    _fuzz(data, mkv_metadata, (ValueError,), seed=41)


def test_fuzz_wav_open():
    """WAV is two-tier by contract: a payload whose RIFF/WAVE magic is
    destroyed is 'not WAV' (NotImplementedError — route to another
    decoder), anything past the magic that the stdlib reader chokes on
    is a corrupt WAV (ValueError)."""
    from mwas_rfam_spark.operators.multimodal import _open_wav_checked

    def fn(b: bytes):
        w = _open_wav_checked(b)
        try:
            w.getnframes()
            w.readframes(64)
        finally:
            w.close()

    data = _wav_fixture()
    fn(data)
    _fuzz(data, fn, (ValueError, NotImplementedError), seed=43)
