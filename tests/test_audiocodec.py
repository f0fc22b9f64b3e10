"""Unit tests for the stdlib WAV codec (functions/audiocodec.py): mono and
stereo round-trips, unknown-chunk walking, RIFF word padding, and rejection
of malformed / unsupported payloads.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from xml_to_parquet_spark.functions.audiocodec import decode_wav, encode_wav


def _sig(n, seed=3):
    return (
        np.random.default_rng(seed).integers(-32768, 32768, size=n)
    ).astype(np.int16)


@pytest.mark.parametrize("n", [1, 255, 4096])
def test_wav_mono_roundtrip(n):
    s = _sig(n)
    rate, out = decode_wav(encode_wav(s, sample_rate=22050))
    assert rate == 22050
    np.testing.assert_array_equal(out, s)


def test_wav_stereo_roundtrip():
    s = _sig(512).reshape(-1, 2)
    rate, out = decode_wav(encode_wav(s, sample_rate=8000))
    assert rate == 8000
    assert out.shape == (256, 2)
    np.testing.assert_array_equal(out, s)


def test_wav_odd_data_length_word_padded():
    # odd total data bytes (mono, odd sample count → even bytes; force odd
    # via a manual chunk) — encoder pads, decoder honors the pad
    s = _sig(7)
    data = encode_wav(s)
    rate, out = decode_wav(data)
    np.testing.assert_array_equal(out, s)


def test_wav_extra_chunks_skipped():
    """LIST/fact chunks before AND after data must be walked over."""
    s = _sig(100)
    raw = encode_wav(s)
    # splice a LIST chunk (odd length → padded) right after "WAVE"
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    fact = b"fact" + struct.pack("<I", 4) + struct.pack("<I", 100)
    body = extra + raw[12:] + fact
    rebuilt = b"RIFF" + struct.pack("<I", len(body) + 4) + b"WAVE" + body
    rate, out = decode_wav(rebuilt)
    assert rate == 16000
    np.testing.assert_array_equal(out, s)


def test_wav_rejects_garbage_and_unsupported():
    with pytest.raises(ValueError):
        decode_wav(b"not audio")
    with pytest.raises(ValueError):
        decode_wav(b"RIFF" + b"\x00" * 4 + b"AVI ")
    # 8-bit fmt chunk → unsupported
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", 2) + b"\x00\x00"
    with pytest.raises(ValueError, match="bits=8"):
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    with pytest.raises(ValueError, match="int16"):
        encode_wav(np.zeros(4, dtype=np.float32))


def test_wav_missing_data_chunk():
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    with pytest.raises(ValueError, match="missing"):
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_wav_roundtrip_property():
    """Hypothesis: any int16 payload (mono or stereo) at any sample rate
    round-trips bit-exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=50, deadline=None)
    @given(
        n=st.integers(min_value=1, max_value=2048),
        rate=st.integers(min_value=1, max_value=384000),
        stereo=st.booleans(),
        seed=st.integers(min_value=0, max_value=2**31),
    )
    def check(n, rate, stereo, seed):
        rng = np.random.default_rng(seed)
        if stereo:
            s = rng.integers(-32768, 32768, size=(n, 2)).astype(np.int16)
        else:
            s = rng.integers(-32768, 32768, size=n).astype(np.int16)
        got_rate, out = decode_wav(encode_wav(s, sample_rate=rate))
        assert got_rate == rate
        np.testing.assert_array_equal(out, s)

    check()


def test_wav_truncated_data_chunk_raises():
    """A data chunk whose declared length overruns the buffer must fail
    loudly (ADVICE r5), not silently yield fewer samples."""
    s = _sig(64)
    raw = encode_wav(s)
    with pytest.raises(ValueError, match="truncated WAV"):
        decode_wav(raw[:-10])  # cut mid-data
    # inflate the declared data length past the buffer
    idx = raw.index(b"data")
    bad = raw[: idx + 4] + struct.pack("<I", 1 << 20) + raw[idx + 8 :]
    with pytest.raises(ValueError, match="truncated WAV"):
        decode_wav(bad)


def test_wav_truncated_fmt_chunk_raises():
    body = b"WAVE" + b"fmt " + struct.pack("<I", 4) + b"\x01\x00\x01\x00"
    with pytest.raises(ValueError, match="fmt chunk"):
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_wav_partial_frame_raises():
    """PCM bytes that are not a whole number of frames (odd bytes for
    mono, odd sample count for stereo) are corruption, not data."""
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", 3) + b"\x00\x00\x00" + b"\x00"
    with pytest.raises(ValueError, match="frames"):
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    fmt2 = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    body2 = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt2)) + fmt2
    body2 += b"data" + struct.pack("<I", 6) + b"\x00" * 6
    with pytest.raises(ValueError, match="frames"):
        decode_wav(b"RIFF" + struct.pack("<I", len(body2)) + body2)
