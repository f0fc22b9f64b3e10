"""Stdlib-only WAV (RIFF PCM) codec — the audio twin of imagecodec.py.

Retires the "audio decode is a stub" caveat the same way the PNG/BMP codec
retired the image stub: the container has no soundfile/librosa, but RIFF
PCM16 is decodable with nothing beyond ``struct`` + numpy, which makes the
multimodal audio path REAL end-to-end — actual WAV bytes in a binary
column, actual chunk-walk + PCM scaling in the executor, oracle-checked
sample statistics out.

Supported surface (deliberately minimal, raises otherwise):
- encode: PCM16 little-endian, mono or interleaved stereo.
- decode: RIFF/WAVE with arbitrary extra chunks (LIST/fact/cue …) walked
  and skipped; fmt must be PCM (tag 1) 16-bit; data chunk may appear
  before or after the extras; odd-sized chunks honor RIFF word padding.

The reference repo (/root/reference/) has no multimodal surface at all,
so this is [EXT] per SURVEY.md §2.2.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Encode int16 samples — (n,) mono or (n, 2) stereo — as RIFF PCM16."""
    samples = np.asarray(samples)
    if samples.dtype != np.int16:
        raise ValueError(f"samples must be int16, got {samples.dtype}")
    if samples.ndim == 1:
        n_channels = 1
    elif samples.ndim == 2 and samples.shape[1] == 2:
        n_channels = 2
    else:
        raise ValueError(f"unsupported sample shape {samples.shape}")
    data = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    block_align = 2 * n_channels
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, sample_rate * block_align,
        block_align, 16,
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    if len(data) % 2:  # RIFF chunks are word-aligned
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """Decode RIFF PCM16 → (sample_rate, samples) with samples (n,) mono
    or (n, 2) stereo int16. Walks and skips unknown chunks."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, pcm = 12, None, None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack_from("<I", data, pos + 4)
        if pos + 8 + length > len(data):
            raise ValueError(
                f"truncated WAV: chunk {tag!r} declares {length} bytes but "
                f"only {len(data) - pos - 8} remain"
            )
        payload = data[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length % 2)  # word padding
        if tag == b"fmt ":
            if length < 16:
                raise ValueError(f"truncated WAV: fmt chunk is {length} bytes")
            audio_fmt, n_channels, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", payload
            )
            if audio_fmt != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV: fmt_tag={audio_fmt} bits={bits} "
                    "(PCM16 only)"
                )
            if n_channels not in (1, 2):
                raise ValueError(f"unsupported WAV: {n_channels} channels")
            fmt = (n_channels, rate)
        elif tag == b"data":
            pcm = payload
    if fmt is None or pcm is None:
        raise ValueError("WAV missing fmt or data chunk")
    n_channels, rate = fmt
    if len(pcm) % (2 * n_channels):
        raise ValueError(
            f"truncated WAV: data chunk of {len(pcm)} bytes is not a whole "
            f"number of {n_channels}-channel PCM16 frames"
        )
    samples = np.frombuffer(pcm, dtype="<i2")
    if n_channels == 2:
        samples = samples.reshape(-1, 2)
    return rate, samples
