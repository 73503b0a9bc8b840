"""Dependency-free WAV (RIFF/PCM) codec + audio features.

Closes the audio half of the multimodal decode stub
(operators/multimodal.py DecoderUnavailable) the same way
functions/imagecodec.py closed the image half: a from-scratch decoder
for a fully public container format — RIFF "WAVE" with a PCM ``fmt ``
chunk — implemented against the published layout (RIFF chunk framing:
4-byte tag + LE uint32 size + payload, word-aligned; fmt: LE uint16
audio format / channels, uint32 sample rate / byte rate, uint16 block
align / bits per sample). Supports the formats a PCM corpus actually
contains: 8-bit unsigned and 16-bit signed little-endian, mono or
interleaved multi-channel.

Features are INTEGER-exact where the engine contract needs exactness
(sample counts, peak, sum of squares, zero crossings) so the q161
oracle can verify the decode path arithmetically, plus derived floats
(duration, rms) for consumers. Video stays a loud stub: no container
format there is stdlib-feasible, and a fake decoder would be worse
than an honest error.
"""

from __future__ import annotations

import io
import struct

import numpy as np

__all__ = [
    "AudioFormatError",
    "decode_wav",
    "encode_wav",
    "audio_features",
]


class AudioFormatError(ValueError):
    pass


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (samples int32 array of shape (n, channels), rate).

    Walks RIFF chunks tolerantly (unknown chunks skipped, word-aligned)
    and decodes PCM 8-bit unsigned (rebased to signed) or 16-bit signed
    LE. Raises AudioFormatError on non-RIFF input, non-PCM encodings,
    or a data chunk that disagrees with the block alignment."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise AudioFormatError("not a RIFF/WAVE file")
    off = 12
    fmt = None
    pcm = None
    while off + 8 <= len(data):
        tag = data[off : off + 4]
        (size,) = struct.unpack_from("<I", data, off + 4)
        payload = data[off + 8 : off + 8 + size]
        if tag == b"fmt ":
            if size < 16:
                raise AudioFormatError("fmt chunk too short")
            audio_fmt, channels, rate, _brate, balign, bits = struct.unpack_from(
                "<HHIIHH", payload, 0
            )
            if audio_fmt != 1:
                raise AudioFormatError(f"non-PCM format {audio_fmt}")
            if bits not in (8, 16):
                raise AudioFormatError(f"unsupported bit depth {bits}")
            fmt = (channels, rate, balign, bits)
        elif tag == b"data":
            pcm = payload
        off += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise AudioFormatError("missing fmt or data chunk")
    channels, rate, balign, bits = fmt
    if channels < 1:
        raise AudioFormatError("channel count must be >= 1")
    bytes_per_sample = bits // 8
    if balign != channels * bytes_per_sample:
        raise AudioFormatError("block align disagrees with channels*bits")
    frames = len(pcm) // balign
    pcm = pcm[: frames * balign]
    if bits == 16:
        arr = np.frombuffer(pcm, dtype="<i2").astype(np.int32)
    else:
        arr = np.frombuffer(pcm, dtype=np.uint8).astype(np.int32) - 128
    return arr.reshape(frames, channels), rate


def encode_wav(samples: np.ndarray, rate: int, bits: int = 16) -> bytes:
    """(n, channels) int array -> canonical WAV bytes (PCM, LE)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    frames, channels = samples.shape
    if bits == 16:
        pcm = samples.astype("<i2").tobytes()
    elif bits == 8:
        pcm = (samples.astype(np.int32) + 128).clip(0, 255).astype(np.uint8).tobytes()
    else:
        raise AudioFormatError(f"unsupported bit depth {bits}")
    balign = channels * bits // 8
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * balign, balign, bits)
    out = io.BytesIO()
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
        + (b"\x00" if len(pcm) & 1 else b"")
    )
    out.write(b"RIFF" + struct.pack("<I", len(body)) + body)
    return out.getvalue()


def audio_features(samples: np.ndarray, rate: int) -> dict:
    """Integer-exact audio statistics over channel 0 (the oracle
    contract) plus derived floats: frame count, duration, peak |s|,
    sum of squares (int), RMS, and zero crossings counted as strict
    sign changes (negative <-> non-negative transitions)."""
    ch0 = samples[:, 0].astype(np.int64)
    n = int(ch0.shape[0])
    sum_sq = int((ch0 * ch0).sum())
    neg = ch0 < 0
    zc = int((neg[1:] != neg[:-1]).sum()) if n > 1 else 0
    return {
        "n_frames": n,
        "duration_ms": int(n * 1000 // rate) if rate else 0,
        "peak": int(np.abs(ch0).max()) if n else 0,
        "sum_sq": sum_sq,
        "rms": (sum_sq / n) ** 0.5 if n else 0.0,
        "zero_crossings": zc,
    }
