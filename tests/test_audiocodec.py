"""RIFF/PCM WAV codec (functions/audiocodec.py): golden container
bytes, round-trips across depths/channels, chunk-walk tolerance, and
the integer feature contract."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from sstable_migrator_spark.functions.audiocodec import (
    AudioFormatError,
    audio_features,
    decode_wav,
    encode_wav,
)


def test_golden_header_bytes():
    """Canonical 2-frame mono 16-bit file checked byte by byte against
    the public RIFF/WAVE layout."""
    wav = encode_wav(np.array([1000, -1000]), rate=8000)
    assert wav[:4] == b"RIFF"
    (riff_size,) = struct.unpack_from("<I", wav, 4)
    assert riff_size == len(wav) - 8
    assert wav[8:12] == b"WAVE"
    assert wav[12:16] == b"fmt "
    (fmt_size,) = struct.unpack_from("<I", wav, 16)
    assert fmt_size == 16
    audio_fmt, ch, rate, brate, balign, bits = struct.unpack_from("<HHIIHH", wav, 20)
    assert (audio_fmt, ch, rate, bits) == (1, 1, 8000, 16)
    assert brate == rate * balign and balign == 2
    assert wav[36:40] == b"data"
    (dsize,) = struct.unpack_from("<I", wav, 40)
    assert dsize == 4
    assert wav[44:48] == struct.pack("<hh", 1000, -1000)


@pytest.mark.parametrize("bits", [8, 16])
@pytest.mark.parametrize("channels", [1, 2])
def test_roundtrip(bits, channels):
    rng = np.random.RandomState(7)
    lim = 127 if bits == 8 else 32767
    samples = rng.randint(-lim, lim + 1, size=(100, channels))
    back, rate = decode_wav(encode_wav(samples, rate=44100, bits=bits))
    assert rate == 44100
    assert back.shape == (100, channels)
    assert (back == samples).all()


def test_unknown_chunks_skipped():
    """Real-world WAVs carry LIST/INFO chunks; the walker must skip
    them (word-aligned) and still find fmt+data."""
    wav = encode_wav(np.array([5, -5, 7]), rate=8000)
    # splice an unknown odd-sized chunk between WAVE and fmt
    junk = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # pad byte
    spliced = wav[:12] + junk + wav[12:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    back, _ = decode_wav(spliced)
    assert back[:, 0].tolist() == [5, -5, 7]


def test_malformed_rejected():
    with pytest.raises(AudioFormatError, match="RIFF"):
        decode_wav(b"NOPE" + b"\x00" * 40)
    # non-PCM format code
    wav = bytearray(encode_wav(np.array([1]), rate=8000))
    struct.pack_into("<H", wav, 20, 3)  # IEEE float format
    with pytest.raises(AudioFormatError, match="non-PCM"):
        decode_wav(bytes(wav))


def test_features_integer_contract():
    s = np.array([3, -4, 0, 5, -1])
    f = audio_features(s[:, None], rate=1000)
    assert f["n_frames"] == 5
    assert f["duration_ms"] == 5
    assert f["peak"] == 5
    assert f["sum_sq"] == 9 + 16 + 0 + 25 + 1
    # sign changes (neg vs non-neg): 3->-4, -4->0, 5->-1
    assert f["zero_crossings"] == 3
    assert f["rms"] == pytest.approx((51 / 5) ** 0.5)


def test_multimodal_real_decode_audio(spark):
    """decode_features(real_decode=True) now handles audio payloads for
    real; video still raises the loud stub."""
    import pandas as pd

    from sstable_migrator_spark.operators.multimodal import (
        FEATURE_SCHEMA,
        decode_features,
    )

    wav = encode_wav(np.array([0, 10000, -10000, 10000]), rate=8000)
    media = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": [1],
                "kind": ["audio"],
                "payload": [bytearray(wav)],
                "meta": [{"width": 0, "height": 0, "duration_ms": 0,
                          "codec": "pcm"}],
            }
        )
    )
    row = decode_features(media, dim=8, real_decode=True).collect()[0]
    assert row["kind"] == "audio" and len(row["feature"]) == 8
    assert row["feature"][0] == pytest.approx(10000 / 32768.0)  # peak

    bad = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": [2],
                "kind": ["video"],
                "payload": [bytearray(b"\x00\x01")],
                "meta": [{"width": 0, "height": 0, "duration_ms": 0,
                          "codec": "h264"}],
            }
        )
    )
    with pytest.raises(Exception, match="stubbed|DecoderUnavailable"):
        decode_features(bad, dim=8, real_decode=True).collect()
