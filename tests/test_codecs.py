"""Pure-stdlib PNG/WAV codecs + the real multimodal decode path
(VERDICT r2 #6: real decode on a checked-in fixture)."""

from __future__ import annotations

import io
import pathlib
import struct
import wave as stdlib_wave
import zlib

import numpy as np
import pytest

from transcript_analysis_spark.operators import multimodal
from transcript_analysis_spark.operators.codecs import (decode_png,
                                                        decode_wav,
                                                        encode_png,
                                                        encode_wav_pcm16)

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


# --- PNG ----------------------------------------------------------------

def test_png_round_trip_all_filters():
    """encode cycles filter types 0-4 per row, so a lossless round
    trip proves every unfilter path (None/Sub/Up/Average/Paeth)."""
    rng = np.random.default_rng(7)
    for shape in [(6, 5, 3), (7, 4, 4), (5, 9, 1), (1, 1, 3)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(img)), img)


def test_png_golden_hand_built():
    """Decode a PNG assembled chunk-by-chunk by hand (filter 0 only),
    independent of our encoder — guards against a symmetric bug that
    round-trips wrongly."""
    # 2x2 grayscale: rows [10, 20] and [30, 40], each with filter byte 0
    raw = bytes([0, 10, 20, 0, 30, 40])

    def chunk(ctype, payload):
        return (struct.pack(">I", len(payload)) + ctype + payload
                + struct.pack(">I", zlib.crc32(ctype + payload)))

    png = (b"\x89PNG\r\n\x1a\n"
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(raw))
           + chunk(b"IEND", b""))
    assert decode_png(png).tolist() == [[[10], [20]], [[30], [40]]]


def test_png_checked_in_fixture_matches_pixels():
    png = (FIXTURES / "sample_image.png").read_bytes()
    want = np.load(FIXTURES / "sample_image_pixels.npy")
    assert np.array_equal(decode_png(png), want)


def test_png_rejects_garbage_and_unsupported():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"not a png at all")
    # corrupt a chunk byte -> CRC must catch it
    png = (FIXTURES / "sample_image.png").read_bytes()
    bad = png[:50] + bytes([png[50] ^ 0xFF]) + png[51:]
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bad)


# --- WAV ----------------------------------------------------------------

def test_wav_round_trip_and_stdlib_cross_check():
    samples = np.load(FIXTURES / "sample_audio_samples.npy")
    data = encode_wav_pcm16(samples, 16000)
    got, rate = decode_wav(data)
    assert rate == 16000
    assert np.array_equal(got[:, 0], samples)
    # independent verification: the stdlib wave module reads our bytes
    with stdlib_wave.open(io.BytesIO(data)) as w:
        assert w.getframerate() == 16000
        assert w.getnchannels() == 1
        assert w.getsampwidth() == 2
        ref = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
    assert np.array_equal(ref, samples)


def test_wav_checked_in_fixture_decodes():
    got, rate = decode_wav((FIXTURES / "sample_audio.wav").read_bytes())
    want = np.load(FIXTURES / "sample_audio_samples.npy")
    assert rate == 16000 and np.array_equal(got[:, 0], want)


def test_wav_stereo_round_trip():
    rng = np.random.default_rng(3)
    st = rng.integers(-32768, 32767, size=(500, 2)).astype(np.int16)
    got, rate = decode_wav(encode_wav_pcm16(st, 44100))
    assert rate == 44100 and np.array_equal(got, st)


# --- real decode through the Spark multimodal operator ------------------

def test_extract_features_real_codecs_on_fixtures(spark):
    """`extract_features(use_real_codecs=True)` decodes the checked-in
    PNG and WAV inside mapInPandas and the features match a local
    numpy derivation."""
    png = (FIXTURES / "sample_image.png").read_bytes()
    wav = (FIXTURES / "sample_audio.wav").read_bytes()
    media = spark.createDataFrame(
        [(1, "image", bytearray(png), (31, 24, None, None)),
         (2, "audio", bytearray(wav), (None, None, 16000, None))],
        multimodal.MEDIA_SCHEMA)
    got = {r.media_id: r for r in
           multimodal.extract_features(media, use_real_codecs=True).collect()}
    assert got[1].n_bytes == len(png) and got[2].n_bytes == len(wav)
    # image features: channel means of the known pixels
    px = np.load(FIXTURES / "sample_image_pixels.npy") / 255.0
    for c in range(3):
        assert got[1].features[c] == pytest.approx(px[:, :, c].mean())
    assert got[1].features[3] == pytest.approx(px.std())
    # audio features: amplitude stats of the known samples
    mono = np.load(FIXTURES / "sample_audio_samples.npy") / 32768.0
    assert got[2].features[0] == pytest.approx(np.abs(mono).mean())
    assert got[2].features[1] == pytest.approx(np.sqrt((mono ** 2).mean()))
    assert len(got[1].features) == len(got[2].features) == \
        multimodal.FEATURE_DIM


def test_video_decode_stays_loud_stub():
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        multimodal._decode_real(b"anything", "video")
