"""Waveform I/O and resampling tests."""

import numpy as np
import pytest

from music2midi_tpu.audio import load, normalize, read_wav, resample, write_wav


def test_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    x = (rng.normal(size=16000) * 0.2).astype(np.float32)
    p = tmp_path / "a.wav"
    write_wav(p, x, 16000)
    y, sr = read_wav(p)
    assert sr == 16000 and y.shape == (1, 16000)
    np.testing.assert_allclose(y[0], x, atol=1e-4)


def test_wav_stereo(tmp_path):
    x = np.stack([np.ones(100, np.float32) * 0.5,
                  -np.ones(100, np.float32) * 0.5])
    p = tmp_path / "s.wav"
    write_wav(p, x, 8000)
    y, sr = read_wav(p)
    assert y.shape == (2, 100)
    mono, _ = load(p, sr=None)
    np.testing.assert_allclose(mono, 0.0, atol=1e-4)


def test_resample_preserves_tone(tmp_path):
    # 440 Hz at 22050 -> 16000: frequency must be preserved
    t = np.arange(22050) / 22050
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y = resample(x, 22050, 16000)
    assert abs(len(y) - 16000) <= 1
    spec = np.abs(np.fft.rfft(y[:16000]))
    freq = np.fft.rfftfreq(16000, 1 / 16000)
    assert abs(freq[np.argmax(spec)] - 440) < 2


def test_load_offset_duration(tmp_path):
    sr = 22050
    x = np.arange(sr * 3, dtype=np.float32) / (sr * 3)
    p = tmp_path / "d.wav"
    write_wav(p, x, sr)
    y, got_sr = load(p, sr=None, offset=1.0, duration=1.0)
    assert got_sr == sr and len(y) == sr
    assert abs(y[0] - x[sr]) < 1e-3


def test_normalize():
    x = np.array([0.1, -0.5, 0.25], np.float32)
    y = normalize(x)
    assert abs(np.abs(y).max() - 1.0) < 1e-6
    assert (normalize(np.zeros(4, np.float32)) == 0).all()


def test_load_rejects_unknown_format_without_ffmpeg(tmp_path):
    import shutil
    p = tmp_path / "x.mp3"
    p.write_bytes(b"\xff\xfbgarbage")
    if shutil.which("ffmpeg") is None:
        with pytest.raises(ValueError):
            load(p, sr=16000)


def test_24bit_wav(tmp_path):
    # hand-build a 24-bit PCM wav
    import struct
    vals = np.array([0, 2**22, -(2**22)], dtype=np.int32)
    raw = b"".join(
        int(v & 0xFFFFFF).to_bytes(3, "little") for v in vals
    )
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(raw)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 8000 * 3, 3, 24)
        + b"data" + struct.pack("<I", len(raw))
    )
    p = tmp_path / "b24.wav"
    p.write_bytes(hdr + raw)
    y, sr = read_wav(p)
    np.testing.assert_allclose(y[0], [0.0, 0.5, -0.5], atol=1e-6)
