"""Audio utils: wav round trip, resampling, PCM quantizer, checksum map."""

import io
import os

import numpy as np
import pytest

from chattts_tpu.utils import audio, dl, native


def test_wav_round_trip(tmp_path, rng):
    x = (rng.standard_normal(24000) * 0.3).astype(np.float32)
    p = str(tmp_path / "t.wav")
    audio.write_wav(p, x)
    y, sr = audio.read_wav(p)
    assert sr == 24000
    assert y.shape == x.shape
    # peak-normalized quantization: compare shapes after rescale
    scale = np.abs(x).max()
    np.testing.assert_allclose(y * scale, x * (32767 / 32768), atol=2e-3)


def test_wav_bytes_header(rng):
    b = audio.wav_bytes(rng.standard_normal(1000).astype(np.float32))
    assert b[:4] == b"RIFF" and b[8:12] == b"WAVE"


def test_resample_sine():
    sr_in, sr_out = 16000, 24000
    t = np.arange(sr_in) / sr_in
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y = audio.resample(x, sr_in, sr_out)
    assert abs(y.size - sr_out) <= 2
    # the 440 Hz tone must survive: correlate against reference sine
    t2 = np.arange(y.size) / sr_out
    ref = np.sin(2 * np.pi * 440 * t2)
    corr = np.dot(y[2000:-2000], ref[2000:-2000]) / (
        np.linalg.norm(y[2000:-2000]) * np.linalg.norm(ref[2000:-2000]))
    assert corr > 0.99


def test_load_audio_wav(tmp_path, rng):
    x = (rng.standard_normal(8000) * 0.5).astype(np.float32)
    p = str(tmp_path / "in.wav")
    audio.write_wav(p, x, sample_rate=16000)
    y = audio.load_audio(p, sr=24000)
    assert abs(y.size - 12000) <= 2


def test_float_to_int16_reference_semantics():
    x = np.array([0.5, -1.0, 0.25], np.float32)
    out = native.float_to_int16(x)
    # scale = 32767 / max|x|; trunc toward zero (numba np.py:7-11)
    np.testing.assert_array_equal(out, [16383, -32767, 8191])


def test_sha256_map_generation(tmp_path):
    base = tmp_path / "assets"
    os.makedirs(base / "asset" / "gpt", exist_ok=True)
    (base / "asset" / "Embed.safetensors").write_bytes(b"fake")
    m = dl.generate_sha256_map(str(base))
    assert "sha256_asset_Embed" in m
    assert len(m["sha256_asset_Embed"]) == 64
    # verification passes with the generated map, fails after tamper
    assert dl.check_asset(str(base), "asset/Embed.safetensors",
                          m["sha256_asset_Embed"])
    (base / "asset" / "Embed.safetensors").write_bytes(b"tampered")
    assert not dl.check_asset(str(base), "asset/Embed.safetensors",
                              m["sha256_asset_Embed"])


def test_transcode_wav_and_gate(rng):
    x = rng.standard_normal(1000).astype(np.float32)
    assert audio.transcode(x, "wav")[:4] == b"RIFF"
    import shutil
    if shutil.which("ffmpeg") is None:
        with pytest.raises(RuntimeError, match="ffmpeg"):
            audio.transcode(x, "mp3")
