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
    # fixed-gain quantization: in-range audio round-trips at unit gain
    peak = float(np.abs(x).max())
    gain = (32767 * 32768) // (max(1, int(np.ceil(peak))) * 32768)
    np.testing.assert_allclose(y, x * (gain / 32768), atol=2e-3)


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
    # tools/audio/np.py:7-11: gain = 32767*32768 // (ceil(peak)*32768)
    x = np.array([0.5, -1.0, 0.25], np.float32)
    out = native.float_to_int16(x)
    np.testing.assert_array_equal(out, [16383, -32767, 8191])
    # quiet audio keeps its loudness (no peak normalization up)
    quiet = np.array([0.1, -0.05], np.float32)
    np.testing.assert_array_equal(
        native.float_to_int16(quiet), [3276, -1638])
    # out-of-range audio attenuates by ceil(peak)
    loud = np.array([1.5, -0.75], np.float32)
    np.testing.assert_array_equal(
        native.float_to_int16(loud), [int(1.5 * 16383), int(-0.75 * 16383)])


def test_float_to_int16_native_matches_fallback(rng):
    x = (rng.standard_normal(4096) * 0.4).astype(np.float32)
    a = native.float_to_int16(x)
    # force the numpy fallback path
    peak = float(np.max(np.abs(x)))
    am = (32767 * 32768) // (max(1, int(np.ceil(peak))) * 32768)
    b = np.multiply(x, float(am)).astype(np.int16)
    np.testing.assert_array_equal(a, b)


def test_sha256_map_generation(tmp_path):
    base = tmp_path / "assets"
    os.makedirs(base / "asset" / "gpt", exist_ok=True)
    (base / "asset" / "Embed.safetensors").write_bytes(b"fake")
    m = dl.generate_sha256_map(str(base))
    assert "sha256_asset_Embed_safetensors" in m
    assert len(m["sha256_asset_Embed_safetensors"]) == 64
    # verification passes with the generated map, fails after tamper
    assert dl.check_asset(str(base), "asset/Embed.safetensors",
                          m["sha256_asset_Embed_safetensors"])
    (base / "asset" / "Embed.safetensors").write_bytes(b"tampered")
    assert not dl.check_asset(str(base), "asset/Embed.safetensors",
                              m["sha256_asset_Embed_safetensors"])


def test_trusted_map_matches_reference_keys():
    # the vendored map must cover every asset with the upstream key format
    m = dl.trusted_sha256_map()
    for rel in dl.ASSET_FILES:
        key = dl._map_key(rel)
        assert key in m, key
        assert len(m[key]) == 64


def test_verification_rejects_tampered_tree(tmp_path):
    # a self-attested sha256_map.json inside the tree must NOT be trusted
    base = tmp_path / "assets"
    os.makedirs(base / "asset" / "gpt", exist_ok=True)
    os.makedirs(base / "asset" / "tokenizer", exist_ok=True)
    for rel in dl.ASSET_FILES:
        p = base / rel
        p.write_bytes(b"attacker-controlled")
    import json
    (base / "sha256_map.json").write_text(
        json.dumps(dl.generate_sha256_map(str(base))))
    assert not dl.check_all_assets(str(base))

    from chattts_tpu import Chat
    chat = Chat()
    assert chat.download_models("custom", custom_path=str(base)) is None
    assert chat.load(source="custom", custom_path=str(base)) is False


def test_transcode_wav_and_gate(rng):
    x = rng.standard_normal(1000).astype(np.float32)
    assert audio.transcode(x, "wav")[:4] == b"RIFF"
    import shutil
    if shutil.which("ffmpeg") is None:
        with pytest.raises(RuntimeError, match="ffmpeg"):
            audio.transcode(x, "mp3")
