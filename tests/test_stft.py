"""Spectral op golden tests vs torch.stft / torch.istft."""

import numpy as np
import jax.numpy as jnp
import torch

from chattts_tpu.config import MelConfig
from chattts_tpu.ops import stft


def test_hann_window_matches_torch():
    np.testing.assert_allclose(
        stft.hann_window(1024), torch.hann_window(1024).numpy(), atol=1e-6)


def test_stft_magnitude_matches_torch(rng):
    n_fft, hop = 256, 64
    x = rng.standard_normal((2, 1000)).astype(np.float32)
    ours = np.asarray(stft.stft_magnitude(jnp.asarray(x), n_fft, hop))
    ref = torch.stft(
        torch.tensor(x), n_fft, hop, window=torch.hann_window(n_fft),
        center=True, pad_mode="reflect", return_complex=True,
    ).abs().numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_istft_matches_torch(rng):
    n_fft, hop = 256, 64
    T = 20
    spec = (rng.standard_normal((2, n_fft // 2 + 1, T))
            + 1j * rng.standard_normal((2, n_fft // 2 + 1, T))).astype(np.complex64)
    ours = np.asarray(stft.istft(jnp.asarray(spec), n_fft, hop))
    ref = torch.istft(
        torch.tensor(spec), n_fft, hop, window=torch.hann_window(n_fft),
        center=True,
    ).numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_stft_istft_round_trip(rng):
    """Full-complex round trip reconstructs the interior of the signal."""
    n_fft, hop = 1024, 256
    x = rng.standard_normal((1, 4096)).astype(np.float32)
    pad = n_fft // 2
    xp = jnp.pad(jnp.asarray(x), ((0, 0), (pad, pad)), mode="reflect")
    num_frames = 1 + x.shape[-1] // hop
    idx = np.arange(num_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = np.asarray(xp)[:, idx] * stft.hann_window(n_fft)
    spec = np.fft.rfft(frames, axis=-1).transpose(0, 2, 1).astype(np.complex64)
    rec = np.asarray(stft.istft(jnp.asarray(spec), n_fft, hop))
    n = min(rec.shape[-1], x.shape[-1])
    np.testing.assert_allclose(rec[:, hop:n - hop], x[:, hop:n - hop],
                               atol=1e-3)


def test_mel_filterbank_properties():
    fb = stft.mel_filterbank(513, 100, 24000)
    assert fb.shape == (513, 100)
    assert (fb >= 0).all()
    # triangles tile the spectrum: every mel bin has mass, interior freqs covered
    assert (fb.sum(0) > 0).all()
    assert (fb[1:-1].sum(1) >= 0).all()


def test_log_mel_shapes(rng):
    cfg = MelConfig()
    x = rng.standard_normal((2, 24000)).astype(np.float32)
    mel = np.asarray(stft.log_mel_spectrogram(jnp.asarray(x), cfg))
    assert mel.shape == (2, 100, 1 + 24000 // 256)
    assert np.isfinite(mel).all()
    assert mel.min() >= np.log(1e-5) - 1e-4
