"""Spectral ops: mel spectrogram and inverse STFT, pure XLA.

TPU-native replacements for the torchaudio ``MelSpectrogram`` the reference
uses for DVAE audio encoding (``ChatTTS/model/dvae.py:175-206``) and for the
``torch.istft`` call inside Vocos' ISTFT head (instantiated at
``ChatTTS/core.py:298-318``).  Framing is expressed as a gather with a
precomputed index grid and the overlap-add as a sum of ``n_fft//hop`` shifted
strided views - both static-shape, fusable XLA; no host round-trips.

Conventions match torch: hann window (periodic), center padding (reflect for
the forward STFT, trim + window-square normalization for the inverse).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax.numpy as jnp

from ..config import MelConfig


def hann_window(n: int) -> np.ndarray:
    """Periodic Hann window (== torch.hann_window(n))."""
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n) / n))).astype(np.float32)


def _hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


@lru_cache(maxsize=4)
def mel_filterbank(
    n_freqs: int, n_mels: int, sample_rate: int, f_min: float = 0.0,
    f_max: float | None = None,
) -> np.ndarray:
    """HTK-scale triangular mel filterbank, (n_freqs, n_mels), norm=None.

    Matches ``torchaudio.functional.melscale_fbanks`` with its defaults (the
    configuration the reference's MelSpectrogramFeatures resolves to).
    """
    f_max = float(f_max if f_max is not None else sample_rate / 2)
    all_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    m_pts = np.linspace(_hz_to_mel_htk(f_min), _hz_to_mel_htk(f_max), n_mels + 2)
    f_pts = _mel_to_hz_htk(m_pts)
    f_diff = np.diff(f_pts)  # (n_mels + 1,)
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels + 2)
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


def _frame_indices(num_frames: int, n_fft: int, hop: int) -> np.ndarray:
    return (np.arange(num_frames)[:, None] * hop + np.arange(n_fft)[None, :])


def stft_magnitude(audio: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """|STFT| with center (reflect) padding. audio: (B, N) -> (B, F, T)."""
    pad = n_fft // 2
    x = jnp.pad(audio, ((0, 0), (pad, pad)), mode="reflect")
    num_frames = 1 + audio.shape[-1] // hop
    idx = jnp.asarray(_frame_indices(num_frames, n_fft, hop))
    frames = x[:, idx]  # (B, T, n_fft)
    win = jnp.asarray(hann_window(n_fft))
    spec = jnp.fft.rfft(frames * win, axis=-1)  # (B, T, F)
    return jnp.abs(spec).transpose(0, 2, 1).astype(jnp.float32)


def log_mel_spectrogram(audio: jnp.ndarray, cfg: MelConfig) -> jnp.ndarray:
    """Waveform -> log-mel features, (B, n_mels, T).

    power=1 magnitude mel with log(clip(., 1e-5)) exactly as the reference's
    MelSpectrogramFeatures (dvae.py:199-206).
    """
    mag = stft_magnitude(audio, cfg.n_fft, cfg.hop_length)  # (B, F, T)
    fb = jnp.asarray(
        mel_filterbank(cfg.n_fft // 2 + 1, cfg.n_mels, cfg.sample_rate)
    )
    mel = jnp.einsum("bft,fm->bmt", mag, fb)
    return jnp.log(jnp.clip(mel, min=1e-5))


def istft_stream_init(batch: int, n_fft: int, hop: int
                      ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(numerator carry (B, n_fft - hop), window-sum carry (n_fft - hop))."""
    return (jnp.zeros((batch, n_fft - hop), jnp.float32),
            jnp.zeros((n_fft - hop,), jnp.float32))


def istft_stream(spec: jnp.ndarray, carry, n_fft: int, hop: int):
    """Streaming overlap-add ISTFT: feed F frames, emit F*hop RAW samples.

    spec: complex (B, F, n_fft//2+1) — frames in time-major layout.  The
    carry holds the partial overlap sums (numerator and squared-window
    denominator) for the last n_fft - hop raw positions; a zero carry
    reproduces the full istft's left edge exactly.  The emitted samples
    are the full istft's RAW timeline (before center trimming): callers
    drop the first n_fft//2 samples once.  The stream never finalizes -
    the utterance tail comes from the caller's full-window flush.
    Returns (samples (B, F*hop) f32, new carry).
    """
    if n_fft % hop != 0:
        raise ValueError("istft requires hop | n_fft")
    ratio = n_fft // hop
    B, F, _ = spec.shape
    win = jnp.asarray(hann_window(n_fft))
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1) * win  # (B, F, n_fft)
    wsq = (win * win).reshape(ratio, hop)
    pieces = frames.reshape(B, F, ratio, hop)
    out = jnp.zeros((B, F + ratio - 1, hop), dtype=frames.dtype)
    den = jnp.zeros((F + ratio - 1, hop), dtype=frames.dtype)
    for j in range(ratio):
        out = out.at[:, j : j + F].add(pieces[:, :, j])
        den = den.at[j : j + F].add(jnp.broadcast_to(wsq[j], (F, hop)))
    num_c, den_c = carry
    out = out.at[:, : ratio - 1].add(num_c.reshape(B, ratio - 1, hop))
    den = den.at[: ratio - 1].add(den_c.reshape(ratio - 1, hop))
    emit = (out[:, :F].reshape(B, F * hop)
            / jnp.maximum(den[:F].reshape(F * hop), 1e-11)[None, :])
    new_carry = (out[:, F:].reshape(B, n_fft - hop),
                 den[F:].reshape(n_fft - hop))
    return emit.astype(jnp.float32), new_carry


def istft(spec: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """Inverse STFT with center trimming (torch.istft semantics).

    spec: complex (B, F, T) -> audio (B, (T-1)*hop) float32.

    The overlap-add is computed as a sum of ``n_fft//hop`` shifted strided
    views, which XLA lowers to cheap adds over contiguous slices instead of a
    scatter.
    """
    if n_fft % hop != 0:
        raise ValueError("istft requires hop | n_fft")
    ratio = n_fft // hop
    B, F, T = spec.shape
    win = jnp.asarray(hann_window(n_fft))
    frames = jnp.fft.irfft(spec.transpose(0, 2, 1), n=n_fft, axis=-1) * win
    wsq_frame = win * win

    total = (T - 1) * hop + n_fft
    # frame t covers [t*hop, t*hop + n_fft); split each frame into `ratio`
    # hop-sized pieces: piece j of frame t lands at output chunk (t + j).
    pieces = frames.reshape(B, T, ratio, hop)
    win_pieces = wsq_frame.reshape(ratio, hop)
    out = jnp.zeros((B, total // hop, hop), dtype=frames.dtype)
    wsum = jnp.zeros((total // hop, hop), dtype=frames.dtype)
    for j in range(ratio):
        out = out.at[:, j : j + T].add(pieces[:, :, j])
        wsum = wsum.at[j : j + T].add(
            jnp.broadcast_to(win_pieces[j], (T, hop))
        )
    out = out.reshape(B, total)
    wsum = wsum.reshape(total)
    # trim center padding: keep [n_fft//2, n_fft//2 + (T-1)*hop)
    start = n_fft // 2
    length = (T - 1) * hop
    out = out[:, start : start + length]
    wsum = wsum[start : start + length]
    return (out / jnp.maximum(wsum, 1e-11)).astype(jnp.float32)
