"""Whisper log-mel spectrogram frontend (clean-room, JAX).

Reproduces the recipe Whisper checkpoints were trained with (the HF
``WhisperFeatureExtractor`` numbers): 16 kHz audio padded/trimmed to the
30 s window, reflect-centered 400-point hann STFT at hop 160, slaney-scale
slaney-normalized mel filterbank, ``log10(clip(mel, 1e-10))`` compressed to
``(max(log, max-8) + 4) / 4``. Parity vs the HF extractor is pinned by
tests/test_whisper.py (max|diff| ~1e-6 level — same math, different FFT).

The STFT runs as one jitted ``jnp.fft.rfft`` over framed audio — at 3000
frames x 400 samples this is host-trivial but keeps the whole ASR path
(mel -> encoder -> decode) on-device with no numpy in the loop.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16000
N_FFT = 400
HOP = 160
CHUNK_SECONDS = 30


def _hz_to_mel(f):
    """Slaney mel scale: linear below 1 kHz, log above."""
    f = np.asarray(f, np.float64)
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / (200.0 / 3)
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz,
                    min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep,
                    f / (200.0 / 3))


def _mel_to_hz(m):
    m = np.asarray(m, np.float64)
    min_log_mel = 1000.0 / (200.0 / 3)
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel,
                    1000.0 * np.exp(logstep * (m - min_log_mel)),
                    m * (200.0 / 3))


@functools.lru_cache(maxsize=4)
def mel_filters(n_mels: int = 80, n_fft: int = N_FFT,
                sr: int = SAMPLE_RATE) -> np.ndarray:
    """[n_mels, n_fft//2 + 1] slaney-normalized triangular filterbank
    (fmin 0, fmax sr/2) — the table HF ships inside its extractor."""
    fft_freqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    mel_pts = np.linspace(_hz_to_mel(0.0), _hz_to_mel(sr / 2.0), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)
    lower, center, upper = hz_pts[:-2], hz_pts[1:-1], hz_pts[2:]
    up = (fft_freqs[None, :] - lower[:, None]) / (center - lower)[:, None]
    down = (upper[:, None] - fft_freqs[None, :]) / (upper - center)[:, None]
    fb = np.maximum(0.0, np.minimum(up, down))
    # slaney norm: constant energy per channel
    fb *= (2.0 / (upper - lower))[:, None]
    return fb.astype(np.float32)


def log_mel_spectrogram(audio, n_mels: int = 80, pad_to_chunk: bool = True):
    """audio: [T] or [B, T] float32 at 16 kHz -> [.., n_mels, frames]
    (HF layout: mel bins on the -2 axis). ``pad_to_chunk`` zero-pads /
    trims to the 30 s window first (the Whisper recipe)."""
    x = jnp.asarray(audio, jnp.float32)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None]
    if pad_to_chunk:
        target = CHUNK_SECONDS * SAMPLE_RATE
        if x.shape[1] >= target:
            x = x[:, :target]
        else:
            x = jnp.pad(x, ((0, 0), (0, target - x.shape[1])))
    # center pad (reflect), frame, window, rfft
    half = N_FFT // 2
    xp = jnp.pad(x, ((0, 0), (half, half)), mode="reflect")
    n_frames = 1 + (xp.shape[1] - N_FFT) // HOP
    idx = jnp.arange(n_frames)[:, None] * HOP + jnp.arange(N_FFT)[None, :]
    frames = xp[:, idx]                                     # [B, F, 400]
    window = jnp.asarray(np.hanning(N_FFT + 1)[:-1], jnp.float32)
    spec = jnp.fft.rfft(frames * window, axis=-1)
    power = jnp.abs(spec[:, :-1]) ** 2                      # drop last frame
    fb = jnp.asarray(mel_filters(n_mels))
    mel = jnp.einsum("mf,btf->bmt", fb, power)
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    log_spec = jnp.maximum(log_spec,
                           jnp.max(log_spec, axis=(1, 2), keepdims=True) - 8.0)
    out = (log_spec + 4.0) / 4.0
    return out[0] if squeeze else out
