"""Speech frontend: MFCC / log-mel filterbank + deltas, batched and jitted.

Reference counterpart: per-utterance MFCC extraction in the preprocessing
scripts — 13-dim MFCCs from 25 ms windows / 10 ms hop plus delta and
delta-delta, saved to .npz (SURVEY.md §2 C1, §3.4 🔥).  Here the whole batch
of waveforms is one jitted call: framing is a gather, the spectrogram/mel/DCT
stages are matmuls (MXU), deltas are a fixed FIR correlation.  This jnp
version is also the oracle for the fused Pallas kernel in
``ops/mfcc_pallas.py``.

All shapes are static; variable-length audio is handled with a sample-length
array and masked frames.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class MfccConfig:
    sample_rate: int = 16000
    win_length: int = 400  # 25 ms
    hop_length: int = 160  # 10 ms
    n_fft: int = 512
    n_mels: int = 26
    n_mfcc: int = 13
    fmin: float = 0.0
    fmax: float | None = None  # default sr/2
    preemphasis: float = 0.97
    delta_width: int = 2
    log_floor: float = 1e-10


def hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)


def mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)


def mel_filterbank(cfg: MfccConfig) -> np.ndarray:
    """[n_mels, n_fft//2 + 1] triangular mel filters (HTK-style)."""
    fmax = cfg.fmax or cfg.sample_rate / 2
    mels = np.linspace(hz_to_mel(cfg.fmin), hz_to_mel(fmax), cfg.n_mels + 2)
    hz = mel_to_hz(mels)
    bins = np.floor((cfg.n_fft + 1) * hz / cfg.sample_rate).astype(int)
    fb = np.zeros((cfg.n_mels, cfg.n_fft // 2 + 1), dtype=np.float32)
    for m in range(1, cfg.n_mels + 1):
        lo, c, hi = bins[m - 1], bins[m], bins[m + 1]
        for k in range(lo, c):
            if c > lo:
                fb[m - 1, k] = (k - lo) / (c - lo)
        for k in range(c, hi):
            if hi > c:
                fb[m - 1, k] = (hi - k) / (hi - c)
    return fb


def dct_matrix(n_mfcc: int, n_mels: int) -> np.ndarray:
    """[n_mfcc, n_mels] orthonormal DCT-II."""
    k = np.arange(n_mfcc)[:, None]
    n = np.arange(n_mels)[None, :]
    d = np.cos(np.pi * k * (2 * n + 1) / (2 * n_mels)) * np.sqrt(2.0 / n_mels)
    d[0] *= 1.0 / np.sqrt(2.0)
    return d.astype(np.float32)


def num_frames(n_samples: int, cfg: MfccConfig) -> int:
    return max(0, (n_samples - cfg.win_length) // cfg.hop_length + 1)


def frame_signal(wav: jax.Array, cfg: MfccConfig) -> jax.Array:
    """[..., L] -> [..., F, win] overlapping frames (gather)."""
    n = wav.shape[-1]
    f = num_frames(n, cfg)
    idx = (
        jnp.arange(f)[:, None] * cfg.hop_length + jnp.arange(cfg.win_length)[None, :]
    )
    return wav[..., idx]


@functools.partial(jax.jit, static_argnames=("cfg", "kind"))
def extract(
    wav: jax.Array,
    wav_len: jax.Array | None = None,
    cfg: MfccConfig = MfccConfig(),
    kind: str = "mfcc",
) -> tuple[jax.Array, jax.Array]:
    """Batched features.

    wav: [N, L] float32 in [-1, 1]; wav_len: [N] sample counts (None => full).
    kind: 'mfcc' -> [N, F, n_mfcc], 'fbank' -> [N, F, n_mels] log-mels.
    Returns (features, frame_lens [N]).
    """
    n, L = wav.shape
    if wav_len is None:
        wav_len = jnp.full((n,), L, jnp.int32)

    # pre-emphasis y[t] = x[t] - a*x[t-1]
    pre = jnp.concatenate([wav[:, :1], wav[:, 1:] - cfg.preemphasis * wav[:, :-1]], 1)

    frames = frame_signal(pre, cfg)  # [N, F, win]
    window = jnp.asarray(np.hanning(cfg.win_length).astype(np.float32))
    frames = frames * window

    spec = jnp.fft.rfft(frames, n=cfg.n_fft, axis=-1)
    power = (spec.real**2 + spec.imag**2) / cfg.n_fft  # [N, F, n_fft//2+1]

    fb = jnp.asarray(mel_filterbank(cfg))
    # HIGHEST: TPU einsum would round to bf16 — too coarse for spectra
    mel = jnp.einsum(
        "nfk,mk->nfm", power, fb, precision=jax.lax.Precision.HIGHEST
    )
    logmel = jnp.log(jnp.maximum(mel, cfg.log_floor))

    frame_lens = jnp.maximum(
        0, (wav_len - cfg.win_length) // cfg.hop_length + 1
    ).astype(jnp.int32)

    if kind == "fbank":
        return logmel, frame_lens
    dct = jnp.asarray(dct_matrix(cfg.n_mfcc, cfg.n_mels))
    mfcc = jnp.einsum(
        "nfm,cm->nfc", logmel, dct, precision=jax.lax.Precision.HIGHEST
    )
    return mfcc, frame_lens


def add_deltas(
    feats: jax.Array, frame_lens: jax.Array, width: int = 2
) -> jax.Array:
    """[N, F, D] -> [N, F, 3D] (static, delta, delta-delta).

    Standard regression deltas with edge replication inside the valid region:
    d[t] = sum_n n * (c[t+n] - c[t-n]) / (2 * sum n^2), indices clipped to
    [0, len-1] per utterance.
    """
    n, f, d = feats.shape
    denom = 2.0 * sum(i * i for i in range(1, width + 1))
    t = jnp.arange(f)
    last = jnp.maximum(frame_lens - 1, 0)[:, None]  # [N, 1]

    def regress(x):
        out = jnp.zeros_like(x)
        for i in range(1, width + 1):
            hi = jnp.minimum(t[None, :] + i, last)
            lo = jnp.clip(t[None, :] - i, 0, None)
            lo = jnp.minimum(lo, last)
            xp = jnp.take_along_axis(x, hi[:, :, None], axis=1)
            xm = jnp.take_along_axis(x, lo[:, :, None], axis=1)
            out = out + i * (xp - xm)
        return out / denom

    d1 = regress(feats)
    d2 = regress(d1)
    return jnp.concatenate([feats, d1, d2], axis=-1)


def cmvn(feats: jax.Array, frame_lens: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Per-utterance cepstral mean/variance normalization (masked)."""
    n, f, d = feats.shape
    mask = (jnp.arange(f)[None, :] < frame_lens[:, None])[..., None]
    cnt = jnp.maximum(jnp.sum(mask, axis=1), 1)
    mean = jnp.sum(jnp.where(mask, feats, 0.0), axis=1, keepdims=True) / cnt[:, None]
    var = (
        jnp.sum(jnp.where(mask, (feats - mean) ** 2, 0.0), axis=1, keepdims=True)
        / cnt[:, None]
    )
    out = (feats - mean) * jax.lax.rsqrt(var + eps)
    return jnp.where(mask, out, 0.0)
