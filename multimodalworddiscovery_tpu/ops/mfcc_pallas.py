"""Fused Pallas MFCC kernel.

BASELINE.json north star: "the acoustic frontend (MFCC/filterbank/delta
features) becomes fused Pallas kernels streaming straight to HBM".

Design: framing is a cheap XLA gather (frontend/speech.py); everything after
it fuses into ONE kernel pass over the frames:

  windowed DFT  -> two MXU matmuls against cos/sin matrices with the Hann
                   window folded in (no FFT primitive exists in Pallas;
                   at win=400 a dense DFT is a trivially small matmul)
  power         -> VPU elementwise (re^2 + im^2) / n_fft
  mel filterbank-> MXU matmul
  log           -> VPU
  DCT-II        -> MXU matmul

One HBM read of the frames, one HBM write of the features; all intermediates
(spectrum, mel energies) live only in VMEM/registers.  The jnp pipeline in
``frontend/speech.py`` is the test oracle.

All operand matrices are zero-padded to lane-aligned shapes (multiples of
128); padded DFT bins produce zero power and padded mel rows are sliced off
by the caller.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodalworddiscovery_tpu.frontend.speech import (
    MfccConfig,
    dct_matrix,
    mel_filterbank,
)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=8)
def _operands(cfg: MfccConfig) -> tuple[np.ndarray, ...]:
    """Precompute padded (cosW, sinW, fbT, dctT) with window folded in."""
    n_bins = cfg.n_fft // 2 + 1
    win_p = _round_up(cfg.win_length, 128)
    bins_p = _round_up(n_bins, 128)
    mels_p = _round_up(cfg.n_mels, 128)
    out_p = _round_up(cfg.n_mfcc, 128)

    t = np.arange(cfg.n_fft)[:, None]
    k = np.arange(n_bins)[None, :]
    ang = 2.0 * np.pi * t * k / cfg.n_fft
    window = np.hanning(cfg.win_length)
    # fold window; frames are length win_length (zero-padded FFT equivalent)
    cos = np.zeros((win_p, bins_p), np.float32)
    sin = np.zeros((win_p, bins_p), np.float32)
    cos[: cfg.win_length, :n_bins] = np.cos(ang[: cfg.win_length]) * window[:, None]
    sin[: cfg.win_length, :n_bins] = -np.sin(ang[: cfg.win_length]) * window[:, None]

    fb_t = np.zeros((bins_p, mels_p), np.float32)
    fb_t[:n_bins, : cfg.n_mels] = mel_filterbank(cfg).T

    dct_t = np.zeros((mels_p, out_p), np.float32)
    dct_t[: cfg.n_mels, : cfg.n_mfcc] = dct_matrix(cfg.n_mfcc, cfg.n_mels).T
    return cos, sin, fb_t, dct_t


def _kernel(frames_ref, cos_ref, sin_ref, fb_ref, dct_ref, out_ref, *, n_fft, log_floor, n_mels):
    # precision=HIGHEST: the MXU would otherwise round inputs to bf16, which
    # is too coarse for a DFT (observed ~0.3 abs error in MFCCs on real TPU)
    hi = jax.lax.Precision.HIGHEST
    f = frames_ref[:]
    re = jnp.dot(f, cos_ref[:], preferred_element_type=jnp.float32, precision=hi)
    im = jnp.dot(f, sin_ref[:], preferred_element_type=jnp.float32, precision=hi)
    power = (re * re + im * im) * (1.0 / n_fft)
    mel = jnp.dot(power, fb_ref[:], preferred_element_type=jnp.float32, precision=hi)
    # padded mel columns are all-zero -> log_floor; harmless, sliced by caller
    logmel = jnp.log(jnp.maximum(mel, log_floor))
    col = jax.lax.broadcasted_iota(jnp.int32, logmel.shape, 1)
    logmel = jnp.where(col < n_mels, logmel, 0.0)  # keep DCT input exact
    out_ref[:] = jnp.dot(
        logmel, dct_ref[:], preferred_element_type=jnp.float32, precision=hi
    )


@functools.partial(jax.jit, static_argnames=("cfg", "kind", "interpret", "block_frames"))
def mfcc_from_frames(
    frames: jax.Array,
    cfg: MfccConfig = MfccConfig(),
    kind: str = "mfcc",
    interpret: bool = False,
    block_frames: int = 256,
) -> jax.Array:
    """Fused MFCC from pre-emphasized frames.

    frames: [M, win_length] (flatten [N, F] -> M upstream; pad M freely —
    extra rows produce garbage rows the caller slices off).
    Returns [M, n_mfcc] (or [M, n_mels] log-mels for kind='fbank').
    """
    m = frames.shape[0]
    cos, sin, fb_t, dct_t = _operands(cfg)
    win_p = cos.shape[0]
    mels_p = fb_t.shape[1]
    out_p = dct_t.shape[1]
    if kind == "fbank":
        # skip the DCT by substituting identity
        eye = np.zeros((mels_p, mels_p), np.float32)
        np.fill_diagonal(eye, 1.0)
        dct_t = eye
        out_p = mels_p

    m_p = _round_up(max(m, 1), block_frames)
    frames_p = jnp.zeros((m_p, win_p), frames.dtype)
    frames_p = frames_p.at[:m, : frames.shape[1]].set(frames)

    grid = (m_p // block_frames,)
    out = pl.pallas_call(
        functools.partial(
            _kernel, n_fft=cfg.n_fft, log_floor=cfg.log_floor, n_mels=cfg.n_mels
        ),
        out_shape=jax.ShapeDtypeStruct((m_p, out_p), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (block_frames, win_p), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((win_p, cos.shape[1]), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((win_p, sin.shape[1]), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((fb_t.shape[0], mels_p), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dct_t.shape[0], out_p), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (block_frames, out_p), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(frames_p, jnp.asarray(cos), jnp.asarray(sin), jnp.asarray(fb_t), jnp.asarray(dct_t))

    n_out = cfg.n_mels if kind == "fbank" else cfg.n_mfcc
    return out[:m, :n_out]


@functools.partial(jax.jit, static_argnames=("cfg", "kind", "interpret"))
def extract_pallas(
    wav: jax.Array,
    wav_len: jax.Array | None = None,
    cfg: MfccConfig = MfccConfig(),
    kind: str = "mfcc",
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Drop-in fused replacement for frontend.speech.extract."""
    from multimodalworddiscovery_tpu.frontend.speech import frame_signal

    n, L = wav.shape
    if wav_len is None:
        wav_len = jnp.full((n,), L, jnp.int32)
    pre = jnp.concatenate([wav[:, :1], wav[:, 1:] - cfg.preemphasis * wav[:, :-1]], 1)
    frames = frame_signal(pre, cfg)  # [N, F, win]
    f = frames.shape[1]
    flat = frames.reshape(n * f, cfg.win_length)
    feats = mfcc_from_frames(flat, cfg, kind=kind, interpret=interpret)
    feats = feats.reshape(n, f, -1)
    frame_lens = jnp.maximum(0, (wav_len - cfg.win_length) // cfg.hop_length + 1).astype(jnp.int32)
    return feats, frame_lens
