import jax.numpy as jnp
import numpy as np
import pytest

from multimodalworddiscovery_tpu.frontend.speech import (
    MfccConfig,
    add_deltas,
    cmvn,
    extract,
    num_frames,
)
from multimodalworddiscovery_tpu.oracles.numpy_mfcc import deltas_np, mfcc_np


@pytest.fixture(scope="module")
def wavs():
    rng = np.random.default_rng(0)
    n, L = 4, 16000  # 1 s at 16 kHz
    wav = rng.normal(size=(n, L)).astype(np.float32) * 0.1
    # make it speech-ish: sum of a few sinusoids + noise
    t = np.arange(L) / 16000
    for i in range(n):
        for f0 in (200 * (i + 1), 700, 1800):
            wav[i] += 0.2 * np.sin(2 * np.pi * f0 * t).astype(np.float32)
    lens = np.array([16000, 12345, 8000, 4567], dtype=np.int32)
    return wav, lens


def test_mfcc_matches_numpy_oracle(wavs):
    wav, lens = wavs
    cfg = MfccConfig()
    feats, flens = extract(jnp.asarray(wav), jnp.asarray(lens), cfg)
    feats = np.asarray(feats)
    for i in range(wav.shape[0]):
        want = mfcc_np(wav[i, : lens[i]], cfg)
        assert flens[i] == want.shape[0] == num_frames(lens[i], cfg)
        np.testing.assert_allclose(
            feats[i, : flens[i]], want, rtol=1e-3, atol=1e-3
        )


def test_fbank_matches_numpy_oracle(wavs):
    wav, lens = wavs
    cfg = MfccConfig()
    feats, flens = extract(jnp.asarray(wav), jnp.asarray(lens), cfg, kind="fbank")
    feats = np.asarray(feats)
    want = mfcc_np(wav[0], cfg, kind="fbank")
    np.testing.assert_allclose(feats[0, : flens[0]], want, rtol=1e-3, atol=1e-3)


def test_deltas_match_numpy_oracle(wavs):
    wav, lens = wavs
    cfg = MfccConfig()
    feats, flens = extract(jnp.asarray(wav), jnp.asarray(lens), cfg)
    full = np.asarray(add_deltas(feats, flens))
    assert full.shape[-1] == 3 * cfg.n_mfcc
    for i in (0, 3):
        want = deltas_np(mfcc_np(wav[i, : lens[i]], cfg))
        np.testing.assert_allclose(full[i, : flens[i]], want, rtol=1e-3, atol=1e-3)


def test_cmvn_zero_mean_unit_var(wavs):
    wav, lens = wavs
    feats, flens = extract(jnp.asarray(wav), jnp.asarray(lens))
    normed = np.asarray(cmvn(feats, flens))
    for i in range(wav.shape[0]):
        v = normed[i, : flens[i]]
        np.testing.assert_allclose(v.mean(0), 0.0, atol=1e-4)
        np.testing.assert_allclose(v.var(0), 1.0, rtol=1e-2)
    # padding stays zero
    assert np.all(normed[1, flens[1] :] == 0)


def test_wav_roundtrip(tmp_path):
    from multimodalworddiscovery_tpu.utils.audio import read_wav, write_wav

    rng = np.random.default_rng(0)
    wav = (0.5 * np.sin(2 * np.pi * 440 * np.arange(8000) / 16000)).astype(np.float32)
    write_wav(tmp_path / "a.wav", wav, 16000)
    back = read_wav(tmp_path / "a.wav")
    assert back.dtype == np.float32 and len(back) == 8000
    np.testing.assert_allclose(back, wav, atol=2e-3)
    # resampling path
    half = read_wav(tmp_path / "a.wav", target_rate=8000)
    assert len(half) == 4000
