import jax.numpy as jnp
import numpy as np
import pytest

from multimodalworddiscovery_tpu.frontend.speech import MfccConfig, extract
from multimodalworddiscovery_tpu.ops.mfcc_pallas import extract_pallas, mfcc_from_frames


@pytest.fixture(scope="module")
def wavs():
    rng = np.random.default_rng(1)
    n, L = 3, 8000
    t = np.arange(L) / 16000
    wav = (0.1 * rng.normal(size=(n, L))).astype(np.float32)
    for i in range(n):
        wav[i] += 0.3 * np.sin(2 * np.pi * (300 + 150 * i) * t).astype(np.float32)
    lens = np.array([8000, 6000, 3000], dtype=np.int32)
    return wav, lens


def test_pallas_mfcc_matches_jnp(wavs):
    wav, lens = wavs
    cfg = MfccConfig()
    want, flens = extract(jnp.asarray(wav), jnp.asarray(lens), cfg)
    got, flens2 = extract_pallas(
        jnp.asarray(wav), jnp.asarray(lens), cfg, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(flens), np.asarray(flens2))
    want = np.asarray(want)
    got = np.asarray(got)
    for i in range(wav.shape[0]):
        np.testing.assert_allclose(
            got[i, : flens[i]], want[i, : flens[i]], rtol=1e-3, atol=2e-3
        )


def test_pallas_fbank_matches_jnp(wavs):
    wav, lens = wavs
    cfg = MfccConfig()
    want, flens = extract(jnp.asarray(wav), jnp.asarray(lens), cfg, kind="fbank")
    got, _ = extract_pallas(
        jnp.asarray(wav), jnp.asarray(lens), cfg, kind="fbank", interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got)[0, : flens[0]],
        np.asarray(want)[0, : flens[0]],
        rtol=1e-3,
        atol=2e-3,
    )


def test_block_padding_irrelevant(wavs):
    """Frame counts that don't divide the block size still come out right."""
    wav, lens = wavs
    cfg = MfccConfig()
    pre = jnp.asarray(wav)
    from multimodalworddiscovery_tpu.frontend.speech import frame_signal

    frames = frame_signal(pre, cfg)[0]  # [F, win] (no pre-emphasis: symmetric test)
    out1 = mfcc_from_frames(frames, cfg, interpret=True, block_frames=256)
    out2 = mfcc_from_frames(frames, cfg, interpret=True, block_frames=128)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-4, atol=1e-5)
