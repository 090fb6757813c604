"""Float64 parity path (SURVEY.md §4/§6): under x64, the batched JAX EM
matches the per-utterance NumPy oracle to ~machine precision — the
"bit-for-bit comparable" contract; the float32 TPU path is then held to
decode-level metric parity."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodalworddiscovery_tpu.data import make_flickr8k_mini
from multimodalworddiscovery_tpu.models import model1
from multimodalworddiscovery_tpu.oracles.numpy_model1 import NumpyModel1


def test_model1_em_x64_matches_oracle_to_machine_precision():
    corpus, _, _ = make_flickr8k_mini(n_utterances=20, seed=17)
    src = np.asarray(corpus.src)
    trg = np.asarray(corpus.trg)
    sl = np.asarray(corpus.src_len)
    tl = np.asarray(corpus.trg_len)
    oracle = NumpyModel1(
        [src[i, : sl[i]] for i in range(corpus.n)],
        [trg[i, : tl[i]] for i in range(corpus.n)],
        corpus.src_vocab,
        corpus.trg_vocab,
    )

    with jax.enable_x64(True):
        c64 = jax.tree.map(
            lambda x: jnp.asarray(np.asarray(x)), corpus
        )  # re-materialize arrays under x64 (int32 stays int32)
        params = model1.init(c64, dtype=jnp.float64)
        for it in range(4):
            oracle_ll = oracle.em_iteration()
            params, stats = model1.em_step(params, c64)
            assert params.log_t.dtype == jnp.float64
            np.testing.assert_allclose(
                float(stats["loglik"]), oracle_ll, rtol=1e-12, err_msg=f"iter {it}"
            )
            np.testing.assert_allclose(
                np.exp(np.asarray(params.log_t)), oracle.t, rtol=1e-10, atol=1e-14,
                err_msg=f"iter {it}",
            )
        # decode identical
        ours = np.asarray(model1.align(params, c64))
        for i, a in enumerate(oracle.align()):
            np.testing.assert_array_equal(ours[i, : sl[i]], a)
