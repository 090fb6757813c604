"""Scale measurement: minibatch CRF at 40k utterances.

Mirrors scripts/self_train.py's 40k recipe (same generator/seed) so numbers
are comparable: GMM-HMM teacher there measured 0.823, guided attention 0.867.

Measured 2026-08-16 (one TPU chip, B=512, 500 steps):
  em_trans  (closed-form transition M-step)  acc 0.960, 762 ms/step wall
  e2e_trans (learn_transitions=True, Adam)   acc 0.987, 790 ms/step wall
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/mwd_jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from multimodalworddiscovery_tpu.data import make_flickr8k_mini
from multimodalworddiscovery_tpu.data.synthetic import phones_to_frames
from multimodalworddiscovery_tpu.models import hmm_crf, hmm_dnn
from multimodalworddiscovery_tpu.models.minibatch import train_minibatch

N = 40_000
B = 512
STEPS = 500

pc, pg, _ = make_flickr8k_mini(n_utterances=N, seed=11)
fc, fg, _ = phones_to_frames(pc, pg, feat_dim=13, noise=0.1, seed=11)
wm = np.asarray(fc.src_mask()) & (fg.alignment > 0)
print("corpus:", fc.src.shape, "S =", 2 * fc.max_trg_len, flush=True)


def accuracy(params):
    # chunked decode to bound HBM
    preds = []
    nchunk = 8
    csz = N // nchunk
    for i in range(nchunk):
        sub = jax.tree.map(lambda x: x[i * csz:(i + 1) * csz], fc)
        preds.append(np.asarray(jax.jit(hmm_crf.align)(params, sub)))
    pred = np.concatenate(preds, axis=0)
    return float((pred == fg.alignment)[wm].mean())


for mode, lt in (("em_trans", False), ("e2e_trans", True)):
    init = hmm_crf.init_e2e if lt else hmm_dnn.init
    params = init(fc, key=jax.random.PRNGKey(0))
    step_fn = lambda p, c, _lt=lt: hmm_crf.em_step(p, c, learn_transitions=_lt)
    t0 = time.perf_counter()
    params, lls = train_minibatch(
        step_fn, params, fc, batch_size=B, num_steps=STEPS,
        key=jax.random.PRNGKey(1), steps_per_call=50,
    )
    jax.block_until_ready(params.log_jump)
    dt = time.perf_counter() - t0
    acc = accuracy(params)
    print(json.dumps(dict(
        mode=mode, n=N, batch=B, steps=STEPS, seconds=round(dt, 1),
        ms_per_step=round(dt / STEPS * 1e3, 1), acc=round(acc, 4),
        ll_first=round(float(lls[0]), 1), ll_last=round(float(lls[-1]), 1),
    )), flush=True)
