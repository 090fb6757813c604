"""Same-scale supervised ceiling for the stretch config — VERDICT round-3
item 7: the shipped full-scale claim (alignment F1 0.431 at N=4000, S=64,
configs/stretch_hubert_clip.py) had only the N=1000 study's ceiling (0.519
frame acc) as a denominator.  This runs the ceiling protocol at the SHIPPED
shape so the claim has a full-scale denominator:

  ceiling      supervised GMM fit from GOLD alignments (supervised_counts
               chunked over the corpus — counts are additive — so the
               [N,Ts,C,K] responsibilities never exceed the chunk) -> decode
  ceiling+EM   10 exact EM iterations on top (does likelihood walk away
               from gold at this scale?)

Reports BOTH frame accuracy (the study's metric) and alignment F1 (the
shipped config's metric) for each.  Run on TPU:
python scripts/exp_ceiling_fullscale.py
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4000)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--chunks", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/mwd_jax_cache")

    from multimodalworddiscovery_tpu.data import make_flickr8k_mini
    from multimodalworddiscovery_tpu.data.synthetic import phones_to_frames
    from multimodalworddiscovery_tpu.eval.metrics import alignment_prf
    from multimodalworddiscovery_tpu.models import hmm_gaussian
    from multimodalworddiscovery_tpu.models.bucketed import (
        chunked_expected_counts,
    )

    # the stretch config's corpus shape (configs/stretch_hubert_clip.py)
    pc, pg, _ = make_flickr8k_mini(
        n_utterances=args.n, n_concepts=200, min_concepts=16,
        max_concepts=32, seed=0,
    )
    fc, fg, _ = phones_to_frames(pc, pg, feat_dim=64, seed=0)
    gold = jnp.asarray(fg.alignment)
    wm = np.asarray(fc.src_mask()) & (fg.alignment > 0)
    print(f"corpus: {fc.src.shape}, S = {2 * fc.max_trg_len}", flush=True)

    def measure(p, label, t0):
        pred = np.asarray(jax.jit(hmm_gaussian.align)(p, fc))
        acc = float((pred == fg.alignment)[wm].mean())
        f1 = float(alignment_prf(
            jnp.asarray(pred), gold, fc.src_mask())["f1"])
        print(json.dumps(dict(
            variant=label, frame_acc=round(acc, 4), alignment_f1=round(f1, 4),
            seconds=round(time.time() - t0, 1),
        )), flush=True)

    key = jax.random.PRNGKey(0)
    params = hmm_gaussian.init(fc, max_jump=5, n_components=2, key=key)

    # chunked supervised fit: supervised_counts over corpus slices (additive)
    n_chunk = args.chunks
    csz = -(-args.n // n_chunk)
    sup_counts = jax.jit(hmm_gaussian.supervised_counts)
    m_step = jax.jit(hmm_gaussian.m_step)

    t0 = time.time()
    p = params
    for _ in range(5):  # the study's supervised_fit iteration count
        total = None
        for i in range(n_chunk):
            sl = slice(i * csz, (i + 1) * csz)
            cts = sup_counts(
                p, jax.tree.map(lambda v: v[sl], fc), gold[sl]
            )
            total = cts if total is None else jax.tree.map(
                jnp.add, total, cts
            )
        p = m_step(p, total)
    measure(p, "supervised_ceiling", t0)

    t0 = time.time()
    p_em = p
    for _ in range(args.iters):
        counts, _ = chunked_expected_counts(
            hmm_gaussian, p_em, fc, n_chunk, use_pallas=not args.cpu
        )
        p_em = m_step(p_em, counts)
    measure(p_em, f"ceiling_plus_{args.iters}_em", t0)


if __name__ == "__main__":
    main()
