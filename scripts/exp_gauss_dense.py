"""Dense-region Gaussian-HMM quality study (VERDICT round-2 item 6).

Question: is the stretch config's ~0.15 frame alignment accuracy a TASK
BOUND of the synthetic dense-region corpus or an OPTIMIZATION failure of
EM?  Protocol:

  ceiling    supervised GMM fit from GOLD alignments (hmm_gaussian.
             supervised_fit) -> Viterbi decode.  Decode accuracy under
             gold-fit parameters bounds every unsupervised scheme: if THIS
             is low, the emission family cannot separate the 16-32
             candidate concepts per image and no init/annealing can fix it.
  global     symmetric global-mean init -> EM           (round-1 baseline)
  diagonal   uniform-alignment flat-start -> EM         (round-2 baseline)
  diag+anneal deterministic annealing (beta 0.25 -> 1 over 6 iters) on top
             of the flat start                          (round-3 candidate)
  random     decode accuracy of the untrained diagonal init (floor)

Shapes follow configs/stretch_hubert_clip.py (200 concepts, 16-32 per
image, 64-d frames); --n scales the corpus (the quality question is
per-utterance, so N=1000 answers it; the stretch config's N=4000 adds only
statistics).  Run on TPU: python scripts/exp_gauss_dense.py
"""

from __future__ import annotations

import argparse
import time

import jax
import numpy as np

from multimodalworddiscovery_tpu.data import make_flickr8k_mini
from multimodalworddiscovery_tpu.data.synthetic import phones_to_frames
from multimodalworddiscovery_tpu.models import hmm_gaussian


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1000)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--feat-dim", type=int, default=64)
    ap.add_argument("--components", type=int, default=2)
    ap.add_argument("--chunks", type=int, default=4)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the env's sitecustomize "
                         "routes to the TPU tunnel otherwise)")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/mwd_jax_cache")

    pc, pg, _ = make_flickr8k_mini(
        n_utterances=args.n, n_concepts=200, min_concepts=16, max_concepts=32,
        seed=0,
    )
    fc, fg, _ = phones_to_frames(pc, pg, feat_dim=args.feat_dim, seed=0)
    gold = jax.numpy.asarray(fg.alignment)
    wm = np.asarray(fc.src_mask()) & (fg.alignment > 0)
    print(f"corpus: {fc.src.shape}, S = {2 * fc.max_trg_len}, "
          f"valid frames = {int(wm.sum())}", flush=True)

    nchunk = args.chunks

    def accuracy(params):
        preds = []
        csz = -(-fc.n // nchunk)
        for i in range(nchunk):
            sub = jax.tree.map(lambda x: x[i * csz:(i + 1) * csz], fc)
            preds.append(np.asarray(jax.jit(hmm_gaussian.align)(params, sub)))
        pred = np.concatenate(preds, axis=0)[: fc.n]
        return float((pred == fg.alignment)[wm].mean())

    from multimodalworddiscovery_tpu.models.bucketed import (
        chunked_expected_counts,
    )

    class _ScaledMod:
        """hmm_gaussian with a (possibly traced) annealing temperature
        (module-like shim for chunked_expected_counts)."""

        def __init__(self, scale):
            self.scale = scale

        def expected_counts(self, p, c):
            return hmm_gaussian.expected_counts(p, c, emit_scale=self.scale)

    @jax.jit
    def em_chunked_step(p, scale):
        # exact chunk-scanned EM (the stretch config's train.corpus_chunks
        # path) so the study runs at stretch activation sizes on one chip
        counts, ll = chunked_expected_counts(_ScaledMod(scale), p, fc, nchunk)
        return hmm_gaussian.m_step(p, counts), ll

    def chunked_train(params, anneal=None):
        if anneal is None:
            scales = [1.0] * args.iters
        else:
            beta0, n_ramp = anneal
            scales = list(np.linspace(beta0, 1.0, n_ramp)) + [1.0] * (
                args.iters - n_ramp
            )
        lls = []
        for scale in scales:
            params, ll = em_chunked_step(params, float(scale))
            lls.append(float(ll))
        return params, lls

    key = jax.random.PRNGKey(0)
    results = {}

    # --- ceiling: supervised fit from gold ---
    t0 = time.perf_counter()
    base = hmm_gaussian.init_diagonal(
        fc, max_jump=5, n_components=args.components, key=key
    )
    results["random_init_floor"] = accuracy(base)
    sup = jax.jit(
        lambda p: hmm_gaussian.supervised_fit(p, fc, gold, num_iterations=5)
    )(base)
    results["ceiling_supervised"] = accuracy(sup)
    print(f"ceiling done in {time.perf_counter() - t0:.1f}s", flush=True)

    # --- unsupervised variants ---
    for name, init_fn, anneal in (
        ("em_global", hmm_gaussian.init, None),
        ("em_diagonal", hmm_gaussian.init_diagonal, None),
        ("em_diag_anneal", hmm_gaussian.init_diagonal, (0.25, 6)),
    ):
        t0 = time.perf_counter()
        p0 = init_fn(fc, max_jump=5, n_components=args.components, key=key)
        p, lls = chunked_train(p0, anneal=anneal)
        results[name] = accuracy(p)
        print(f"{name}: acc={results[name]:.3f} "
              f"(ll {lls[0]:.0f} -> {lls[-1]:.0f}, "
              f"{time.perf_counter() - t0:.1f}s)", flush=True)

    # --- supervised ceiling + EM refinement (does EM walk AWAY from the
    # gold optimum? if yes, the likelihood objective itself prefers a
    # different solution — task bound, not optimization) ---
    ref, _ = chunked_train(sup)
    results["ceiling_plus_em"] = accuracy(ref)

    # --- control: the DISCRETE HMM on the underlying phone tokens at the
    # same concept density.  If this is high while Gaussian EM is low, the
    # failure is specific to jointly learning emissions-from-scratch, and a
    # discretize-then-align teacher should transfer it ---
    from multimodalworddiscovery_tpu.models import hmm as dhmm

    use_pallas = not args.cpu
    t0 = time.perf_counter()
    dp0 = dhmm.init(pc, max_jump=5)
    dp, _ = jax.jit(
        lambda p: dhmm.train(p, pc, args.iters, use_pallas=use_pallas)
    )(dp0)
    dpred = np.asarray(dhmm.align(dp, pc))
    dmask = np.asarray(pc.src_mask()) & (pg.alignment > 0)
    results["discrete_tokens_control"] = float(
        (dpred == pg.alignment)[dmask].mean()
    )
    print(f"discrete control: acc={results['discrete_tokens_control']:.3f} "
          f"({time.perf_counter() - t0:.1f}s)", flush=True)

    # --- VQ + discrete-teacher seeding: the PRODUCTION recipe's own library
    # stages (quantize_frames -> dhmm.train -> seed_from_teacher), called
    # piecewise so the teacher itself can be probed in between — the study
    # measures exactly what configs/stretch_hubert_clip.py runs ---
    t0 = time.perf_counter()
    cc = hmm_gaussian.quantize_frames(fc, n_codes=64, key=jax.random.PRNGKey(1))
    tp0 = dhmm.init(cc, max_jump=5)
    tp, _ = jax.jit(
        lambda p, c: dhmm.train(p, c, args.iters, use_pallas=use_pallas)
    )(tp0, cc)
    tpred = np.asarray(dhmm.align(tp, cc))
    results["vq_teacher_itself"] = float((tpred == fg.alignment)[wm].mean())

    gp = hmm_gaussian.seed_from_teacher(
        base, fc, cc, tp, seed_rounds=3, chunks=nchunk
    )
    results["vq_teacher_seeded"] = accuracy(gp)
    gp2, _ = chunked_train(gp)
    results["vq_seed_plus_em"] = accuracy(gp2)
    print(f"vq-teacher path done ({time.perf_counter() - t0:.1f}s)", flush=True)

    print("\n=== dense-region Gaussian-HMM study (N=%d, D=%d, K=%d) ==="
          % (args.n, args.feat_dim, args.components))
    for k, v in results.items():
        print(f"  {k:24s} {v:.3f}")


if __name__ == "__main__":
    main()
