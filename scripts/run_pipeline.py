"""End-to-end fused pipeline (BASELINE.json config #4):

  raw waveforms -> fused Pallas MFCC frontend (+ deltas + CMVN)
               -> Gaussian-emission HMM alignment EM
               -> Viterbi decode -> word segmentation -> on-device metrics

The reference runs this as separate preprocessing/training/eval scripts with
.npz files in between (SURVEY.md §3.4); here everything after corpus assembly
is jitted device code.  Without real MSCOCO audio, waveforms are synthesized
from the flickr8k-mini phone corpus (each phone a fixed formant pair), which
gives gold alignments for the final metrics.

Usage: python scripts/run_pipeline.py [--utterances 200] [--iters 12] [--cpu]
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
    ap.add_argument("--utterances", type=int, default=200)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--cpu", action="store_true", help="force CPU (testing)")
    ap.add_argument("--interpret", action="store_true", help="Pallas interpret mode")
    # raw MFCCs beat +deltas/+CMVN here: a single diagonal Gaussian per
    # concept can't absorb per-utterance normalization shifts (measured F1
    # 0.53 raw vs 0.28 with CMVN on the synthetic tones)
    ap.add_argument("--deltas", action="store_true")
    ap.add_argument("--cmvn", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/mwd_jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from multimodalworddiscovery_tpu.data import make_flickr8k_mini
    from multimodalworddiscovery_tpu.data.corpus import Corpus
    from multimodalworddiscovery_tpu.data.synthetic import (
        expand_gold_to_frames,
        phones_to_waveforms,
    )
    from multimodalworddiscovery_tpu.eval.metrics import (
        alignment_prf,
        boundary_prf,
        cluster_purity,
        word_iou,
    )
    from multimodalworddiscovery_tpu.frontend.speech import MfccConfig, add_deltas, cmvn
    from multimodalworddiscovery_tpu.models import hmm_gaussian
    from multimodalworddiscovery_tpu.ops.mfcc_pallas import extract_pallas
    from multimodalworddiscovery_tpu.segment import (
        boundaries_from_segments,
        segments_from_alignment,
    )

    t0 = time.perf_counter()

    def log(m):
        print(f"[{time.perf_counter()-t0:6.1f}s] {m}", flush=True)

    log(f"devices: {jax.devices()}")

    # 1. corpus -> synthetic audio
    phone_corpus, gold, _ = make_flickr8k_mini(
        n_utterances=args.utterances, n_phones=24, seed=0
    )
    wavs, wav_lens, _ = phones_to_waveforms(phone_corpus, gold, seed=0)
    log(f"synthesized {wavs.shape[0]} waveforms, {wavs.shape[1]/16000:.1f}s max")

    # 2. fused Pallas MFCC frontend + deltas + CMVN
    cfg = MfccConfig(n_mfcc=13, n_mels=26)
    feats, frame_lens = extract_pallas(
        jnp.asarray(wavs), jnp.asarray(wav_lens), cfg, interpret=args.interpret
    )
    if args.deltas:
        feats = add_deltas(feats, frame_lens)
    if args.cmvn:
        feats = cmvn(feats, frame_lens)
    jax.block_until_ready(feats)
    log(f"Pallas MFCC frontend: {feats.shape} features")

    # 3. frame-level corpus + gold
    frame_gold = expand_gold_to_frames(
        gold, np.asarray(phone_corpus.src_len), np.asarray(frame_lens)
    )
    corpus = Corpus(
        src=feats,
        src_len=frame_lens,
        trg=phone_corpus.trg,
        trg_len=phone_corpus.trg_len,
        src_vocab=0,
        trg_vocab=phone_corpus.trg_vocab,
    )

    # 4. GMM-HMM EM (one jitted scan); 2 components per concept — words span
    # several phones, so emissions are multimodal
    params = hmm_gaussian.init(corpus, n_components=2, key=jax.random.PRNGKey(0))
    params, lls = jax.jit(lambda p: hmm_gaussian.train(p, corpus, args.iters))(params)
    jax.block_until_ready(params.means)
    lls = np.asarray(lls)
    log(f"HMM EM {args.iters} iters: loglik {lls[0]:.0f} -> {lls[-1]:.0f}")

    # 5. decode + segment + evaluate (all on device)
    alignment = jax.jit(hmm_gaussian.align)(params, corpus)
    pred_segs, pred_mask = segments_from_alignment(alignment, corpus.trg, corpus.src_len)
    gold_alignment = jnp.asarray(frame_gold.alignment[:, : corpus.max_src_len])
    gold_segs, gold_mask = segments_from_alignment(gold_alignment, corpus.trg, corpus.src_len)
    pb = boundaries_from_segments(pred_segs, pred_mask, corpus.max_src_len)
    gb = boundaries_from_segments(gold_segs, gold_mask, corpus.max_src_len)

    results = {
        "alignment": {k: float(v) for k, v in alignment_prf(alignment, gold_alignment, corpus.src_mask()).items()},
        "word_iou": {k: float(v) for k, v in word_iou(pred_segs, pred_mask, gold_segs, gold_mask).items()},
        "boundary": {k: float(v) for k, v in boundary_prf(pb, gb, tolerance=4).items()},
        "purity": float(cluster_purity(pred_segs, pred_mask, gold_segs, gold_mask, corpus.trg_vocab)),
    }
    log("pipeline metrics:")
    print(json.dumps(results, indent=2))
    return results


if __name__ == "__main__":
    main()
