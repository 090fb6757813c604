"""BASELINE.json config #4 at reference-corpus scale, fully out-of-core.

The reference runs its "end-to-end fused pipeline" (preprocess -> train ->
align -> evaluate, SURVEY.md §3.4) over full MSCOCO (~600 k captions) as
separate host-resident scripts with .npz files in between.  This driver runs
the SAME pipeline at six-figure utterance counts on ONE chip with host RSS
bounded by a batch, not the corpus:

  stage 1  synthesize waveforms in SHARD-SIZED batches (shared-lexicon
           batched generator, data/synthetic.make_flickr8k_mini_batches)
           -> fused Pallas MFCC per sub-batch -> frame-level gold
           -> data.stream.ShardWriter (each batch lands as one mmap shard;
           generation order is an iid draw, i.e. pre-shuffled, and the seed
           is recorded in the manifest)
  stage 2  streamed Gaussian-HMM EM        (mwd train,  data.source=stream)
  stage 3  streamed Viterbi alignment      (mwd align)
  stage 4  streamed word segmentation      (mwd segment)
  stage 5  streamed evaluation, all metric families incl. within-shard
           pooled retrieval + reservoir DTW (mwd evaluate)
  stage 6  cross-check: shard 0 re-evaluated RESIDENT (corpus in HBM, same
           params) vs STREAMED over a single-shard manifest — the metrics
           must agree to float tolerance (streamed evaluation is exact)

One command reproduces the run (round-4 VERDICT task 2):

  python scripts/run_pipeline_fullscale.py                  # TPU, N=131,072
  python scripts/run_pipeline_fullscale.py --utterances 512 \
      --shard-size 128 --mfcc-batch 128 --iters 3 --cpu --interpret  # smoke

Writes a per-stage wall-time/RSS table (markdown + JSON --report) — the
PERFORMANCE.md "Reference-corpus-scale end-to-end" table is generated here.
"""

from __future__ import annotations

import argparse
import json
import resource
import shutil
import sys
import time
from pathlib import Path

import numpy as np


def _rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def _run_cli(argv: list[str]) -> None:
    from multimodalworddiscovery_tpu import cli

    old = sys.argv
    try:
        sys.argv = argv
        cli.main()
    finally:
        sys.argv = old


def stage_synthesize(args, shards_dir: Path) -> dict:
    """Waveforms -> Pallas MFCC -> frame shards, O(batch) host residency.

    Waveform ASSEMBLY happens on device, fused into the extraction jit: the
    host ships [B, s_max] int32 phone ids (2 KB/utterance-row) and the chip
    expands them against the tiny [V, spp] template table with one one-hot
    matmul + noise.  The first version shipped assembled waveforms
    ([B, s_max*spp] float32 — 123 KB/utterance) and the relay's H2D staging
    retained every buffer: host RSS grew ~1.07 GB per 8k-utterance shard
    (measured, linear to ~18 GB at N=131k).  Real audio would of course be
    read from disk and pay H2D at ~1 ms/MB; synthetic audio has no reason
    to transit the host at all.
    """
    import jax
    import jax.numpy as jnp

    from multimodalworddiscovery_tpu.data.stream import ShardWriter
    from multimodalworddiscovery_tpu.data.synthetic import (
        expand_gold_to_frames,
        make_flickr8k_mini_batches,
        phone_templates,
    )
    from multimodalworddiscovery_tpu.data.corpus import Corpus
    from multimodalworddiscovery_tpu.frontend.speech import MfccConfig
    from multimodalworddiscovery_tpu.ops.mfcc_pallas import extract_pallas

    n_phones = 24
    meta, s_max, batches = make_flickr8k_mini_batches(
        n_utterances=args.utterances, batch_size=args.shard_size,
        n_concepts=args.concepts, n_phones=n_phones, seed=args.seed,
    )
    cfg = MfccConfig(n_mfcc=13, n_mels=26)
    spp = 16000 * 80 // 1000  # samples per phone (phone_ms=80)
    wav_pad = s_max * spp
    templates = jnp.asarray(phone_templates(n_phones + 1, seed=args.seed))

    @jax.jit
    def synth_extract(src, src_len, key):
        b = src.shape[0]
        # phone ids -> samples: one-hot MXU matmul against the template
        # table (gather-free, per CLAUDE.md rule), then Hanning-enveloped
        # noise over the valid prefix
        onehot = jax.nn.one_hot(src, templates.shape[0], dtype=jnp.float32)
        # HIGHEST: default bf16 rounds template samples by ~2e-3 — below the
        # 0.02 noise floor, but exactness vs the host synthesizer is free here
        wavs = jnp.einsum(
            "bsv,vt->bst", onehot, templates,
            precision=jax.lax.Precision.HIGHEST,
        ).reshape(b, -1)
        lens = (src_len * spp).astype(jnp.int32)
        valid = jnp.arange(wavs.shape[1])[None, :] < lens[:, None]
        wavs = jnp.where(valid, wavs, 0.0)
        wavs += 0.02 * jax.random.normal(key, wavs.shape) * valid
        return extract_pallas(wavs, lens, cfg, interpret=args.interpret)

    n_batches = -(-args.utterances // args.shard_size)
    f_pad = None
    wav_seconds = 0.0
    key = jax.random.PRNGKey(args.seed)
    with ShardWriter(
        shards_dir, args.shard_size, name="fullscale", shuffle_seed=args.seed,
        storage_dtype=args.storage_dtype,
    ) as writer:
        for bi, (phone_corpus, gold) in enumerate(batches):
            b = phone_corpus.n
            src_np = np.asarray(phone_corpus.src)
            len_np = np.asarray(phone_corpus.src_len)
            feats_parts, flen_parts = [], []
            # sub-batch the synth+MFCC dispatches: device memory is
            # O(mfcc_batch); every dispatch reuses the one compiled jit
            for lo in range(0, b, args.mfcc_batch):
                hi = min(lo + args.mfcc_batch, b)
                src_b = np.zeros((args.mfcc_batch, s_max), np.int32)
                len_b = np.zeros((args.mfcc_batch,), np.int32)
                src_b[: hi - lo] = src_np[lo:hi]
                len_b[: hi - lo] = len_np[lo:hi]
                wav_seconds += float(len_b.sum()) * spp / 16000.0
                key, sub = jax.random.split(key)
                feats, flens = synth_extract(
                    jnp.asarray(src_b), jnp.asarray(len_b), sub
                )
                feats_parts.append(np.asarray(feats)[: hi - lo])
                flen_parts.append(np.asarray(flens)[: hi - lo])
            feats = np.concatenate(feats_parts)
            frame_lens = np.concatenate(flen_parts)
            if f_pad is None:
                f_pad = feats.shape[1]  # fixed: wav_pad is global
            assert feats.shape[1] == f_pad, (feats.shape, f_pad)

            frame_gold = expand_gold_to_frames(
                gold, np.asarray(phone_corpus.src_len), frame_lens
            )
            ga = np.zeros((b, f_pad), np.int32)
            ga[:, : frame_gold.alignment.shape[1]] = frame_gold.alignment
            frame_corpus = Corpus(
                src=feats, src_len=frame_lens.astype(np.int32),
                trg=np.asarray(phone_corpus.trg),
                trg_len=np.asarray(phone_corpus.trg_len),
                src_vocab=0, trg_vocab=phone_corpus.trg_vocab,
            )
            writer.append(frame_corpus, gold_alignment=ga)
            if (bi + 1) % max(1, n_batches // 8) == 0 or bi + 1 == n_batches:
                print(f"  shard {bi + 1}/{n_batches} written "
                      f"(rss {_rss_gb():.2f} GB)", flush=True)
    return {
        "shards": n_batches, "frames_pad": f_pad, "wav_pad": wav_pad,
        "audio_hours": wav_seconds / 3600.0,
    }


def stage_crosscheck(args, shards_dir: Path, workdir: Path) -> dict:
    """Shard 0 evaluated RESIDENT vs STREAMED with the trained params."""
    import jax
    import jax.numpy as jnp

    from multimodalworddiscovery_tpu.data.io import load_alignment_json
    from multimodalworddiscovery_tpu.data.stream import ShardedCorpusReader
    from multimodalworddiscovery_tpu.eval.metrics import alignment_prf
    from multimodalworddiscovery_tpu.models import hmm_gaussian
    from multimodalworddiscovery_tpu.utils.checkpoint import CheckpointManager

    reader = ShardedCorpusReader(shards_dir)
    sub_dir = workdir / "shard0_only"
    sub_dir.mkdir(parents=True, exist_ok=True)
    for field in ("src", "src_len", "trg", "trg_len"):
        shutil.copy(shards_dir / f"{field}_0.npy", sub_dir / f"{field}_0.npy")
    n_sub = min(reader.shard_size, reader.n)
    manifest = json.loads((shards_dir / "manifest.json").read_text())
    manifest.update(num_shards=1, n=n_sub, name="fullscale-shard0")
    (sub_dir / "manifest.json").write_text(json.dumps(manifest))
    gold = load_alignment_json(
        shards_dir / "gold.json", reader.n, reader.max_src_len
    )
    from multimodalworddiscovery_tpu.data.io import save_alignment_json

    sub0 = reader.load_shard(0)
    save_alignment_json(
        gold.alignment[:n_sub], np.asarray(sub0.src_len)[:n_sub],
        sub_dir / "gold.json",
    )

    # streamed evaluation over the single-shard manifest (the exact same
    # code path as stage 5, restricted to shard 0's rows)
    _run_cli(["mwd", "evaluate", "--workdir", str(workdir),
              "--output", str(workdir / "metrics_shard0_streamed.json"),
              "--override", f"data.dir={sub_dir}",
              "eval.retrieval=false", "eval.dtw=false"])
    streamed = json.loads(
        (workdir / "metrics_shard0_streamed.json").read_text()
    )

    # resident: shard 0 in HBM, same checkpoint, dense decode + metrics
    corpus = jax.tree.map(lambda v: v[:n_sub], sub0)
    params, _ = CheckpointManager(workdir / "ckpt").restore(
        hmm_gaussian.init(corpus, n_components=args.components)
    )
    alignment = jax.jit(hmm_gaussian.align)(params, corpus)
    resident = {
        k: float(v) for k, v in alignment_prf(
            alignment, jnp.asarray(gold.alignment[:n_sub]), corpus.src_mask()
        ).items()
    }
    delta = max(
        abs(resident[k] - streamed["alignment"][k])
        for k in ("precision", "recall", "f1")
    )
    print(f"  resident shard-0 F1 {resident['f1']:.4f} vs streamed "
          f"{streamed['alignment']['f1']:.4f} (max |delta| {delta:.2e})")
    if delta > 1e-5:
        raise SystemExit(
            f"streamed/resident mismatch on shard 0: {delta} "
            f"({resident} vs {streamed['alignment']})"
        )
    return {"resident_f1": resident["f1"],
            "streamed_f1": streamed["alignment"]["f1"],
            "max_abs_delta": delta}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--utterances", type=int, default=131072)
    ap.add_argument("--shard-size", type=int, default=8192)
    ap.add_argument("--mfcc-batch", type=int, default=2048,
                    help="rows per synth+MFCC dispatch (bounds host+HBM)")
    ap.add_argument("--iters", type=int, default=15)
    ap.add_argument("--components", type=int, default=2)
    ap.add_argument("--concepts", type=int, default=40)
    ap.add_argument("--retrieval-pool", type=int, default=100)
    ap.add_argument("--recipe", action="store_true",
                    help="train with the flagship streamed recipe "
                         "(init=vq_teacher + annealed EM) instead of "
                         "flat-start EM — required for usable alignments "
                         "at six-figure N (see docs/PERFORMANCE.md)")
    ap.add_argument("--storage-dtype", default=None,
                    choices=["float32", "float16"],
                    help="on-disk dtype for the frame shards; float16 "
                         "halves disk AND the per-EM-pass H2D volume "
                         "(values round to f16 once at write time; compute "
                         "stays float32 on device) — required to fit "
                         "MSCOCO-scale corpora under this host's relay "
                         "H2D-retention budget (docs/PERFORMANCE.md)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--workdir", default="/tmp/mwd_fullscale")
    ap.add_argument("--report", default=None, help="JSON report path")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--keep-shards", action="store_true",
                    help="reuse an existing shard dir (skip stage 1)")
    args = ap.parse_args()
    if args.shard_size % args.mfcc_batch:
        raise SystemExit("--shard-size must be a multiple of --mfcc-batch")

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/mwd_jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    workdir = Path(args.workdir)
    shards_dir = workdir / "shards"
    if not args.keep_shards and workdir.exists():
        shutil.rmtree(workdir)
    workdir.mkdir(parents=True, exist_ok=True)

    t0 = time.perf_counter()
    stages: list[dict] = []
    report: dict = {"config": vars(args)}

    def stage(name, fn):
        t = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t
        stages.append({"stage": name, "seconds": round(dt, 1),
                       "rss_gb": round(_rss_gb(), 2)})
        print(f"[{time.perf_counter() - t0:7.1f}s] {name}: {dt:.1f}s "
              f"(rss {_rss_gb():.2f} GB)", flush=True)
        return out

    print(f"devices: {jax.devices()}", flush=True)

    if args.keep_shards and (shards_dir / "manifest.json").exists():
        print("stage 1 skipped (--keep-shards)")
        report["synthesize"] = json.loads(
            (shards_dir / "manifest.json").read_text()
        )
    else:
        report["synthesize"] = stage(
            "synthesize+mfcc+shard", lambda: stage_synthesize(args, shards_dir)
        )

    train_overrides = [
        "data.source=stream", f"data.dir={shards_dir}",
        "model.name=hmm_gaussian", f"model.n_components={args.components}",
        f"train.num_iterations={args.iters}",
        f"train.checkpoint_every={args.iters}",
        "train.stream_prefetch=2",
    ]
    if args.recipe:
        # flat-start Gaussian EM finds the degenerate likelihood optimum at
        # scale (measured HERE at N=131k: alignment F1 0.128, the same ~0.12
        # the dense-region study hit — docs/PERFORMANCE.md); the flagship
        # streamed VQ-teacher + annealing recipe is the fix and runs fully
        # out-of-core
        train_overrides += [
            "model.init=vq_teacher", "model.vq_codes=64",
            "model.teacher_iters=10", "model.seed_rounds=3",
            "model.anneal_iters=6",
        ]
    stage("streamed EM" + (" (vq_teacher + anneal)" if args.recipe else ""),
          lambda: _run_cli(["mwd", "train", "--workdir", str(workdir),
                            "--fresh", "--override"] + train_overrides))
    stage("streamed align", lambda: _run_cli(
        ["mwd", "align", "--workdir", str(workdir)]
    ))
    stage("streamed segment", lambda: _run_cli(
        ["mwd", "segment", "--workdir", str(workdir)]
    ))
    stage("streamed evaluate", lambda: _run_cli(
        ["mwd", "evaluate", "--workdir", str(workdir), "--override",
         f"eval.retrieval_pool={args.retrieval_pool}",
         "eval.dtw_utterances=64"]
    ))
    report["crosscheck"] = stage(
        "resident/streamed cross-check",
        lambda: stage_crosscheck(args, shards_dir, workdir),
    )

    report["stages"] = stages
    report["metrics"] = json.loads((workdir / "metrics.json").read_text())
    report["total_seconds"] = round(time.perf_counter() - t0, 1)

    print("\n| stage | wall time | peak RSS |")
    print("|---|---|---|")
    for s in stages:
        print(f"| {s['stage']} | {s['seconds']} s | {s['rss_gb']} GB |")
    print(f"| TOTAL | {report['total_seconds']} s | |")
    out = Path(args.report or workdir / "report.json")
    out.write_text(json.dumps(report, indent=2))
    print(f"\nwrote {out}")
    return report


if __name__ == "__main__":
    main()
