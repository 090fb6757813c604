"""Command-line entry points: train / align / segment / evaluate.

Reference counterpart: the top-level ``run_*.py`` experiment drivers
(SURVEY.md §2 C13) — argparse scripts wiring load -> construct discoverer ->
trainUsingEM -> printAlignment -> offline eval.  Here one CLI covers all
models through the registry; state is Orbax checkpoints; alignments and
metrics are JSON/JSONL files.

  mwd train    --config configs/model1_mini.py --workdir /tmp/run
  mwd align    --workdir /tmp/run [--output alignment.json]
  mwd segment  --workdir /tmp/run [--output segments.json]
  mwd evaluate --workdir /tmp/run [--output metrics.json]
"""

from __future__ import annotations

import argparse
import functools
import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from multimodalworddiscovery_tpu.core.config import apply_overrides, base_config, load_config
from multimodalworddiscovery_tpu.core.metrics_io import MetricsWriter, _to_jsonable
from multimodalworddiscovery_tpu.core.mesh import make_mesh
from multimodalworddiscovery_tpu.data.corpus import Corpus, GoldAnnotations
from multimodalworddiscovery_tpu.data.io import load_corpus, save_alignment_json
from multimodalworddiscovery_tpu.data.synthetic import make_flickr8k_mini
from multimodalworddiscovery_tpu.models.registry import get_model
from multimodalworddiscovery_tpu.parallel import make_data_parallel_step, shard_corpus
from multimodalworddiscovery_tpu.segment import (
    boundaries_from_segments,
    segments_from_alignment,
    segments_to_host,
)
from multimodalworddiscovery_tpu.utils.checkpoint import CheckpointManager


def _load_data(cfg) -> tuple[Corpus, GoldAnnotations | None]:
    if cfg.data.source == "synthetic":
        corpus, gold, _ = make_flickr8k_mini(
            n_utterances=cfg.data.n_utterances,
            n_concepts=cfg.data.n_concepts,
            n_phones=cfg.data.n_phones,
            seed=cfg.seed,
        )
        if cfg.data.continuous:
            from multimodalworddiscovery_tpu.data.synthetic import phones_to_frames

            corpus, gold, _ = phones_to_frames(
                corpus, gold, feat_dim=cfg.data.feat_dim, seed=cfg.seed
            )
        return corpus, gold
    if cfg.data.source == "disk":
        return load_corpus(cfg.data.dir, cfg.data.name)
    raise ValueError(f"unknown data.source {cfg.data.source!r}")


def _make_model(cfg, corpus):
    mod = get_model(cfg.model.name)
    name = cfg.model.name
    if name == "model1":
        params = mod.init(corpus)
        step = functools.partial(mod.em_step, smoothing=cfg.model.smoothing)
    elif name == "hmm_gaussian":
        params = mod.init(
            corpus,
            max_jump=cfg.model.max_jump,
            n_components=cfg.model.get("n_components", 2),
            key=jax.random.PRNGKey(cfg.seed),
        )
        step = mod.em_step
    elif name in ("hmm", "hmm_dnn"):
        params = mod.init(corpus, max_jump=cfg.model.max_jump)
        step = mod.em_step
    elif name == "attention":
        params = mod.init(
            corpus, dim=cfg.model.get("dim", 128),
            learning_rate=cfg.model.get("learning_rate", 3e-4),
            key=jax.random.PRNGKey(cfg.seed),
        )
        step = mod.em_step
        if cfg.model.get("guide", "") == "hmm":
            # HMM-guided attention (DNN-HMM-DNN hybrid): train a teacher HMM,
            # supervise cross-attention with its posteriors.  Measured 0.48 ->
            # 0.99 positional accuracy on the synthetic corpus.
            from multimodalworddiscovery_tpu.models import hmm as hmm_mod

            hp = hmm_mod.init(corpus, max_jump=cfg.model.max_jump)
            hp, _ = jax.jit(
                lambda p: hmm_mod.train(p, corpus, cfg.model.get("guide_iters", 15))
            )(hp)
            guide = mod.hmm_guide_matrix(hp, corpus)
            step = functools.partial(mod.em_step, guide=guide)
            print("trained HMM teacher; attention will be guided")
    elif name == "grounding":
        params = mod.init(
            corpus, dim=cfg.model.get("dim", 128),
            learning_rate=cfg.model.get("learning_rate", 1e-3),
            key=jax.random.PRNGKey(cfg.seed),
        )
        step = mod.em_step
    else:
        params = mod.init(corpus)
        step = mod.em_step
    return mod, params, step


def _save_config(cfg, workdir: Path) -> None:
    (workdir / "config.json").write_text(cfg.to_json(indent=2))


def _load_workdir_config(workdir: Path):
    cfg = base_config()
    saved = json.loads((workdir / "config.json").read_text())

    def merge(node, d):
        for k, v in d.items():
            if isinstance(v, dict) and hasattr(node, k):
                merge(getattr(node, k), v)
            else:
                setattr(node, k, v)

    with cfg.unlocked():  # custom config files may carry extra keys
        merge(cfg, saved)
    return cfg


def cmd_train(args) -> None:
    cfg = load_config(args.config) if args.config else base_config()
    apply_overrides(cfg, args.override)
    workdir = Path(args.workdir)
    workdir.mkdir(parents=True, exist_ok=True)
    _save_config(cfg, workdir)

    corpus, _ = _load_data(cfg)
    mod, params, step = _make_model(cfg, corpus)

    edges = [int(e) for e in str(cfg.train.get("bucket_edges", "")).split(",") if e.strip()]
    if edges and cfg.model.name in ("model1", "hmm"):
        from multimodalworddiscovery_tpu.models.bucketed import train_bucketed

        ckpt = CheckpointManager(workdir / "ckpt")
        writer = MetricsWriter(workdir / "train_metrics.jsonl")
        t0 = time.perf_counter()
        params, lls = train_bucketed(
            mod, params, corpus, edges, cfg.train.num_iterations
        )
        dt = time.perf_counter() - t0
        for it, ll in enumerate(lls):
            writer.write(it, loglik=ll)
            print(f"iter {it:4d}  loglik {ll:.2f}")
        ckpt.save(cfg.train.num_iterations - 1, params)
        ckpt.close()
        print(f"bucketed EM ({len(edges) + 1} buckets) in {dt:.2f}s")
        return

    if cfg.train.data_parallel:
        if cfg.model.name == "attention" and cfg.model.get("guide", ""):
            # the guide matrix is built for the unpadded corpus; sharding pads
            # N, so guided attention runs single-device for now
            print("note: guided attention ignores train.data_parallel")
        else:
            mesh = make_mesh()
            corpus = shard_corpus(corpus, mesh)
            step = make_data_parallel_step(step, mesh)
    else:
        step = jax.jit(step)

    ckpt = CheckpointManager(workdir / "ckpt")
    start = 0
    if ckpt.latest_step() is not None and not args.fresh:
        params, start = ckpt.restore(params)
        start += 1
        print(f"resumed from iteration {start}")

    writer = MetricsWriter(workdir / "train_metrics.jsonl")
    t_total = 0.0
    for it in range(start, cfg.train.num_iterations):
        t0 = time.perf_counter()
        params, stats = step(params, corpus)
        jax.block_until_ready(params)
        dt = time.perf_counter() - t0
        t_total += dt
        ll = float(stats["loglik"])
        writer.write(it, loglik=ll, seconds=dt)
        print(f"iter {it:4d}  loglik {ll:.2f}  ({dt*1e3:.1f} ms)")
        if (it + 1) % cfg.train.checkpoint_every == 0 or it == cfg.train.num_iterations - 1:
            ckpt.save(it, params)
    ckpt.close()
    print(f"trained {cfg.train.num_iterations - start} iterations in {t_total:.2f}s")


def _restore(workdir: Path):
    cfg = _load_workdir_config(workdir)
    corpus, gold = _load_data(cfg)
    mod, params, _ = _make_model(cfg, corpus)
    ckpt = CheckpointManager(workdir / "ckpt")
    params, step = ckpt.restore(params)
    ckpt.close()
    return cfg, corpus, gold, mod, params


def cmd_align(args) -> None:
    workdir = Path(args.workdir)
    cfg, corpus, _, mod, params = _restore(workdir)
    alignment = np.asarray(jax.jit(mod.align)(params, corpus))
    out = Path(args.output or workdir / "alignment.json")
    save_alignment_json(alignment, np.asarray(corpus.src_len), out)
    print(f"wrote {out}")


def cmd_segment(args) -> None:
    workdir = Path(args.workdir)
    cfg, corpus, _, mod, params = _restore(workdir)
    alignment = jax.jit(mod.align)(params, corpus)
    segs, mask = segments_from_alignment(alignment, corpus.trg, corpus.src_len)
    out = Path(args.output or workdir / "segments.json")
    save_alignment_json(
        np.asarray(alignment),
        np.asarray(corpus.src_len),
        out,
        segments=segments_to_host(segs, mask),
    )
    print(f"wrote {out}")


def cmd_evaluate(args) -> None:
    from multimodalworddiscovery_tpu.eval import (
        alignment_prf,
        boundary_prf,
        cluster_purity,
        recall_at_k,
        retrieval_scores_model1,
        word_iou,
    )

    workdir = Path(args.workdir)
    cfg, corpus, gold, mod, params = _restore(workdir)
    if gold is None:
        raise SystemExit("no gold annotations available for this dataset")

    alignment = jax.jit(mod.align)(params, corpus)
    gold_alignment = jnp.asarray(gold.alignment)

    pred_segs, pred_mask = segments_from_alignment(alignment, corpus.trg, corpus.src_len)
    gold_segs, gold_mask = segments_from_alignment(gold_alignment, corpus.trg, corpus.src_len)
    pb = boundaries_from_segments(pred_segs, pred_mask, corpus.max_src_len)
    gb = boundaries_from_segments(gold_segs, gold_mask, corpus.max_src_len)

    results = {
        "alignment": alignment_prf(alignment, gold_alignment, corpus.src_mask()),
        "word_iou": word_iou(pred_segs, pred_mask, gold_segs, gold_mask, cfg.eval.iou_threshold),
        "boundary": boundary_prf(pb, gb, tolerance=cfg.eval.boundary_tolerance),
        "purity": cluster_purity(pred_segs, pred_mask, gold_segs, gold_mask, corpus.trg_vocab),
    }
    if cfg.eval.retrieval and cfg.model.name == "model1":
        scores = retrieval_scores_model1(params, corpus)
        results["retrieval"] = recall_at_k(scores)
    elif cfg.eval.retrieval and cfg.model.name == "hmm":
        from multimodalworddiscovery_tpu.eval.retrieval import retrieval_scores_hmm

        results["retrieval"] = recall_at_k(retrieval_scores_hmm(params, corpus))
    elif cfg.eval.retrieval and cfg.model.name == "grounding":
        results["retrieval"] = recall_at_k(mod.retrieval_scores(params, corpus))

    results = _to_jsonable(jax.tree.map(lambda x: float(x), results))
    out = Path(args.output or workdir / "metrics.json")
    out.write_text(json.dumps(results, indent=2))
    print(json.dumps(results, indent=2))
    print(f"wrote {out}")


def cmd_discover(args) -> None:
    """Audio-only word discovery: segmental k-means over a continuous corpus
    (reference comparison models, SURVEY.md §2 C9).  No concepts used."""
    from multimodalworddiscovery_tpu.eval.metrics import boundary_prf, cluster_purity
    from multimodalworddiscovery_tpu.models import segmental_kmeans as skm

    cfg = load_config(args.config) if args.config else base_config()
    cfg.data.continuous = True
    apply_overrides(cfg, args.override)
    workdir = Path(args.workdir)
    workdir.mkdir(parents=True, exist_ok=True)
    _save_config(cfg, workdir)

    corpus, gold = _load_data(cfg)
    params = skm.init(
        corpus, n_clusters=args.clusters, key=jax.random.PRNGKey(cfg.seed)
    )
    writer = MetricsWriter(workdir / "train_metrics.jsonl")
    step = jax.jit(skm.em_step)
    for it in range(cfg.train.num_iterations):
        t0 = time.perf_counter()
        params, stats = step(params, corpus)
        jax.block_until_ready(params.centroids)
        writer.write(it, loglik=float(stats["loglik"]), n_segments=int(stats["n_segments"]),
                     seconds=time.perf_counter() - t0)
        print(f"iter {it:3d}  -distortion {float(stats['loglik']):.1f}  "
              f"segments {int(stats['n_segments'])}")

    segs, mask = skm.discover(params, corpus)
    out = Path(args.output or workdir / "discovered_segments.json")
    host_segs = segments_to_host(segs, mask)
    recs = [{"index": i, "segments": [[int(a) for a in s] for s in host_segs[i]]}
            for i in range(corpus.n)]
    out.write_text(json.dumps(recs, indent=1))
    print(f"wrote {out}")

    if gold is not None:
        gold_segs, gold_mask = segments_from_alignment(
            jnp.asarray(gold.alignment), corpus.trg, corpus.src_len
        )
        pb = boundaries_from_segments(segs, mask, corpus.max_src_len)
        gb = boundaries_from_segments(gold_segs, gold_mask, corpus.max_src_len)
        n_lbl = max(args.clusters + 2, corpus.trg_vocab)
        results = {
            "boundary": {k: float(v) for k, v in boundary_prf(pb, gb, tolerance=cfg.eval.boundary_tolerance).items()},
            "purity": float(cluster_purity(segs, mask, gold_segs, gold_mask, n_lbl)),
        }
        (workdir / "metrics.json").write_text(json.dumps(results, indent=2))
        print(json.dumps(results, indent=2))


def cmd_retrieve(args) -> None:
    """Cross-modal retrieval: rank images for every caption (and captions for
    every image) by alignment score; dump top-k + recall metrics
    (reference retrieval scripts, SURVEY.md §3.5)."""
    from multimodalworddiscovery_tpu.eval.retrieval import (
        recall_at_k,
        retrieval_scores_hmm,
        retrieval_scores_model1,
    )

    workdir = Path(args.workdir)
    cfg, corpus, _, mod, params = _restore(workdir)
    if cfg.model.name == "model1":
        scores = retrieval_scores_model1(params, corpus)
    elif cfg.model.name == "hmm":
        scores = retrieval_scores_hmm(params, corpus)
    elif cfg.model.name == "grounding":
        scores = mod.retrieval_scores(params, corpus)
    else:
        raise SystemExit(f"retrieval not supported for model {cfg.model.name!r}")

    s = np.asarray(scores)
    top = np.argsort(-s, axis=1)[:, : args.top_k]
    recs = [
        {"caption": i, "top_images": top[i].tolist(),
         "scores": [round(float(s[i, j]), 3) for j in top[i]]}
        for i in range(s.shape[0])
    ]
    out = Path(args.output or workdir / "retrieval.json")
    out.write_text(json.dumps({
        "recall": {k: float(v) for k, v in recall_at_k(scores).items()},
        "rankings": recs,
    }, indent=1))
    metrics = {k: round(float(v), 4) for k, v in recall_at_k(scores).items()}
    print(json.dumps(metrics, indent=2))
    print(f"wrote {out}")


def cmd_preprocess(args) -> None:
    """Build a corpus directory from public dataset artifacts
    (reference preprocessing scripts, SURVEY.md §2 C4/C13)."""
    from multimodalworddiscovery_tpu.data.io import save_corpus

    if args.dataset == "flickr8k":
        from multimodalworddiscovery_tpu.data import flickr8k

        corpus, gold, meta = flickr8k.build_corpus(
            args.captions, args.lexicon, args.concepts
        )
    elif args.dataset == "mscoco":
        from multimodalworddiscovery_tpu.data import mscoco

        corpus, gold, meta = mscoco.build_corpus(
            args.instances, args.captions, args.lexicon
        )
    else:
        raise SystemExit(f"unknown dataset {args.dataset!r}")

    out = Path(args.output)
    save_corpus(corpus, gold, out, args.name)
    (out / f"{args.name}_vocab.json").write_text(
        json.dumps(
            {"phones": meta["phone_vocab"], "concepts": meta["concept_vocab"],
             "utterance_ids": meta["utterance_ids"]},
            indent=1,
        )
    )
    print(
        f"wrote {out}/{args.name}_*: {corpus.n} utterances, "
        f"{corpus.src_vocab - 1} phones, {corpus.trg_vocab - 1} concepts"
    )


def cmd_export(args) -> None:
    """Export trained model parameters as a plain .npz (the reference's
    printModel-style artifact: inspectable tables, no orbax needed)."""
    workdir = Path(args.workdir)
    cfg, corpus, _, mod, params = _restore(workdir)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    arrays = {}
    for path, leaf in flat:
        key = "/".join(
            getattr(p, "name", None) or str(getattr(p, "key", getattr(p, "idx", p)))
            for p in path
        )
        arrays[key] = np.asarray(leaf)
    out = Path(args.output or workdir / "model.npz")
    np.savez(out, **arrays)
    print(f"wrote {out}: " + ", ".join(f"{k}{v.shape}" for k, v in list(arrays.items())[:6]))


def cmd_lexicon(args) -> None:
    """Dump the discovered lexicon: for each concept, the most frequent
    phone sequences among its discovered word segments (the human-readable
    payoff of word discovery; reference printModel-style dump)."""
    from collections import Counter, defaultdict

    workdir = Path(args.workdir)
    cfg, corpus, gold, mod, params = _restore(workdir)
    alignment = jax.jit(mod.align)(params, corpus)
    segs, mask = segments_from_alignment(alignment, corpus.trg, corpus.src_len)
    host_segs = segments_to_host(segs, mask)
    src = np.asarray(corpus.src)

    by_concept: dict[int, Counter] = defaultdict(Counter)
    for i, utt_segs in enumerate(host_segs):
        for s, e, c in utt_segs:
            word = " ".join(str(int(p)) for p in src[i, s:e])
            by_concept[c][word] += 1

    out = {}
    for c in sorted(by_concept):
        out[str(c)] = [
            {"phones": w, "count": n} for w, n in by_concept[c].most_common(args.top_k)
        ]
    path = Path(args.output or workdir / "lexicon.json")
    path.write_text(json.dumps(out, indent=1))
    for c in sorted(by_concept)[:15]:
        tops = ", ".join(f"[{w}]x{n}" for w, n in by_concept[c].most_common(3))
        print(f"concept {c:4d}: {tops}")
    print(f"wrote {path}")


def cmd_plot(args) -> None:
    from multimodalworddiscovery_tpu.utils.plotting import (
        plot_alignment_matrix,
        plot_segmentation,
    )

    workdir = Path(args.workdir)
    cfg, corpus, gold, mod, params = _restore(workdir)
    i = args.utterance
    alignment = jax.jit(mod.align)(params, corpus)
    segs, mask = segments_from_alignment(alignment, corpus.trg, corpus.src_len)
    seg_list = segments_to_host(segs, mask)[i]
    sl = int(np.asarray(corpus.src_len)[i])
    out_dir = Path(args.output or workdir / "plots")
    out_dir.mkdir(parents=True, exist_ok=True)

    gold_list = gold.segments[i] if gold is not None else None
    plot_segmentation(
        np.asarray(alignment)[i, :sl],
        seg_list,
        gold_segments=gold_list,
        title=f"utt {i}",
        path=out_dir / f"segmentation_{i}.png",
    )
    if hasattr(mod, "posteriors"):
        post = np.asarray(mod.posteriors(params, corpus))[i, :sl].T
        plot_alignment_matrix(post, title=f"posteriors utt {i}", path=out_dir / f"posteriors_{i}.png")
    if hasattr(mod, "attention_matrix"):
        attn = np.asarray(mod.attention_matrix(params, corpus))[i, :, :sl]
        plot_alignment_matrix(attn, title=f"attention utt {i}", path=out_dir / f"attention_{i}.png")
    print(f"wrote plots to {out_dir}")


def main() -> None:
    # Persistent compilation cache: each CLI invocation is a fresh process;
    # without this every subcommand pays full XLA compile times.
    jax.config.update("jax_compilation_cache_dir", "/tmp/mwd_jax_cache")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    parser = argparse.ArgumentParser(prog="mwd", description=__doc__)
    sub = parser.add_subparsers(dest="command", required=True)

    p_train = sub.add_parser("train", help="train an aligner")
    p_train.add_argument("--config", default=None, help="python config file")
    p_train.add_argument("--workdir", required=True)
    p_train.add_argument("--fresh", action="store_true", help="ignore existing checkpoints")
    p_train.add_argument("--override", nargs="*", default=[], help="key.path=value overrides")
    p_train.set_defaults(fn=cmd_train)

    p_disc = sub.add_parser("discover", help="audio-only word discovery (segmental k-means)")
    p_disc.add_argument("--config", default=None)
    p_disc.add_argument("--workdir", required=True)
    p_disc.add_argument("--clusters", type=int, default=64)
    p_disc.add_argument("--output", default=None)
    p_disc.add_argument("--override", nargs="*", default=[])
    p_disc.set_defaults(fn=cmd_discover)

    p_ret = sub.add_parser("retrieve", help="cross-modal retrieval rankings + recall@k")
    p_ret.add_argument("--workdir", required=True)
    p_ret.add_argument("--top-k", type=int, default=10)
    p_ret.add_argument("--output", default=None)
    p_ret.set_defaults(fn=cmd_retrieve)

    p_pre = sub.add_parser("preprocess", help="build a corpus dir from public dataset files")
    p_pre.add_argument("--dataset", choices=["flickr8k", "mscoco"], required=True)
    p_pre.add_argument("--captions", required=True, help="Flickr8k.token.txt / captions json")
    p_pre.add_argument("--lexicon", required=True, help="word -> phones dictionary")
    p_pre.add_argument("--concepts", default=None, help="per-image concepts (flickr8k)")
    p_pre.add_argument("--instances", default=None, help="COCO instances json (mscoco)")
    p_pre.add_argument("--output", required=True)
    p_pre.add_argument("--name", default="corpus")
    p_pre.set_defaults(fn=cmd_preprocess)

    p_exp = sub.add_parser("export", help="export model params as plain .npz")
    p_exp.add_argument("--workdir", required=True)
    p_exp.add_argument("--output", default=None)
    p_exp.set_defaults(fn=cmd_export)

    p_lex = sub.add_parser("lexicon", help="dump the discovered concept->word lexicon")
    p_lex.add_argument("--workdir", required=True)
    p_lex.add_argument("--top-k", type=int, default=5)
    p_lex.add_argument("--output", default=None)
    p_lex.set_defaults(fn=cmd_lexicon)

    p_plot = sub.add_parser("plot", help="plot alignments/segmentations for inspection")
    p_plot.add_argument("--workdir", required=True)
    p_plot.add_argument("--utterance", type=int, default=0)
    p_plot.add_argument("--output", default=None)
    p_plot.set_defaults(fn=cmd_plot)

    for name, fn in (("align", cmd_align), ("segment", cmd_segment), ("evaluate", cmd_evaluate)):
        p = sub.add_parser(name, help=f"{name} with a trained model")
        p.add_argument("--workdir", required=True)
        p.add_argument("--output", default=None)
        p.set_defaults(fn=fn)

    args = parser.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
